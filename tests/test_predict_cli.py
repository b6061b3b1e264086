"""End-to-end test of the single-case serving CLI (scripts/predict.py):
raw NIfTI with a non-RAS orientation -> detections in voxel + world frames
+ rasterized box mask, using a real run directory and checkpoint."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_training import _setup_run
from transoar_tpu.data.nifti import load_nifti, write_nifti
from transoar_tpu.models.transoarnet import build_transoarnet
from transoar_tpu.training import checkpoints as ckpt_lib
from transoar_tpu.training.train_state import create_train_state
from transoar_tpu.utils.io import load_json


def test_predict_single_nifti_case(tmp_path, monkeypatch):
    from scripts.predict import (load_predictor, predict_case,
                                 rasterize_boxes)

    cfg, ds_root = _setup_run(tmp_path, epochs=1)
    info = load_json(ds_root / "synthetic" / "data_info.json")
    cfg["foreground_voxel_statistics"] = info["foreground_voxel_statistics"]
    cfg["labels"] = info["labels"]

    model = build_transoarnet(cfg)
    example = jnp.zeros((1, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0), 4)

    run_dir = tmp_path / "runs" / "pexp"
    ckpt_lib.freeze_run_config(cfg, run_dir)
    ckpt_lib.save_checkpoint(run_dir, "model_best_0.5", state, 1, 0.5)

    # a raw case: anisotropic spacing + LPS-ish (negated R/A) orientation,
    # odd shape — predict must reorient + resize before the forward
    rng = np.random.default_rng(3)
    vol = rng.normal(0.45, 0.2, size=(40, 37, 21)).astype(np.float32)
    affine = np.diag([-1.5, -1.5, 2.0, 1.0])
    affine[:3, 3] = (60.0, 55.5, -42.0)
    case = tmp_path / "case7.nii.gz"
    write_nifti(vol, case, affine=affine)

    monkeypatch.chdir(tmp_path)
    config, _, params, forward = load_predictor(run_dir)
    detections, (lo_v, hi_v, classes), ras_shape, ras_affine = predict_case(
        case, config, params, forward)

    num_organs = cfg["neck"]["num_organs"]
    assert len(detections) == num_organs  # threshold 0: one per organ
    assert ras_shape == vol.shape  # flips don't change the grid shape
    for det in detections:
        assert 0.0 <= det["score"] <= 1.0
        assert det["name"].startswith("organ")
        lo, hi = np.asarray(det["voxel_lo"]), np.asarray(det["voxel_hi"])
        assert np.all(hi >= lo)
        # world frame consistent with the RAS affine
        scale = np.diag(np.asarray(ras_affine)[:3, :3])
        off = np.asarray(ras_affine)[:3, 3]
        np.testing.assert_allclose(det["world_mm_lo"], lo * scale + off,
                                   rtol=1e-6, atol=1e-6)

    mask = rasterize_boxes(lo_v, hi_v, classes, ras_shape)
    assert mask.shape == ras_shape
    assert set(np.unique(mask)) <= set(range(num_organs + 1))

    # box-mask NIfTI round-trips on the RAS grid
    out = tmp_path / "boxmask.nii.gz"
    write_nifti(mask, out, affine=ras_affine)
    back = load_nifti(out)
    np.testing.assert_array_equal(np.asarray(back["data"], np.int16), mask)


def test_predict_cli_main(tmp_path, monkeypatch):
    import sys

    from scripts import predict as predict_cli

    cfg, ds_root = _setup_run(tmp_path, epochs=1)
    info = load_json(ds_root / "synthetic" / "data_info.json")
    cfg["foreground_voxel_statistics"] = info["foreground_voxel_statistics"]

    model = build_transoarnet(cfg)
    example = jnp.zeros((1, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0), 4)
    run_dir = tmp_path / "runs" / "pexp2"
    ckpt_lib.freeze_run_config(cfg, run_dir)
    ckpt_lib.save_checkpoint(run_dir, "model_last", state, 1, 0.0)

    case = tmp_path / "c.nii"
    write_nifti(np.zeros((24, 24, 12), np.float32), case,
                affine=np.diag([1.0, 1.0, 1.0, 1.0]))

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "predict.py", "--run", "pexp2", "--input", str(case),
        "--last", "--save_boxmask", "--score_threshold", "0.99"])
    predict_cli.main()

    pred = load_json(run_dir / "predictions" / "c_predictions.json")
    assert pred["detections"] == []  # zero-init heads: scores ~0.5 < 0.99
    assert (run_dir / "predictions" / "c_boxmask.nii.gz").exists()
