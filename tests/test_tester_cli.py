"""End-to-end tests of the scripts/test.py Tester.

Regression-pins the test-time intensity window: the reference applies
ScaleIntensityRanged on EVERY split (reference transforms.py:170-177,
189-196), so the Tester's forward must see the same windowed inputs the
trainer trains/validates on.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_training import _setup_run
from transoar_tpu.models.transoarnet import build_transoarnet
from transoar_tpu.training import checkpoints as ckpt_lib
from transoar_tpu.training.train_state import create_train_state
from transoar_tpu.utils.io import load_json


def test_tester_windows_intensity_and_runs(tmp_path, monkeypatch):
    import scripts.test as test_cli

    cfg, ds_root = _setup_run(tmp_path, epochs=1)
    info = load_json(ds_root / "synthetic" / "data_info.json")
    cfg["foreground_voxel_statistics"] = info["foreground_voxel_statistics"]

    model = build_transoarnet(cfg)
    example = jnp.zeros((2, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0), 4)
    # the anchor-offset heads are zero-init (input-independent outputs);
    # perturb the params so the forward actually depends on the input
    key = jax.random.key(1)
    leaves, treedef = jax.tree.flatten(state.params)
    keys = jax.random.split(key, len(leaves))
    state = state.replace(params=jax.tree.unflatten(treedef, [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)]))

    run_dir = tmp_path / "runs" / "texp"
    ckpt_lib.freeze_run_config(cfg, run_dir)
    ckpt_lib.save_checkpoint(run_dir, "model_last", state, 1, 0.0)

    monkeypatch.chdir(tmp_path)
    args = argparse.Namespace(run="texp", val=False, last=True,
                              full_labeled=False, save_preds=False,
                              save_attn_map=False, data_dir=ds_root)
    tester = test_cli.Tester(args)

    batch = next(iter(tester._loader))
    image = jnp.asarray(batch["image"])
    out = tester._forward(tester._state.params, image)

    from transoar_tpu.data.transforms import eval_transform

    expected = model.apply(
        {"params": state.params},
        eval_transform(image, cfg["foreground_voxel_statistics"]),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                               np.asarray(expected["pred_logits"]),
                               atol=1e-5)
    raw = model.apply({"params": state.params}, image, deterministic=True)
    assert not np.allclose(np.asarray(out["pred_logits"]),
                           np.asarray(raw["pred_logits"]), atol=1e-5), \
        "windowing had no effect — the regression this test pins"

    # the full protocol runs end to end and writes results
    tester.run()
    assert (run_dir / "results_test.json").exists()
    results = load_json(run_dir / "results_test.json")
    assert np.isfinite(results["mAP_coco"])
