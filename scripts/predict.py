"""Single-case serving CLI: raw NIfTI in -> organ detections out.

Goes beyond the reference (whose scripts/test.py only evaluates
pre-processed dataset splits): this runs the FULL pipeline on one new,
unlabeled CT volume — NIfTI decode, RAS reorientation, resize to the
model's training grid, test-time intensity window (identical to
reference transforms.py:170-177), jitted forward, prediction decode —
and writes the detections back in the caller's coordinate frames:

    python scripts/predict.py --run <experiment> --input case.nii.gz \
        [--output out_dir] [--last] [--save_boxmask] [--score_threshold T]

Outputs ``<case>_predictions.json`` with, per detected organ: score and
the box as (a) normalized cxcyczwhd in array-axis order (the model's
native frame), (b) voxel-space corners in the RAS-oriented input grid,
and (c) world-space (mm, RAS) corners via the NIfTI affine. With
``--save_boxmask`` also writes ``<case>_boxmask.nii.gz`` — the boxes
rasterized as a label volume on the RAS input grid, for overlay in any
NIfTI viewer.

No label/segmentation is required: unlike the offline PreProcessor
(data/preprocessor.py), which crops to border organs using the ground
truth, prediction resizes the whole RAS volume to the training grid.
For volumes resembling the training distribution (e.g. abdominal CT for
AMOS models) this matches the preprocessed geometry closely.
"""

from __future__ import annotations

import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def load_predictor(path_to_run, prefer_best=True):
    """Restore (config, model, params, jitted forward) from a run dir."""
    from transoar_tpu.data.transforms import eval_transform
    from transoar_tpu.models.transoarnet import build_model
    from transoar_tpu.training import checkpoints as ckpt_lib
    from transoar_tpu.training.train_state import create_train_state

    config = ckpt_lib.load_run_config(path_to_run)
    model = build_model(config)
    patch = config["augmentation"]["patch_size"]
    example = jnp.zeros((1, *patch, config["backbone"]["in_channels"]))
    state = create_train_state(model, config, example, jax.random.key(0))
    ckpt = ckpt_lib.pick_checkpoint(path_to_run, prefer_best=prefer_best)
    state, _, _ = ckpt_lib.restore_checkpoint(ckpt, state)
    logger.info("restored %s", ckpt)

    stats = config.get("foreground_voxel_statistics")

    @jax.jit
    def forward(params, image):
        from transoar_tpu.training.trainer import per_sample_apply

        if stats is not None:
            image = eval_transform(image, stats)
        # per-sample map: multi-volume requests serve at batch-1 per-volume
        # speed (trainer.py per_sample_apply)
        return per_sample_apply(model, params, image)

    return config, model, state.params, forward


def prepare_volume(path, target_shape):
    """NIfTI file -> (model input [1, S0, S1, S2, 1], ras_volume, affine)."""
    from transoar_tpu.data.nifti import load_nifti, reorient_ras
    from transoar_tpu.data.preprocessor import resize_volume

    img = load_nifti(path)
    ras, affine = reorient_ras(img["data"], img["affine"])
    ras = ras.astype(np.float32)
    if ras.ndim == 4:  # drop a trailing singleton time axis
        ras = ras[..., 0]
    resized = resize_volume(ras, tuple(target_shape), order=1)
    return resized[None, ..., None], ras, affine


def boxes_to_frames(boxes_norm, ras_shape, affine):
    """Normalized cxcyczwhd (array-axis order) -> voxel + world corners."""
    shape = np.asarray(ras_shape, np.float64)
    c = boxes_norm[:, :3] * shape
    h = boxes_norm[:, 3:] * shape / 2.0
    lo_vox, hi_vox = c - h, c + h
    # world (mm, RAS): the reoriented affine is diagonal scale + offset
    scale = np.diag(np.asarray(affine)[:3, :3])
    off = np.asarray(affine)[:3, 3]
    return lo_vox, hi_vox, lo_vox * scale + off, hi_vox * scale + off


def rasterize_boxes(lo_vox, hi_vox, classes, ras_shape):
    """Boxes -> label volume on the RAS grid (for viewer overlay)."""
    mask = np.zeros(ras_shape, np.int16)
    for lo, hi, cls in zip(lo_vox, hi_vox, classes):
        lo_i = np.clip(np.floor(lo).astype(int), 0, np.array(ras_shape) - 1)
        hi_i = np.clip(np.ceil(hi).astype(int), 1, np.array(ras_shape))
        slc = tuple(slice(a, b) for a, b in zip(lo_i, hi_i))
        mask[slc] = int(cls)
    return mask


def predict_case(input_path, config, params, forward, score_threshold=0.0):
    from transoar_tpu.training.inference import inference

    target = (config.get("preprocessing_config", {}) or {}).get(
        "resize_shape") or config["augmentation"]["patch_size"]
    image, ras, affine = prepare_volume(input_path, target)

    out = forward(params, jnp.asarray(image))
    boxes, classes, scores = inference(jax.device_get(out),
                                       config["neck"]["num_organs"])
    boxes, classes, scores = boxes[0], classes[0], scores[0]
    keep = scores >= score_threshold
    boxes, classes, scores = boxes[keep], classes[keep], scores[keep]

    lo_v, hi_v, lo_w, hi_w = boxes_to_frames(boxes, ras.shape, affine)
    labels = config.get("labels", {})
    detections = [{
        "class": int(cls),
        "name": labels.get(str(int(cls)), f"class{int(cls)}"),
        "score": float(s),
        "box_cxcyczwhd_norm": [float(v) for v in box],
        "voxel_lo": [float(v) for v in lo],
        "voxel_hi": [float(v) for v in hi],
        "world_mm_lo": [float(v) for v in wl],
        "world_mm_hi": [float(v) for v in wh],
    } for cls, s, box, lo, hi, wl, wh in zip(
        classes, scores, boxes, lo_v, hi_v, lo_w, hi_w)]
    return detections, (lo_v, hi_v, classes), ras.shape, affine


def main():
    from transoar_tpu.utils.cache import enable_compilation_cache
    from transoar_tpu.utils.io import set_root_logger, write_json

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", type=str, required=True,
                        help="Experiment name under ./runs.")
    parser.add_argument("--input", type=str, required=True, nargs="+",
                        help="One or more .nii/.nii.gz volumes.")
    parser.add_argument("--output", type=str, default=None,
                        help="Output dir (default runs/<run>/predictions).")
    parser.add_argument("--last", action="store_true",
                        help="Use model_last instead of the best checkpoint.")
    parser.add_argument("--score_threshold", type=float, default=0.0)
    parser.add_argument("--save_boxmask", action="store_true",
                        help="Also write the boxes as a NIfTI label volume "
                             "on the RAS input grid.")
    args = parser.parse_args()

    set_root_logger(Path.cwd() / "logs" / "predict.log")
    path_to_run = Path.cwd() / "runs" / args.run
    out_dir = Path(args.output) if args.output else \
        path_to_run / "predictions"
    out_dir.mkdir(parents=True, exist_ok=True)

    config, _, params, forward = load_predictor(path_to_run,
                                                prefer_best=not args.last)
    for inp in args.input:
        stem = Path(inp).name.replace(".nii.gz", "").replace(".nii", "")
        detections, (lo_v, hi_v, classes), ras_shape, affine = predict_case(
            inp, config, params, forward, args.score_threshold)
        write_json({"input": str(inp), "run": args.run,
                    "detections": detections},
                   out_dir / f"{stem}_predictions.json")
        if args.save_boxmask:
            from transoar_tpu.data.nifti import write_nifti

            mask = rasterize_boxes(lo_v, hi_v, classes, ras_shape)
            write_nifti(mask, out_dir / f"{stem}_boxmask.nii.gz",
                        affine=affine)
        logger.info("%s: %d detections", stem, len(detections))
        print(f"{stem}: {len(detections)} detections -> "
              f"{out_dir / (stem + '_predictions.json')}")


if __name__ == "__main__":
    main()
