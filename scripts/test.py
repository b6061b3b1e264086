"""Evaluation entry point.

Public API preserved from the reference (scripts/test.py:139-154):

    python scripts/test.py --run <experiment> [--val] [--last]
                           [--full_labeled] [--save_preds] [--save_attn_map]

Loads the frozen ``runs/<run>/config.json``, restores the best (or last)
checkpoint, evaluates on the test (or val) split and writes
``results_<split>.json`` with the full mAP family.
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

from transoar_tpu.data.dataset import get_loader
from transoar_tpu.eval.evaluator import build_evaluator
from transoar_tpu.models.transoarnet import build_model
from transoar_tpu.training import checkpoints as ckpt_lib
from transoar_tpu.training.inference import inference
from transoar_tpu.training.train_state import create_train_state
from transoar_tpu.training.trainer import derive_targets
from transoar_tpu.utils.io import set_root_logger, write_json

logger = logging.getLogger(__name__)


class Tester:
    def __init__(self, args):
        path_to_run = Path.cwd() / "runs" / args.run
        self._args = args
        self._path_to_run = path_to_run
        self._config = ckpt_lib.load_run_config(path_to_run)
        self._split = "val" if args.val else "test"

        self._model = build_model(self._config)
        self._loader = get_loader(self._config, self._split, batch_size=1,
                                  data_dir=args.data_dir)

        patch = self._config["augmentation"]["patch_size"]
        example = jnp.zeros(
            (1, *patch, self._config["backbone"]["in_channels"]))
        state = create_train_state(self._model, self._config, example,
                                   jax.random.key(0))
        ckpt = ckpt_lib.pick_checkpoint(path_to_run,
                                        prefer_best=not args.last)
        self._state, _, _ = ckpt_lib.restore_checkpoint(ckpt, state)
        logger.info("restored checkpoint %s", ckpt)

        self._evaluator = build_evaluator(self._config, per_class=True)
        self._num_organs = self._config["neck"]["num_organs"]

        # intensity window, exactly like training/validation (the reference
        # applies ScaleIntensityRanged on EVERY split, transforms.py:170-177)
        stats = self._config.get("foreground_voxel_statistics")

        def _window(image):
            if stats is None:
                return image
            from transoar_tpu.data.transforms import eval_transform

            return eval_transform(image, stats)

        self._is_retina = "retina" in self._config
        if self._is_retina:
            self._forward = jax.jit(
                lambda params, image: self._model.apply(
                    {"params": params}, _window(image), deterministic=True))
        else:
            self._forward = jax.jit(
                lambda params, image: self._model.apply(
                    {"params": params}, _window(image), deterministic=True,
                    return_weights=args.save_attn_map))

    def run(self):
        num_classes = self._num_organs
        attn_dir = self._path_to_run / f"attn_maps_{self._split}"
        pred_dir = self._path_to_run / f"predictions_{self._split}"

        for batch in self._loader:
            seg = jnp.asarray(batch["seg"])
            targets = derive_targets(seg, num_classes,
                                     self._config.get("bbox_padding", 1))
            present = np.asarray(targets["present"])[0]

            # Skip partially labeled cases (reference test.py:96-98),
            # unless --full_labeled is cleared.
            if self._args.full_labeled and present.sum() < num_classes:
                continue

            out = self._forward(self._state.params,
                                jnp.asarray(batch["image"]))
            if self._is_retina:
                from transoar_tpu.models.retina import retina_inference

                rcfg = self._config["retina"]
                boxes, classes, scores = retina_inference(
                    jax.device_get(out), self._model.anchors, num_classes,
                    iou_threshold=rcfg.get("nms_iou", 0.5),
                    score_threshold=rcfg.get("score_threshold", 0.05))
            else:
                boxes, classes, scores = inference(jax.device_get(out),
                                                   num_classes)

            tgt_boxes = np.asarray(targets["boxes"])[0]
            self._evaluator.add(
                boxes, classes, scores,
                gt_boxes=[tgt_boxes[present]],
                gt_classes=[np.nonzero(present)[0] + 1])

            if self._args.save_preds:
                from transoar_tpu.utils.visualization import \
                    save_pred_visualization

                save_pred_visualization(
                    boxes[0], classes[0], scores[0], tgt_boxes[present],
                    np.nonzero(present)[0] + 1, np.asarray(batch["seg"])[0],
                    pred_dir, int(batch["index"][0]))
            if self._args.save_attn_map and out.get("attn_weights") is None \
                    and not getattr(self, "_warned_no_attn", False):
                # deformable necks sample sparse points — there is no dense
                # attention map to export (the reference's hook protocol,
                # scripts/test.py:74-84, only exists for dense attention)
                self._warned_no_attn = True
                logger.warning(
                    "--save_attn_map: neck %r produced no attention "
                    "weights; skipping attention export",
                    self._config["neck"]["name"])
            if self._args.save_attn_map and out.get("attn_weights") is not None:
                from transoar_tpu.utils.visualization import \
                    save_attn_visualization

                save_attn_visualization(
                    jax.device_get(out), self._config, attn_dir,
                    int(batch["index"][0]),
                    seg=np.asarray(batch["seg"])[0])

        scores_dict = self._evaluator.eval()
        write_json(scores_dict,
                   self._path_to_run / f"results_{self._split}.json")
        logger.info("mAP_coco=%.4f mAP_nndet=%.4f",
                    scores_dict["mAP_coco"], scores_dict["mAP_nndet"])
        return scores_dict


def main():
    from transoar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--run", type=str, required=True,
                        help="Experiment name under ./runs.")
    parser.add_argument("--val", action="store_true",
                        help="Evaluate the val split instead of test.")
    parser.add_argument("--last", action="store_true",
                        help="Use the last instead of the best checkpoint.")
    parser.add_argument("--full_labeled", action="store_true",
                        help="Skip cases missing any class label.")
    parser.add_argument("--save_preds", action="store_true",
                        help="Export .ply prediction visualizations.")
    parser.add_argument("--save_attn_map", action="store_true",
                        help="Export decoder attention maps.")
    parser.add_argument("--data_dir", type=str, default=None)
    args = parser.parse_args()

    set_root_logger(Path.cwd() / "logs" / "test.log")
    Tester(args).run()


if __name__ == "__main__":
    main()
