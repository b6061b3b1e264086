"""Measure the on-device augmentation cost per volume on the real chip.

The reference feeds its GPU from 16 CPU DataLoader workers running scipy
affines (reference transoar/data/dataloader.py:19-23, transforms.py:77-167);
our host twin costs ~1184 ms/volume, i.e. ~20 host cores per chip at the
flagship step rate (PERFORMANCE.md, input-pipeline section). The separable
banded-matmul resample (transoar_tpu/data/transforms.py:
affine_resample_separable) moves that work onto the MXU; this script
measures its real per-volume cost at flagship shape so the config default
(`augmentation.on_device`) can be flipped on measurement, not hope.

Timing discipline (CLAUDE.md): identical non-donated dispatches are
memoized through the axon tunnel, so the carry (image, label) is DONATED
and each dispatch consumes the previous output, with a fresh key folded in
per step; sync via float() on a scalar.

Usage: python scripts/bench_ondevice_aug.py [--patch 160 160 256]
       [--resample separable|gather] [--steps 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--patch", type=int, nargs=3, default=(160, 160, 256))
    p.add_argument("--resample", default="separable",
                   choices=["separable", "gather"])
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from transoar_tpu.data.transforms import augment_batch
    from transoar_tpu.presets import flagship_config

    cfg = flagship_config(batch_size=1, patch_size=args.patch)
    aug = dict(cfg["augmentation"])
    aug["resample"] = args.resample
    num_classes = cfg["neck"]["num_organs"]
    stats = None  # intensity window is a cheap clip; resample dominates

    shape = (1, *args.patch)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(*shape, 1)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, num_classes + 1, size=shape)
                      .astype(np.int32))

    @jax.jit
    def step(img, lab, key):
        i, l = augment_batch(img, lab, key, aug, intensity_stats=stats,
                             num_classes=num_classes)
        # keep shapes/dtypes closed so the output can be donated back in
        return i.astype(jnp.float32), l.astype(jnp.int32)

    step_donated = jax.jit(step, donate_argnums=(0, 1))

    key = jax.random.key(0)
    img, lab = step(img, lab, key)  # compile + warm
    float(img.ravel()[0])  # real sync through the tunnel

    t0 = time.perf_counter()
    for i in range(args.steps):
        img, lab = step_donated(img, lab, jax.random.fold_in(key, i))
    float(img.ravel()[0])
    dt = (time.perf_counter() - t0) / args.steps * 1000.0

    import json
    print(json.dumps({
        "metric": "ondevice_aug_ms_per_volume", "value": round(dt, 2),
        "unit": "ms", "resample": args.resample,
        "patch": list(args.patch), "steps": args.steps,
    }))


if __name__ == "__main__":
    main()
