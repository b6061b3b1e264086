"""Device-trace the on-device augmentation step and print op attribution.

The separable resample was designed as banded-matmul MXU work (~tens of
ms/volume by FLOP/bandwidth accounting) but measures ~600 ms/volume at
AMOS size (scripts/bench_ondevice_aug.py) — two orders off. This captures
where the time actually goes, reusing profile_step's trace parsing.

Usage: python scripts/profile_aug.py [--patch 256 256 128] [--steps 4]
       [--top 25]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from profile_step import attribute, by_source  # noqa: E402  (scripts/)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--patch", type=int, nargs=3, default=(256, 256, 128))
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--logdir", default="logs/profile_aug")
    p.add_argument("--resample", default="separable",
                   choices=["separable", "gather"])
    p.add_argument("--parse_only", action="store_true")
    args = p.parse_args()

    if not args.parse_only:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from transoar_tpu.data.transforms import augment_batch
        from transoar_tpu.presets import flagship_config
        from transoar_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        cfg = flagship_config(batch_size=1, patch_size=args.patch)
        aug = dict(cfg["augmentation"])
        aug["resample"] = args.resample
        num_classes = cfg["neck"]["num_organs"]

        shape = (1, *args.patch)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(size=(*shape, 1)).astype(np.float32))
        lab = jnp.asarray(rng.integers(0, num_classes + 1, size=shape)
                          .astype(np.int32))

        @jax.jit
        def step(img, lab, key):
            i, l = augment_batch(img, lab, key, aug, intensity_stats=None,
                                 num_classes=num_classes)
            return i.astype(jnp.float32), l.astype(jnp.int32)

        step_d = jax.jit(step, donate_argnums=(0, 1))
        key = jax.random.key(0)
        img, lab = step(img, lab, key)  # compile + warm
        float(img.ravel()[0])

        jax.profiler.start_trace(args.logdir)
        for i in range(args.steps):
            img, lab = step_d(img, lab, jax.random.fold_in(key, i))
        float(img.ravel()[0])
        jax.profiler.stop_trace()

    attribute(args.logdir, args.top, args.steps)
    by_source(args.logdir, args.steps, category=None)


if __name__ == "__main__":
    main()
