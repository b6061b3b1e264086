"""On-device training augmentation: one fused affine resample + intensity
ops, all jittable functions of a PRNG key.

TPU-native re-design of the reference's MONAI CPU pipeline
(transoar/data/transforms.py:77-208). The reference chains RandRotated,
RandZoomd, RandAffined (translate), RandAffined (shear), RandFlipd x3 — each
a separate CPU resample in 16 DataLoader workers. Here the spatial
transforms compose into ONE affine matrix and a single trilinear (image) /
nearest (label) gather on device, inside the jitted input pipeline — 5
resamples become 1, and the augmentation runs on the TPU between steps.

Semantics per transform (same parameter ranges as the reference config):
- intensity window: clip to the foreground 0.5/99.5 percentiles and scale to
  [0, 1] (transforms.py:89-93);
- rotation: per-axis angles ~ U(rotation range), applied about the volume
  center (transforms.py:100-104);
- zoom: isotropic-per-axis factors ~ U(min_zoom, max_zoom) about the center
  (transforms.py:105-110);
- translation: per-axis offsets ~ U(-t, t) voxels where t = percentage of
  the median shape (transforms.py:111-115, 79);
- shear / flips as configured (off in the shipped configs);
- gaussian noise / intensity scale ("v * (1+f)") / shift ("v + o") /
  contrast gamma (transforms.py:140-161).

Each transform fires independently with its configured probability, like
the MONAI Rand*d transforms.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def scale_intensity_range(image, a_min, a_max, b_min=0.0, b_max=1.0):
    """Window + rescale + clip (MONAI ScaleIntensityRanged semantics)."""
    scaled = (image - a_min) / (a_max - a_min) * (b_max - b_min) + b_min
    return jnp.clip(scaled, b_min, b_max)


def _rotation_matrix(angles):
    """Rotation about the three axes, composed R2 @ R1 @ R0."""
    cx, sx = jnp.cos(angles[0]), jnp.sin(angles[0])
    cy, sy = jnp.cos(angles[1]), jnp.sin(angles[1])
    cz, sz = jnp.cos(angles[2]), jnp.sin(angles[2])
    r0 = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    r1 = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    r2 = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return r2 @ r1 @ r0


def sample_affine(key, spatial_shape, aug):
    """Draw one composed affine (voxel coords -> source voxel coords).

    Returns (matrix [3,3], offset [3]) mapping OUTPUT voxel coordinates to
    INPUT (source) coordinates, center-anchored.
    """
    keys = jax.random.split(key, 10)
    shape = jnp.asarray(spatial_shape, jnp.float32)
    center = (shape - 1.0) / 2.0

    deg = jnp.asarray(aug.get("rotation", [0, 0]), jnp.float32) / 180 * np.pi
    do_rot = jax.random.uniform(keys[0]) < aug.get("p_rotate", 0.0)
    angles = jnp.where(
        do_rot, jax.random.uniform(keys[1], (3,), minval=deg[0],
                                   maxval=deg[1]), 0.0)
    rot = _rotation_matrix(angles)

    do_zoom = jax.random.uniform(keys[2]) < aug.get("p_zoom", 0.0)
    zoom = jnp.where(
        do_zoom,
        jax.random.uniform(keys[3], (3,), minval=aug.get("min_zoom", 1.0),
                           maxval=aug.get("max_zoom", 1.0)), 1.0)
    # Output zoomed by z means source coords scaled by 1/z.
    scale = jnp.diag(1.0 / zoom)

    do_shear = jax.random.uniform(keys[4]) < aug.get("p_shear", 0.0)
    sh = jnp.asarray(aug.get("shear_range", [0, 0, 0]), jnp.float32)
    shear_vals = jnp.where(
        do_shear,
        jax.random.uniform(keys[5], (3,), minval=-sh, maxval=sh), 0.0)
    shear = jnp.array([[1.0, shear_vals[0], shear_vals[1]],
                       [0.0, 1.0, shear_vals[2]],
                       [0.0, 0.0, 1.0]])

    do_trans = jax.random.uniform(keys[6]) < aug.get("p_translate", 0.0)
    t = shape * aug.get("translate_percentage", 0) / 100.0
    trans = jnp.where(
        do_trans,
        jax.random.uniform(keys[7], (3,), minval=-t, maxval=t), 0.0)

    flip_mask = (jax.random.uniform(keys[8], (3,))
                 < aug.get("p_flip", 0.0)).astype(jnp.float32)
    flip = jnp.diag(1.0 - 2.0 * flip_mask)

    # source = M @ (out - center) + center - translation
    matrix = rot @ shear @ scale @ flip
    offset = center - matrix @ center - trans
    return matrix, offset


def affine_resample(volume, matrix, offset, order):
    """Resample [S0, S1, S2] by source = matrix @ out + offset.

    order=1: trilinear with zeros padding (image); order=0: nearest (label).
    One fused gather — this is the single resample replacing the reference's
    chained MONAI transforms.
    """
    shape = volume.shape
    grids = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in shape],
                         indexing="ij")
    out_coords = jnp.stack([g.reshape(-1) for g in grids])  # [3, N]
    src = matrix @ out_coords + offset[:, None]  # [3, N]

    def gather(idx3, valid):
        flat = (idx3[0] * shape[1] + idx3[1]) * shape[2] + idx3[2]
        vals = volume.reshape(-1)[flat]
        return jnp.where(valid, vals, 0)

    if order == 0:
        idx = jnp.round(src).astype(jnp.int32)
        valid = jnp.all((idx >= 0) & (idx < jnp.asarray(shape)[:, None]),
                        axis=0)
        idx = jnp.clip(idx, 0, jnp.asarray(shape)[:, None] - 1)
        out = gather(idx, valid)
    else:
        floor = jnp.floor(src)
        frac = src - floor
        floor = floor.astype(jnp.int32)
        out = 0.0
        for corner in range(8):
            bits = jnp.asarray([(corner >> a) & 1 for a in range(3)],
                               jnp.int32)
            idx = floor + bits[:, None]
            w = jnp.prod(jnp.where(bits[:, None] == 1, frac, 1 - frac),
                         axis=0)
            valid = jnp.all((idx >= 0) & (idx < jnp.asarray(shape)[:, None]),
                            axis=0)
            idx = jnp.clip(idx, 0, jnp.asarray(shape)[:, None] - 1)
            out = out + w * gather(idx, valid)
    return out.reshape(shape).astype(volume.dtype)


def gaussian_smooth(image, sigmas, radius):
    """Separable 3D gaussian blur with zero padding (the MONAI
    ``RandGaussianSmoothd``/``GaussianSmooth`` convention, reference
    transforms.py:144-149). ``sigmas`` [3] may be traced; ``radius`` is the
    static kernel half-width (taps beyond ~4 sigma are negligible)."""
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    for axis in range(3):
        w = jnp.exp(-0.5 * (offs / jnp.maximum(sigmas[axis], 1e-6)) ** 2)
        w = w / w.sum()
        pad = [(radius, radius) if i == axis else (0, 0)
               for i in range(image.ndim)]
        padded = jnp.pad(image, pad)
        out = jnp.zeros_like(image)
        for k in range(2 * radius + 1):
            sl = [slice(None)] * image.ndim
            sl[axis] = slice(k, k + image.shape[axis])
            out = out + w[k] * padded[tuple(sl)]
        image = out
    return image


def intensity_augment(key, image, aug):
    keys = jax.random.split(key, 10)

    do_noise = jax.random.uniform(keys[0]) < aug.get("p_gaussian_noise", 0.0)
    noise = jax.random.normal(keys[1], image.shape) * \
        aug.get("gaussian_noise_std", 0.1) + aug.get("gaussian_noise_mean", 0)
    image = jnp.where(do_noise, image + noise, image)

    # gaussian smooth, per-axis sigma ~ U(range) (reference transforms.py:144)
    p_smooth = aug.get("p_gaussian_smooth", 0.0)
    if p_smooth > 0.0:
        sig = aug.get("gaussian_smooth_sigma", (0.5, 1.0))
        do_smooth = jax.random.uniform(keys[8]) < p_smooth
        sigmas = jax.random.uniform(keys[9], (3,), minval=sig[0],
                                    maxval=sig[1])
        radius = max(1, int(round(4 * float(sig[1]))))
        image = jnp.where(do_smooth, gaussian_smooth(image, sigmas, radius),
                          image)

    do_scale = jax.random.uniform(keys[2]) < aug.get("p_intensity_scale", 0.0)
    f = aug.get("intensity_scale_factors", 0.1)
    factor = 1.0 + jax.random.uniform(keys[3], minval=-f, maxval=f)
    image = jnp.where(do_scale, image * factor, image)

    do_shift = jax.random.uniform(keys[4]) < aug.get("p_intensity_shift", 0.0)
    o = aug.get("intensity_shift_offsets", 0.1)
    offset = jax.random.uniform(keys[5], minval=-o, maxval=o)
    image = jnp.where(do_shift, image + offset, image)

    do_gamma = jax.random.uniform(keys[6]) < aug.get("p_adjust_contrast", 0.0)
    g = aug.get("adjust_contrast_gamma", [1.0, 1.0])
    gamma = jax.random.uniform(keys[7], minval=g[0], maxval=g[1])
    eps = 1e-7
    lo, hi = image.min(), image.max()
    normed = (image - lo) / (hi - lo + eps)
    image = jnp.where(do_gamma, normed ** gamma * (hi - lo) + lo, image)

    return image


@partial(jax.jit, static_argnames=("aug_static",))
def _augment_one(image, label, key, aug_static):
    aug = dict(aug_static)
    k_affine, k_intensity = jax.random.split(key)
    matrix, offset = sample_affine(k_affine, image.shape[:3], aug)
    img = affine_resample(image[..., 0], matrix, offset, order=1)[..., None]
    lab = affine_resample(label, matrix, offset, order=0)
    img = intensity_augment(k_intensity, img, aug)
    return img, lab


def augment_batch(images, labels, key, aug_config, intensity_stats=None):
    """Augment a batch on device.

    images [B, S0, S1, S2, 1] float32, labels [B, S0, S1, S2] int.
    ``intensity_stats``: foreground percentile dict for the initial window
    (applied before the spatial transforms, like the reference pipeline).
    """
    if intensity_stats is not None:
        images = scale_intensity_range(
            images, intensity_stats["percentile_00_5"],
            intensity_stats["percentile_99_5"])
    aug_static = tuple(sorted(
        (k, tuple(v) if isinstance(v, list) else v)
        for k, v in aug_config.items() if k != "use_augmentation"))
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(
        lambda i, l, k: _augment_one(i, l, k, aug_static))(
            images, labels, keys)


def eval_transform(images, intensity_stats):
    """Val/test path: intensity window only (transforms.py:168-205)."""
    return scale_intensity_range(
        images, intensity_stats["percentile_00_5"],
        intensity_stats["percentile_99_5"])


# ---------------------------------------------------------------------------
# Host-side (numpy/scipy) augmentation — the reference-style CPU path.
#
# Same semantics as the on-device pipeline, run in loader threads (scipy's
# affine_transform releases the GIL) so augmentation overlaps with TPU
# compute instead of serializing into the train step. Select with
# ``augmentation.on_device: false``.
# ---------------------------------------------------------------------------

def sample_affine_np(rng, spatial_shape, aug):
    """Numpy twin of ``sample_affine`` (output voxel -> source voxel)."""
    shape = np.asarray(spatial_shape, np.float64)
    center = (shape - 1.0) / 2.0

    deg = np.asarray(aug.get("rotation", [0, 0]), np.float64) / 180 * np.pi
    angles = (rng.uniform(deg[0], deg[1], 3)
              if rng.uniform() < aug.get("p_rotate", 0.0) else np.zeros(3))
    cx, sx = np.cos(angles[0]), np.sin(angles[0])
    cy, sy = np.cos(angles[1]), np.sin(angles[1])
    cz, sz = np.cos(angles[2]), np.sin(angles[2])
    r0 = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    r1 = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    r2 = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    rot = r2 @ r1 @ r0

    zoom = (rng.uniform(aug.get("min_zoom", 1.0), aug.get("max_zoom", 1.0), 3)
            if rng.uniform() < aug.get("p_zoom", 0.0) else np.ones(3))
    scale = np.diag(1.0 / zoom)

    sh = np.asarray(aug.get("shear_range", [0, 0, 0]), np.float64)
    shear_vals = (rng.uniform(-sh, sh)
                  if rng.uniform() < aug.get("p_shear", 0.0) else np.zeros(3))
    shear = np.array([[1.0, shear_vals[0], shear_vals[1]],
                      [0.0, 1.0, shear_vals[2]],
                      [0.0, 0.0, 1.0]])

    t = shape * aug.get("translate_percentage", 0) / 100.0
    trans = (rng.uniform(-t, t)
             if rng.uniform() < aug.get("p_translate", 0.0) else np.zeros(3))

    flips = (rng.uniform(size=3) < aug.get("p_flip", 0.0)).astype(np.float64)
    flip = np.diag(1.0 - 2.0 * flips)

    matrix = rot @ shear @ scale @ flip
    offset = center - matrix @ center - trans
    return matrix, offset


def augment_case_np(image, label, seed, aug, intensity_stats=None):
    """Augment one case on host. image [S0,S1,S2,1] f32, label [S0,S1,S2]."""
    from scipy import ndimage

    rng = np.random.default_rng(seed)
    img = image[..., 0].astype(np.float32)

    if intensity_stats is not None:
        lo = intensity_stats["percentile_00_5"]
        hi = intensity_stats["percentile_99_5"]
        img = np.clip((img - lo) / (hi - lo), 0.0, 1.0).astype(np.float32)

    matrix, offset = sample_affine_np(rng, img.shape, aug)
    if not (np.allclose(matrix, np.eye(3)) and np.allclose(offset, 0)):
        img = ndimage.affine_transform(img, matrix, offset, order=1,
                                       mode="constant", cval=0.0)
        label = ndimage.affine_transform(label, matrix, offset, order=0,
                                         mode="constant", cval=0)

    # intensity transforms (same draws as the device path, per-case rng)
    if rng.uniform() < aug.get("p_gaussian_noise", 0.0):
        img = img + rng.normal(aug.get("gaussian_noise_mean", 0.0),
                               aug.get("gaussian_noise_std", 0.1),
                               img.shape).astype(np.float32)
    if rng.uniform() < aug.get("p_gaussian_smooth", 0.0):
        sig = aug.get("gaussian_smooth_sigma", (0.5, 1.0))
        sigmas = rng.uniform(sig[0], sig[1], 3)
        # zero padding to match the device path / MONAI's conv convention
        img = ndimage.gaussian_filter(img, sigma=sigmas, mode="constant",
                                      cval=0.0, truncate=4.0)
    if rng.uniform() < aug.get("p_intensity_scale", 0.0):
        f = aug.get("intensity_scale_factors", 0.1)
        img = img * (1.0 + rng.uniform(-f, f))
    if rng.uniform() < aug.get("p_intensity_shift", 0.0):
        o = aug.get("intensity_shift_offsets", 0.1)
        img = img + rng.uniform(-o, o)
    if rng.uniform() < aug.get("p_adjust_contrast", 0.0):
        g = aug.get("adjust_contrast_gamma", [1.0, 1.0])
        gamma = rng.uniform(g[0], g[1])
        lo, hi = img.min(), img.max()
        img = ((img - lo) / (hi - lo + 1e-7)) ** gamma * (hi - lo) + lo

    return img.astype(np.float32)[..., None], label.astype(np.int32)


class HostAugmentingLoader:
    """Wraps a loader; augments each batch's cases in a thread pool
    (overlapping with device compute via the trainer's prefetch)."""

    def __init__(self, loader, aug_config, intensity_stats=None, seed=0,
                 workers=8):
        from concurrent.futures import ThreadPoolExecutor

        self._loader = loader
        self._aug = dict(aug_config)
        self._stats = intensity_stats
        self._seed = seed
        self._epoch = 0
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def __len__(self):
        return len(self._loader)

    def __iter__(self):
        epoch = self._epoch
        self._epoch += 1
        for step, batch in enumerate(self._loader):
            images, segs = batch["image"], batch["seg"]

            def one(i):
                # Seed from the sharding-invariant case identity (the
                # dataset index the loader carries), NOT the local batch
                # position: with multi-host row-sharded loaders the i-th
                # local row is a different global row on every process, and
                # position-keyed seeds would hand different cases duplicated
                # augmentation draws. (epoch, step, case) is identical
                # across any process topology and in single-process runs.
                case = int(batch["index"][i]) if "index" in batch else i
                seed = (self._seed * 1_000_003 + epoch * 10_007 +
                        step * 101 + case)
                return augment_case_np(images[i], segs[i], seed, self._aug,
                                       self._stats)

            results = list(self._pool.map(one, range(images.shape[0])))
            batch = dict(batch)
            batch["image"] = np.stack([r[0] for r in results])
            batch["seg"] = np.stack([r[1] for r in results])
            yield batch
