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


def decompose_affine(matrix, offset):
    """Factor (M, o) into three per-axis passes T1 @ T2 @ T3 = (M, o),
    where Tk replaces coordinate k-1 by an affine function of all three
    coordinates (rows ``(a, b, c, t1)``, ``(d, e, f, t2)``,
    ``(g, h, i, t3)``).

    This is the LU-style multi-pass shear factorization that turns a
    trilinear resample into per-axis 1D interpolation passes — MXU matmuls
    instead of gathers (TPU gathers cost 671 ms/volume, PERFORMANCE.md §1).
    Valid whenever the pivots (m22, then the derived e, then a) are
    nonzero — true for any augmentation-range affine (rotations to ~45deg,
    zoom/shear/flip); a 90deg rotation would need an axis permutation
    first, which the reference's ranges (config rotation: +-5deg) never
    reach (reference transoar/data/transforms.py:100-115).
    """
    m = matrix
    g, h, i_ = m[2, 0], m[2, 1], m[2, 2]
    f = m[1, 2] / i_
    e = m[1, 1] - f * h
    d = m[1, 0] - f * g
    # T2@T3's rows 1/2 are (m10, m11, m12) and (m20, m21, m22) by
    # construction, so T1's row 0 must satisfy
    # (b*m11 + c*m21, b*m12 + c*m22) = (m01, m02): a 2x2 solve
    det = m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1]
    b = (m[0, 1] * m[2, 2] - m[0, 2] * m[2, 1]) / det
    c = (m[0, 2] * m[1, 1] - m[0, 1] * m[1, 2]) / det
    a = m[0, 0] - b * m[1, 0] - c * m[2, 0]
    t3 = offset[2]
    t2 = offset[1] - f * t3
    t1 = offset[0] - b * t2 - (b * f + c) * t3
    return (a, b, c, t1), (d, e, f, t2), (g, h, i_, t3)


def _axis_pass(vol, axis, other, own, oth, t, order):
    """One 1D resample along ``axis``: source position
    ``own * pos_axis + oth * pos_other + t``, zeros padding.

    The interpolation weights form a banded [S_other, S_out, S_in] matrix
    (dense for simplicity — a few tens of MB at AMOS size) applied as an
    explicit batched ``dot_general`` (batch = the coupled ``other`` axis,
    contraction minor on both operands): pure MXU work, no gathers. The
    earlier einsum spelling ("yxi,iyzc->xyzc" — batch dim mid-operand,
    contraction leading) lowered as broadcast-multiply-reduce and cost
    ~660 ms/volume at AMOS size; this formulation is a real batched
    matmul. order=1 -> hat weights (linear); order=0 -> one-hot at
    round(source) (nearest; EXACT for integer labels since the weight
    rows are {0, 1})."""
    S = vol.shape[axis]
    So = vol.shape[other]
    pos = jnp.arange(S, dtype=jnp.float32)
    s = own * pos[None, :] + oth * jnp.arange(
        So, dtype=jnp.float32)[:, None] + t      # [S_other, S_out]
    if order == 1:
        w = jnp.maximum(0.0, 1.0 - jnp.abs(s[..., None] - pos))
    else:
        w = (jnp.floor(s + 0.5)[..., None] == pos).astype(jnp.float32)
    # rows whose source lies outside [0, S-1] decay to partial/zero weight
    # automatically (the missing taps contribute nothing) == zeros padding.
    w = w.astype(vol.dtype)
    # vol [. . . C] -> [So, S_in, R]: batch leading, contraction next
    vt = jnp.moveaxis(vol, (other, axis), (0, 1))
    rest = vt.shape[2:]
    vt = vt.reshape(So, S, -1)
    # [So, S_out, S_in] x [So, S_in, R] -> [So, S_out, R]
    out = jax.lax.dot_general(w, vt, (((2,), (1,)), ((0,), (0,))))
    out = out.reshape(So, S, *rest)
    return jnp.moveaxis(out, (0, 1), (other, axis))


def affine_resample_separable(volume, matrix, offset, order):
    """Gather-free twin of ``affine_resample``: the composed affine is
    factored into six single-coordinate shear passes (two sub-passes per
    axis — the second folds in the third coordinate's contribution), each
    a banded-matmul 1D interpolation.

    vs the gather formulation: 671 ms -> ~2 ms/volume at AMOS size on a
    v5e (the TPU has no fast vector gather; it has a very fast MXU).
    Numerics: EXACT for axis-aligned affines (diagonal M — zoom /
    translate / flip, where trilinear factorizes into per-axis linear);
    for rotations/shears the cascaded 1D interpolation is a slightly
    smoother kernel than one trilinear gather (standard multi-pass shear
    resampling, cf. Paeth rotation) — validated against scipy within
    interpolation-order tolerance (tests/test_transforms.py).
    """
    (a, b, c, t1), (d, e, f, t2), (g, h, i_, t3) = decompose_affine(
        matrix, offset)
    v = volume[..., None] if volume.ndim == 3 else volume
    if not jnp.issubdtype(v.dtype, jnp.floating):
        v = v.astype(jnp.float32)
    # x' = a x + b y + c z + t1
    v = _axis_pass(v, 0, 1, a, b, t1, order)
    v = _axis_pass(v, 0, 2, 1.0, c / a, 0.0, order)
    # y' = d x + e y + f z + t2 (x already transformed)
    v = _axis_pass(v, 1, 0, e, d, t2, order)
    v = _axis_pass(v, 1, 2, 1.0, f / e, 0.0, order)
    # z' = g x + h y + i z + t3
    v = _axis_pass(v, 2, 0, i_, g, t3, order)
    v = _axis_pass(v, 2, 1, 1.0, h / i_, 0.0, order)
    out = v[..., 0] if volume.ndim == 3 else v
    return out.astype(volume.dtype)


def label_resample_separable(label, matrix, offset, num_classes):
    """Nearest-style label resampling without the per-pass rounding
    cascade: one-hot the classes (bf16 — exact for {0, 1} weights at this
    precision), run the LINEAR separable passes on the channel stack, and
    argmax. Positions are composite-exact (no intermediate rounding); the
    only deviation from single-gather nearest is the half-voxel band at
    region borders where max-interpolated-weight and nearest-corner can
    pick different neighbors — unbiased jitter, validated against scipy in
    tests/test_transforms.py."""
    onehot = jax.nn.one_hot(label, num_classes + 1, dtype=jnp.bfloat16)
    out = affine_resample_separable(onehot, matrix, offset, order=1)
    return jnp.argmax(out, axis=-1).astype(label.dtype)


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


@partial(jax.jit, static_argnames=("aug_static", "num_classes"))
def _augment_one(image, label, key, aug_static, num_classes=None):
    aug = dict(aug_static)
    k_affine, k_intensity = jax.random.split(key)
    matrix, offset = sample_affine(k_affine, image.shape[:3], aug)
    if aug.get("resample", "separable") == "separable":
        # banded-matmul per-axis passes — MXU work (~300x cheaper on TPU
        # than the gather formulation, kept as ``resample: gather``)
        img = affine_resample_separable(image[..., 0], matrix, offset,
                                        order=1)[..., None]
        if num_classes is not None:
            lab = label_resample_separable(label, matrix, offset,
                                           num_classes)
        else:
            lab = affine_resample_separable(label, matrix, offset, order=0)
    else:
        img = affine_resample(image[..., 0], matrix, offset,
                              order=1)[..., None]
        lab = affine_resample(label, matrix, offset, order=0)
    img = intensity_augment(k_intensity, img, aug)
    return img, lab


def augment_batch(images, labels, key, aug_config, intensity_stats=None,
                  num_classes=None):
    """Augment a batch on device.

    images [B, S0, S1, S2, 1] float32, labels [B, S0, S1, S2] int.
    ``intensity_stats``: foreground percentile dict for the initial window
    (applied before the spatial transforms, like the reference pipeline).
    ``num_classes``: enables the cascade-free one-hot label resample on the
    separable path (the trainer passes ``neck.num_organs``).
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
        lambda i, l, k: _augment_one(i, l, k, aug_static,
                                     num_classes=num_classes))(
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
