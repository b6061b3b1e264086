"""On-device augmentation tests: exactness of the fused affine in special
cases + statistical behavior of the random draws."""

import jax
import jax.numpy as jnp
import numpy as np

from transoar_tpu.data.transforms import (affine_resample, augment_batch,
                                          eval_transform,
                                          sample_affine,
                                          scale_intensity_range)


def _base_aug(**overrides):
    aug = {
        "patch_size": [8, 8, 4],
        "p_gaussian_noise": 0, "p_gaussian_smooth": 0,
        "p_intensity_scale": 0, "p_intensity_shift": 0,
        "p_adjust_contrast": 0, "p_rotate": 0, "p_zoom": 0, "p_shear": 0,
        "p_translate": 0, "p_flip": 0,
        "gaussian_noise_mean": 0.0, "gaussian_noise_std": 0.1,
        "intensity_scale_factors": 0.1, "intensity_shift_offsets": 0.1,
        "adjust_contrast_gamma": [0.7, 1.5],
        "rotation": [-5, 5], "min_zoom": 0.9, "max_zoom": 1.1,
        "translate_percentage": 10, "shear_range": [0.1, 0.1, 0.1],
        "flip_axis": [0, 1, 2],
    }
    aug.update(overrides)
    return aug


def test_scale_intensity_range():
    img = jnp.asarray([-100.0, 0.0, 50.0, 200.0])
    out = scale_intensity_range(img, 0.0, 100.0)
    np.testing.assert_allclose(np.asarray(out), [0, 0, 0.5, 1.0])


def test_identity_when_all_probabilities_zero(rng):
    images = jnp.asarray(rng.normal(size=(2, 8, 8, 4, 1)).astype(np.float32))
    labels = jnp.asarray((rng.uniform(size=(2, 8, 8, 4)) > 0.5)
                         .astype(np.int32))
    out_img, out_lab = augment_batch(images, labels, jax.random.key(0),
                                     _base_aug())
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(images),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(labels))


def test_flip_is_exact(rng):
    images = jnp.asarray(rng.normal(size=(1, 8, 8, 4, 1)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=(1, 8, 8, 4))
                         .astype(np.int32))
    # p_flip=1 flips all three axes deterministically
    out_img, out_lab = augment_batch(images, labels, jax.random.key(1),
                                     _base_aug(p_flip=1.0))
    np.testing.assert_allclose(
        np.asarray(out_img)[0, ..., 0],
        np.asarray(images)[0, ::-1, ::-1, ::-1, 0], atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(out_lab)[0], np.asarray(labels)[0, ::-1, ::-1, ::-1])


def test_integer_translation_shifts_labels():
    label = np.zeros((8, 8, 4), np.int32)
    label[2, 3, 1] = 7
    matrix = jnp.eye(3)
    offset = jnp.asarray([-1.0, 0.0, 0.0])  # source = out - 1 -> shift +1
    out = affine_resample(jnp.asarray(label), matrix, offset, order=0)
    out = np.asarray(out)
    assert out[3, 3, 1] == 7
    assert out.sum() == 7


def test_rotation_preserves_center_and_mass(rng):
    vol = np.zeros((16, 16, 16), np.float32)
    vol[6:10, 6:10, 6:10] = 1.0
    aug = _base_aug(p_rotate=1.0, rotation=[15, 15])
    matrix, offset = sample_affine(jax.random.key(0), (16, 16, 16), aug)
    out = np.asarray(affine_resample(jnp.asarray(vol), matrix, offset,
                                     order=1))
    # mass approximately preserved for an interior blob, center stays put
    np.testing.assert_allclose(out.sum(), vol.sum(), rtol=0.05)
    com_in = np.array(np.nonzero(vol)).mean(1)
    com_out = (np.array(np.nonzero(out > 0.1)) *
               out[out > 0.1]).sum(1) / out[out > 0.1].sum()
    np.testing.assert_allclose(com_out, com_in, atol=0.5)


def test_intensity_transforms_fire(rng):
    images = jnp.asarray(np.ones((1, 8, 8, 4, 1), np.float32) * 0.5)
    labels = jnp.zeros((1, 8, 8, 4), jnp.int32)
    out_img, _ = augment_batch(
        images, labels, jax.random.key(3),
        _base_aug(p_intensity_shift=1.0, intensity_shift_offsets=0.5))
    diff = float(np.abs(np.asarray(out_img) - 0.5).max())
    assert diff > 1e-4  # shift applied


def test_eval_transform_windows():
    stats = {"percentile_00_5": -100.0, "percentile_99_5": 100.0}
    img = jnp.asarray([[-200.0, 0.0, 200.0]])
    out = eval_transform(img, stats)
    np.testing.assert_allclose(np.asarray(out), [[0.0, 0.5, 1.0]])


def test_gaussian_smooth_matches_scipy(rng):
    """Device separable blur must match scipy's gaussian_filter with the
    same zero-padding convention (the host/MONAI path)."""
    from scipy import ndimage

    from transoar_tpu.data.transforms import gaussian_smooth

    img = jnp.asarray(rng.normal(size=(12, 10, 8)).astype(np.float32))
    sigmas = jnp.asarray([0.8, 0.6, 1.0])
    ours = gaussian_smooth(img, sigmas, radius=4)
    ref = ndimage.gaussian_filter(np.asarray(img), sigma=[0.8, 0.6, 1.0],
                                  mode="constant", cval=0.0, truncate=4.0)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-3)


def test_gaussian_smooth_augmentation_fires(rng):
    """p_gaussian_smooth=1 must blur (reduce local variation);
    p=0 must be exact identity."""
    images = jnp.asarray(rng.normal(size=(1, 8, 8, 4, 1)).astype(np.float32))
    labels = jnp.zeros((1, 8, 8, 4), jnp.int32)

    aug_off = _base_aug()
    out_off, _ = augment_batch(images, labels, jax.random.key(0), aug_off)
    np.testing.assert_array_equal(np.asarray(out_off), np.asarray(images))

    aug_on = _base_aug(p_gaussian_smooth=1.0,
                       gaussian_smooth_sigma=[0.5, 1.0])
    out_on, _ = augment_batch(images, labels, jax.random.key(0), aug_on)
    tv = lambda x: np.abs(np.diff(np.asarray(x)[0, ..., 0], axis=0)).mean()
    assert tv(out_on) < 0.6 * tv(images)


def test_host_gaussian_smooth_fires(rng):
    from transoar_tpu.data.transforms import augment_case_np

    image = rng.normal(size=(8, 8, 4, 1)).astype(np.float32)
    label = np.zeros((8, 8, 4), np.int32)
    aug = _base_aug(p_gaussian_smooth=1.0, gaussian_smooth_sigma=[0.5, 1.0])
    img_out, _ = augment_case_np(image, label, 0, aug)
    tv = lambda x: np.abs(np.diff(x[..., 0], axis=0)).mean()
    assert tv(img_out) < 0.6 * tv(image)


def test_validate_config_rejects_unknown_aug_keys():
    import pytest

    from transoar_tpu.utils.io import validate_config

    cfg = {"neck": {"name": "detr", "num_queries": 12, "num_organs": 3},
           "backbone": {}, "loss_coefs": {},
           "augmentation": {"p_gaussian_smooth": 0.2,
                            "p_made_up_transform": 0.5}}
    with pytest.raises(ValueError, match="p_made_up_transform"):
        validate_config(cfg)


# -- separable (gather-free) resample ---------------------------------------

def _random_affine(rng, shape, rot_deg=5.0):
    """An affine in the reference's augmentation ranges."""
    from transoar_tpu.data.transforms import sample_affine_np

    aug = _base_aug(p_rotate=1.0, p_zoom=1.0, p_translate=1.0, p_shear=1.0,
                    rotation=[-rot_deg, rot_deg])
    return sample_affine_np(np.random.default_rng(rng), shape, aug)


def test_decompose_affine_roundtrip():
    """T1 @ T2 @ T3 (matrices AND offsets) must recompose to (M, o)."""
    from transoar_tpu.data.transforms import decompose_affine

    m_np, o_np = _random_affine(3, (16, 16, 8), rot_deg=30.0)
    rows = decompose_affine(jnp.asarray(m_np, jnp.float32),
                            jnp.asarray(o_np, jnp.float32))
    (a, b, c, t1), (d, e, f, t2), (g, h, i_, t3) = [
        tuple(float(x) for x in r) for r in rows]
    T1 = np.array([[a, b, c], [0, 1, 0], [0, 0, 1]])
    T2 = np.array([[1, 0, 0], [d, e, f], [0, 0, 1]])
    T3 = np.array([[1, 0, 0], [0, 1, 0], [g, h, i_]])
    np.testing.assert_allclose(T1 @ T2 @ T3, m_np, atol=1e-5)
    o1, o2, o3 = np.array([t1, 0, 0]), np.array([0, t2, 0]), \
        np.array([0, 0, t3])
    np.testing.assert_allclose(T1 @ T2 @ o3 + T1 @ o2 + o1, o_np, atol=1e-4)


def test_separable_exact_for_axis_aligned():
    """Diagonal affines (zoom + translate + flip): the trilinear gather
    factorizes exactly into per-axis linear passes, so separable == gather
    to float tolerance — image (order 1) and labels (order 0)."""
    from transoar_tpu.data.transforms import (affine_resample,
                                              affine_resample_separable)

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(12, 10, 8)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 5, size=(12, 10, 8)).astype(np.int32))
    m = jnp.asarray(np.diag([1 / 1.07, -1.0, 1 / 0.93]), jnp.float32)
    o = jnp.asarray([0.7, 10.2, -1.3], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(affine_resample_separable(vol, m, o, order=1)),
        np.asarray(affine_resample(vol, m, o, order=1)),
        rtol=1e-4, atol=1e-4)
    sep = np.asarray(affine_resample_separable(lab, m, o, order=0))
    ref = np.asarray(affine_resample(lab, m, o, order=0))
    assert (sep != ref).mean() < 0.01  # rounding-tie voxels only


def test_separable_matches_scipy_for_rotation():
    """Reference-range rotation + zoom + shear + translation on a SMOOTH
    volume: the cascaded per-axis kernel is slightly smoother than one
    trilinear gather, so compare within interpolation-order tolerance;
    labels may differ only on a small boundary fraction."""
    from scipy import ndimage

    from transoar_tpu.data.transforms import affine_resample_separable

    rng = np.random.default_rng(1)
    vol = ndimage.gaussian_filter(
        rng.normal(size=(24, 20, 16)).astype(np.float32), 2.0)
    lab = np.zeros((24, 20, 16), np.int32)
    lab[6:18, 5:15, 4:12] = 3
    lab[10:14, 8:12, 6:10] = 1
    m_np, o_np = _random_affine(7, vol.shape)
    m, o = jnp.asarray(m_np, jnp.float32), jnp.asarray(o_np, jnp.float32)

    # interior only: at the <=1-voxel boundary shell scipy zeroes ANY
    # point outside the volume while both our resamples follow the
    # grid_sample convention (partial interpolation against zeros) — a
    # pre-existing, deliberate difference of the gather path too.
    interior = (slice(3, -3),) * 3
    img_ref = ndimage.affine_transform(vol, m_np, o_np, order=1,
                                       mode="constant", cval=0.0)
    img_sep = np.asarray(affine_resample_separable(
        jnp.asarray(vol), m, o, order=1))
    err = np.abs(img_sep - img_ref)[interior]
    assert err.max() < 0.05 * (vol.max() - vol.min()), err.max()
    assert err.mean() < 5e-3 * (vol.max() - vol.min())

    lab_ref = ndimage.affine_transform(lab, m_np, o_np, order=0,
                                       mode="constant", cval=0)
    # one-hot + linear passes + argmax: composite-exact positions (no
    # per-pass rounding cascade); deviations only in the half-voxel band
    # at region borders
    from transoar_tpu.data.transforms import label_resample_separable

    lab_sep = np.asarray(label_resample_separable(
        jnp.asarray(lab), m, o, num_classes=3))
    assert (lab_sep != lab_ref)[interior].mean() < 0.03  # region borders
    # the raw cascaded-nearest fallback drifts a little more but stays
    # border-local
    lab_casc = np.asarray(affine_resample_separable(
        jnp.asarray(lab), m, o, order=0))
    assert (lab_casc != lab_ref)[interior].mean() < 0.08


def test_augment_one_separable_default_matches_gather_when_aligned(rng):
    """The jitted per-sample augmentation runs the separable path by
    default; with only flips/translation/zoom drawn it must agree with the
    gather path draw-for-draw."""
    from transoar_tpu.data.transforms import augment_batch

    images = jnp.asarray(rng.normal(size=(2, 8, 8, 4, 1)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=(2, 8, 8, 4))
                         .astype(np.int32))
    aug_sep = _base_aug(p_zoom=1.0, p_translate=1.0, p_flip=0.5)
    aug_gat = dict(aug_sep, resample="gather")
    key = jax.random.key(3)
    img_s, lab_s = augment_batch(images, labels, key, aug_sep)
    img_g, lab_g = augment_batch(images, labels, key, aug_gat)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_g),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(lab_s) != np.asarray(lab_g)).mean() < 0.01
