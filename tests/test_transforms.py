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
