"""NIfTI codec + offline preprocessor tests on synthetic raw data."""

import numpy as np
import pytest

from transoar_tpu.data.nifti import load_nifti, reorient_ras, write_nifti
from transoar_tpu.data.preprocessor import (PreProcessor, crop_to_mask,
                                            resize_volume)
from transoar_tpu.utils.io import load_json


def test_nifti_roundtrip(tmp_path, rng):
    data = rng.normal(size=(12, 10, 8)).astype(np.float32)
    path = tmp_path / "vol.nii.gz"
    write_nifti(data, path, spacing=(1.5, 1.5, 3.0))
    loaded = load_nifti(path)
    np.testing.assert_allclose(loaded["data"], data, atol=1e-6)
    np.testing.assert_allclose(loaded["spacing"], [1.5, 1.5, 3.0])


def test_nifti_int_labels_roundtrip(tmp_path):
    label = np.zeros((6, 6, 4), np.int16)
    label[2:4, 2:4, 1:3] = 3
    path = tmp_path / "label.nii"
    write_nifti(label, path)
    loaded = load_nifti(path)
    np.testing.assert_array_equal(loaded["data"].astype(np.int16), label)


def test_nifti_scl_inter_applied_with_unit_slope(tmp_path):
    """NIfTI-1 requires slope*v + inter whenever slope != 0 — in particular
    the common CT encoding slope=1, inter=-1024 must rescale."""
    import gzip
    import struct

    data = np.arange(24, dtype=np.int16).reshape(4, 3, 2)
    path = tmp_path / "ct.nii"
    write_nifti(data, path)
    raw = bytearray(path.read_bytes())
    struct.pack_into("<f", raw, 112, 1.0)      # scl_slope
    struct.pack_into("<f", raw, 116, -1024.0)  # scl_inter
    path.write_bytes(bytes(raw))

    loaded = load_nifti(path)
    np.testing.assert_allclose(loaded["data"],
                               data.astype(np.float32) - 1024.0)


def _spec_nifti_bytes(data, srow, scl_slope=0.0, scl_inter=0.0,
                      pixdim=(1.0, 1.0, 1.0), sform_code=1):
    """Hand-build NIfTI-1 file bytes straight from the spec
    (https://nifti.nimh.nih.gov/nifti-1, struct layout of nifti_1_header) —
    deliberately NOT via ``write_nifti``, to cross-validate the codec
    against an independent writer the way the reference's SimpleITK reader
    would consume third-party files (reference transoar/utils/io.py:40-67).
    """
    import struct

    data = np.asarray(data)
    code = {np.dtype(np.int16): 4, np.dtype(np.float32): 16,
            np.dtype(np.float64): 64, np.dtype(np.uint8): 2}[data.dtype]
    hdr = bytearray(352)
    struct.pack_into("<i", hdr, 0, 348)                      # sizeof_hdr
    struct.pack_into("<8h", hdr, 40, data.ndim, *data.shape,
                     *([1] * (7 - data.ndim)))               # dim
    struct.pack_into("<h", hdr, 70, code)                    # datatype
    struct.pack_into("<h", hdr, 72, data.dtype.itemsize * 8)  # bitpix
    struct.pack_into("<8f", hdr, 76, 0.0, *pixdim, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into("<f", hdr, 108, 352.0)                  # vox_offset
    struct.pack_into("<f", hdr, 112, scl_slope)
    struct.pack_into("<f", hdr, 116, scl_inter)
    struct.pack_into("<h", hdr, 252, 0)                      # qform_code
    struct.pack_into("<h", hdr, 254, sform_code)
    struct.pack_into("<12f", hdr, 280, *np.asarray(srow, np.float32).ravel())
    hdr[344:348] = b"n+1\0"
    return bytes(hdr) + data.tobytes(order="F")


def test_nifti_reads_externally_written_file(tmp_path):
    """Codec cross-validation: files produced by an independent spec-level
    writer (int16 + scl rescale, .nii and .nii.gz) load to the known grid."""
    data = (np.arange(4 * 3 * 2, dtype=np.int16).reshape(4, 3, 2) - 10)
    srow = [[1.5, 0, 0, -7.0], [0, 1.5, 0, 3.0], [0, 0, 2.0, 0.0]]
    raw = _spec_nifti_bytes(data, srow, scl_slope=2.0, scl_inter=-500.0,
                            pixdim=(1.5, 1.5, 2.0))

    import gzip

    (tmp_path / "ext.nii").write_bytes(raw)
    with gzip.open(tmp_path / "ext.nii.gz", "wb") as f:
        f.write(raw)

    for name in ("ext.nii", "ext.nii.gz"):
        loaded = load_nifti(tmp_path / name)
        np.testing.assert_allclose(
            loaded["data"], data.astype(np.float32) * 2.0 - 500.0)
        np.testing.assert_allclose(loaded["spacing"], [1.5, 1.5, 2.0])
        np.testing.assert_allclose(loaded["affine"][:3, :],
                                   np.asarray(srow), atol=1e-6)


def test_nifti_external_non_ras_orientation(tmp_path):
    """A spec-written LAS-oriented volume (voxel axis 0 runs R->L) must
    come out of load + reorient_ras as the flipped RAS grid."""
    data = np.arange(5 * 4 * 3, dtype=np.float32).reshape(5, 4, 3)
    srow = [[-2.0, 0, 0, 8.0], [0, 1.0, 0, 0.0], [0, 0, 1.0, 0.0]]
    (tmp_path / "las.nii").write_bytes(
        _spec_nifti_bytes(data, srow, pixdim=(2.0, 1.0, 1.0)))

    loaded = load_nifti(tmp_path / "las.nii")
    out, affine = reorient_ras(loaded["data"], loaded["affine"])
    np.testing.assert_array_equal(out, data[::-1])
    assert affine[0, 0] == 2.0  # spacing magnitude kept, direction now +R


def test_nifti_external_permuted_orientation(tmp_path):
    """A spec-written volume whose voxel axes map to world (Z, X, Y) must
    reorient to RAS as the inverse axis permutation."""
    data = np.arange(4 * 3 * 2, dtype=np.float32).reshape(4, 3, 2)
    # voxel axis 0 -> +Z, axis 1 -> +X, axis 2 -> +Y
    srow = [[0, 1.0, 0, 0.0], [0, 0, 1.0, 0.0], [3.0, 0, 0, 0.0]]
    (tmp_path / "perm.nii").write_bytes(_spec_nifti_bytes(data, srow))

    loaded = load_nifti(tmp_path / "perm.nii")
    out, _ = reorient_ras(loaded["data"], loaded["affine"])
    np.testing.assert_array_equal(out, np.transpose(data, (1, 2, 0)))


def test_reorient_ras_flip():
    data = np.arange(24, dtype=np.float32).reshape(4, 3, 2)
    affine = np.diag([-1.0, 1.0, 1.0, 1.0])  # L-flip on axis 0
    out, new_affine = reorient_ras(data, affine)
    np.testing.assert_array_equal(out, data[::-1])
    assert new_affine[0, 0] > 0


def test_resize_volume_shapes_and_labels():
    vol = np.zeros((20, 20, 10), np.float32)
    vol[5:15, 5:15, 2:8] = 1.0
    out = resize_volume(vol, (10, 10, 5), order=1)
    assert out.shape == (10, 10, 5)
    lab = resize_volume(vol.astype(np.int32), (10, 10, 5), order=0)
    assert set(np.unique(lab)) <= {0, 1}


def test_crop_to_mask_margin():
    img = np.zeros((10, 10, 10), np.float32)
    lbl = np.zeros((10, 10, 10), np.int32)
    lbl[4:6, 4:6, 4:6] = 1
    ci, cl = crop_to_mask(img, lbl, lbl > 0, margin=[1, 1, 1])
    assert ci.shape == (4, 4, 4)


def _write_raw_case(root, name, seed, shape=(24, 24, 16), classes=(1, 2)):
    rng = np.random.default_rng(seed)
    label = np.zeros(shape, np.int16)
    # organs away from the boundary
    label[4:14, 4:14, 3:9] = classes[0]
    label[14:20, 14:20, 8:14] = classes[1]
    image = label.astype(np.float32) * 100 + \
        rng.normal(scale=10, size=shape).astype(np.float32)
    (root / "imagesTr").mkdir(parents=True, exist_ok=True)
    (root / "labelsTr").mkdir(parents=True, exist_ok=True)
    write_nifti(image, root / "imagesTr" / f"{name}.nii.gz")
    write_nifti(label, root / "labelsTr" / f"{name}.nii.gz")


def test_preprocessor_end_to_end(tmp_path):
    raw = tmp_path / "raw"
    for i in range(3):
        _write_raw_case(raw, f"case{i}", seed=i)

    splits = {
        "train": [{"image": f"imagesTr/case{i}.nii.gz",
                   "label": f"labelsTr/case{i}.nii.gz",
                   "name": f"case{i}"} for i in range(2)],
        "val": [{"image": "imagesTr/case2.nii.gz",
                 "label": "labelsTr/case2.nii.gz", "name": "case2"}],
        "test": [],
    }
    out = tmp_path / "dataset" / "synthetic_raw"
    prep_cfg = {
        "resize_shape": [24, 24, 16],
        "margin": [2, 2, 2],
        "border_organs": None,
        "orientation": "RAS",
    }
    data_cfg = {"num_classes": 2, "labels": {"1": "a", "2": "b"},
                "labels_small": {}, "labels_mid": {}, "labels_large": {}}
    PreProcessor(splits, raw, out, prep_cfg, data_cfg).run()

    info = load_json(out / "data_info.json")
    assert set(info["bbox_properties"].keys()) == {"1", "2"}
    for props in info["bbox_properties"].values():
        area = np.array(props["attn_area"])
        assert (area[3:] >= area[:3]).all()
        median = np.array(props["median"])
        assert (median[3:] > 0).all()

    case_dir = out / "train" / "case0"
    data = np.load(case_dir / "data.npy")
    label = np.load(case_dir / "label.npy")
    assert data.shape == (24, 24, 16)
    assert label.dtype == np.int32


def test_preprocessor_border_organ_filter(tmp_path):
    raw = tmp_path / "raw"
    # organ 1 touches the boundary -> case must be skipped
    shape = (16, 16, 8)
    label = np.zeros(shape, np.int16)
    label[0:6, 4:10, 2:6] = 1
    image = np.zeros(shape, np.float32)
    (raw / "i").mkdir(parents=True)
    write_nifti(image, raw / "i" / "img.nii.gz")
    write_nifti(label, raw / "i" / "lbl.nii.gz")

    splits = {"train": [{"image": "i/img.nii.gz", "label": "i/lbl.nii.gz",
                         "name": "c"}], "val": [], "test": []}
    out = tmp_path / "out"
    prep_cfg = {"resize_shape": [16, 16, 8], "margin": [0, 0, 0],
                "border_organs": [1]}
    with pytest.raises(RuntimeError, match="zero cases"):
        # no surviving cases -> fails loudly BEFORE writing NaN statistics
        PreProcessor(splits, raw, out, prep_cfg, {}).run()
    assert not (out / "train" / "c").exists()
    assert not (out / "data_info.json").exists()
