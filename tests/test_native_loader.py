"""Native C++ loader: builds, reads .npy cases, matches the Python loader."""

import numpy as np
import pytest

from tests.helpers import tiny_config
from transoar_tpu.data.dataset import Loader, TransoarDataset
from transoar_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    generate_dataset(root, name="synthetic", shape=(16, 16, 8),
                     num_classes=2, num_train=5, num_val=2, num_test=1,
                     seed=1)
    return root


def _dataset(dataset_dir):
    cfg = tiny_config(num_organs=2, qpo=1, patch=(16, 16, 8))
    cfg["dataset"] = "synthetic"
    return TransoarDataset(cfg, "train", data_dir=dataset_dir)


def test_native_builds_and_matches_python(dataset_dir):
    from transoar_tpu.native.native_loader import (NativeLoader,
                                                   native_available)

    if not native_available():
        pytest.skip("no C++ toolchain")

    ds = _dataset(dataset_dir)
    py = Loader(ds, batch_size=2, shuffle=False)
    nat = NativeLoader(ds, batch_size=2, shuffle=False, n_threads=3)

    assert len(py) == len(nat)
    for pb, nb in zip(py, nat):
        np.testing.assert_array_equal(pb["index"], nb["index"])
        np.testing.assert_allclose(pb["image"], nb["image"], atol=0)
        np.testing.assert_array_equal(pb["seg"], nb["seg"])


def test_native_shuffled_epochs_differ(dataset_dir):
    from transoar_tpu.native.native_loader import (NativeLoader,
                                                   native_available)

    if not native_available():
        pytest.skip("no C++ toolchain")

    ds = _dataset(dataset_dir)
    nat = NativeLoader(ds, batch_size=2, shuffle=True, seed=0, n_threads=2)
    epoch1 = [b["index"].tolist() for b in nat]
    epoch2 = [b["index"].tolist() for b in nat]
    flat1 = [i for b in epoch1 for i in b]
    flat2 = [i for b in epoch2 for i in b]
    # drop_last: 4 of 5 cases per epoch, all unique and in range
    assert len(flat1) == len(set(flat1)) == 4
    assert all(0 <= i < 5 for i in flat1)
    # shuffled order differs with overwhelming probability
    assert flat1 != flat2
