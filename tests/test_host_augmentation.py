"""Host-side augmentation path: loader wrapping + trainer integration."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_config
from tests.test_training import _setup_run
from transoar_tpu.data.dataset import get_loader
from transoar_tpu.data.transforms import augment_case_np
from transoar_tpu.models.transoarnet import build_transoarnet
from transoar_tpu.training.train_state import create_train_state
from transoar_tpu.training.trainer import Trainer


def test_augment_case_np_determinism(rng):
    img = rng.normal(size=(16, 16, 8, 1)).astype(np.float32)
    lab = rng.integers(0, 3, size=(16, 16, 8)).astype(np.int32)
    aug = tiny_config()["augmentation"]
    aug = {**aug, "p_rotate": 1.0, "p_translate": 1.0}
    a1 = augment_case_np(img, lab, 7, aug)
    a2 = augment_case_np(img, lab, 7, aug)
    np.testing.assert_array_equal(a1[0], a2[0])
    np.testing.assert_array_equal(a1[1], a2[1])
    a3 = augment_case_np(img, lab, 8, aug)
    assert not np.array_equal(a1[0], a3[0])


def test_trainer_with_host_augmentation(tmp_path):
    cfg, ds_root = _setup_run(tmp_path, epochs=1)
    cfg["augmentation"]["use_augmentation"] = True
    cfg["augmentation"]["on_device"] = False
    cfg["augmentation"]["p_rotate"] = 1.0
    cfg["foreground_voxel_statistics"] = {
        "percentile_00_5": -1.0, "percentile_99_5": 2.0,
    }
    model = build_transoarnet(cfg)
    loader = get_loader(cfg, "train", data_dir=ds_root)
    example = jnp.zeros((2, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0),
                               steps_per_epoch=len(loader))
    trainer = Trainer(cfg, model, loader, loader, tmp_path / "runs" / "ha",
                      state=state)
    trainer._writer = None
    losses = trainer._train_one_epoch(1)
    assert np.isfinite(losses["total"])
