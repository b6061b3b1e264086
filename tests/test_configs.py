"""Every shipped experiment config must build and run a forward pass
(structural regression test for config/model wiring)."""

import jax
import jax.numpy as jnp
import pytest

from transoar_tpu.models.transoarnet import build_model
from transoar_tpu.presets import fill_synthetic_stats
from transoar_tpu.utils.io import get_config, validate_config

CONFIGS = [
    "foc_dec_amos", "foc_dec_visceral", "swin_fpn_visceral",
    "detr_amos", "def_detr_amos", "retina_amos",
    "foc_dec_refine_amos", "foc_dec_seg_amos",
]


@pytest.mark.parametrize("name", CONFIGS)
def test_config_builds_and_forwards(name):
    cfg = validate_config(fill_synthetic_stats(get_config(name)))
    # Shrink the patch (divisible by 2^(num_stages-1)) to keep CPU cheap;
    # the models are resolution-agnostic.
    cfg = dict(cfg)
    cfg["augmentation"] = dict(cfg["augmentation"])
    cfg["augmentation"]["patch_size"] = [64, 64, 64]

    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 64, 1))
    params = model.init(jax.random.key(0), x)["params"]
    out = model.apply({"params": params}, x)
    if "retina" in cfg:
        assert "anchor_logits" in out
    else:
        assert out["pred_logits"].shape[1] == cfg["neck"]["num_queries"]
