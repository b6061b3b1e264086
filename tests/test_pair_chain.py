"""Paired-depth encoder chain must be numerically transparent: the same
parameters produce the same outputs and gradients with ``pair_chain`` on or
off (the chain only changes the depth-axis LAYOUT between encoder stages —
PERFORMANCE.md §Next targets)."""

import flax
import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_config
from transoar_tpu.models.transoarnet import build_transoarnet


def test_pair_chain_matches_unpaired(rng):
    cfg = tiny_config(num_organs=3, qpo=7)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 16, 1)).astype(np.float32))

    cfg["backbone"]["pair_chain"] = False
    m0 = build_transoarnet(cfg)
    params = m0.init(jax.random.key(0), x)["params"]
    out0 = m0.apply({"params": params}, x, deterministic=True)

    cfg["backbone"]["pair_chain"] = True
    m1 = build_transoarnet(cfg)
    params1 = m1.init(jax.random.key(0), x)["params"]
    shapes0 = flax.traverse_util.flatten_dict(jax.tree.map(np.shape, params))
    shapes1 = flax.traverse_util.flatten_dict(jax.tree.map(np.shape, params1))
    assert shapes0 == shapes1  # same tree -> checkpoints interchangeable

    out1 = m1.apply({"params": params}, x, deterministic=True)
    for key in ("pred_logits", "pred_boxes"):
        np.testing.assert_allclose(np.asarray(out0[key]),
                                   np.asarray(out1[key]), atol=2e-6)

    def loss(p, model):
        out = model.apply({"params": p}, x, deterministic=True)
        return jnp.sum(out["pred_logits"].astype(jnp.float32) ** 2)

    g0 = flax.traverse_util.flatten_dict(jax.grad(loss)(params, m0))
    g1 = flax.traverse_util.flatten_dict(jax.grad(loss)(params, m1))
    for key in g0:
        np.testing.assert_allclose(np.asarray(g0[key]), np.asarray(g1[key]),
                                   atol=5e-5, err_msg="/".join(key))
