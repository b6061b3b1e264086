"""On-device linear assignment (Hungarian matching) via the auction
algorithm.

The reference's DETR / Deformable-DETR branches (unmounted; see SURVEY.md
§7) match queries to ground-truth boxes with scipy
``linear_sum_assignment`` on CPU — a host round-trip every step. Detection
problems here are tiny (G <= ~20 ground-truth boxes vs Q queries), so an
epsilon-scaled forward auction runs entirely on device inside jit: each
iteration is a vectorized [G, Q] min/argmin — VPU-friendly, fixed shapes,
``lax.while_loop`` control.

Guarantees: for integer-scaled costs the auction with eps < 1/G yields an
optimal assignment; with float costs and the default eps-scaling it is
within G*eps_final of optimal, which is far below the cost noise that
matters for matching (validated against scipy in tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e9


def auction_assignment(cost, valid_rows=None, eps=None, max_iters=2000):
    """Solve min-cost assignment of rows (bidders) to columns (items).

    Args:
      cost: [G, Q] cost matrix, G <= Q.
      valid_rows: [G] bool — rows to assign (padding rows ignored).
      eps: bidding increment; default 1 / (G + 1) after cost normalization.
      max_iters: hard iteration cap (auction converges long before).

    Returns:
      col_of_row: [G] int32 — assigned column per row (-1 for invalid rows).
    """
    G, Q = cost.shape
    if valid_rows is None:
        valid_rows = jnp.ones((G,), bool)

    # Benefit maximization formulation: benefit = -cost.
    benefit = -cost.astype(jnp.float32)
    benefit = jnp.where(valid_rows[:, None], benefit, -BIG)
    scale = jnp.maximum(jnp.max(jnp.abs(jnp.where(
        valid_rows[:, None], cost, 0.0))), 1.0)
    if eps is None:
        eps = scale / (G + 1) * 0.01

    def cond(state):
        col_of_row, _, it = state
        unassigned = (col_of_row < 0) & valid_rows
        return jnp.any(unassigned) & (it < max_iters)

    def body(state):
        col_of_row, prices, it = state
        unassigned = (col_of_row < 0) & valid_rows
        # pick the first unassigned bidder (Gauss-Seidel auction)
        bidder = jnp.argmax(unassigned)

        values = benefit[bidder] - prices  # [Q]
        best = jnp.argmax(values)
        v1 = values[best]
        values2 = values.at[best].set(-jnp.inf)
        v2 = jnp.max(values2)

        bid = prices[best] + (v1 - v2) + eps
        prices = prices.at[best].set(bid)

        # evict current owner of `best`, if any
        owner_mask = col_of_row == best
        col_of_row = jnp.where(owner_mask, -1, col_of_row)
        col_of_row = col_of_row.at[bidder].set(best)
        return col_of_row, prices, it + 1

    init = (jnp.full((G,), -1, jnp.int32), jnp.zeros((Q,), jnp.float32),
            jnp.asarray(0))
    col_of_row, _, _ = jax.lax.while_loop(cond, body, init)
    return jnp.where(valid_rows, col_of_row, -1)


def hungarian_match(cost, valid_rows=None):
    """Batched assignment: cost [B, G, Q] -> [B, G] column indices."""
    if cost.ndim == 2:
        return auction_assignment(cost, valid_rows)
    return jax.vmap(auction_assignment)(
        cost, valid_rows if valid_rows is not None
        else jnp.ones(cost.shape[:2], bool))
