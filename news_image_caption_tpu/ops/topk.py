"""Exact tournament top-k for wide rows on TPU.

`lax.top_k` over vocab-wide rows is the dominant selection cost of
decode on TPU (~1.2-1.4 ms/step at beam width 320 over 50k columns,
benchmarks/topk_bench.py): XLA's TopK lowering is far off memory
roofline. This module computes an EXACT top-k in two cheap stages:

1. group-max: reshape [N, V] -> [N, G, W] (W = 128 lanes) and take the
   per-group max — one roofline-bound reduce pass;
2. top-k over the [N, G] group maxes (G = V/128, ~400 wide — cheap),
   gather those k groups' lanes ([N, k, W], k*128 elements per row),
   and take the final top-k over the gathered k*W columns.

Exactness: let v_j be the j-th largest element (j <= k). If v_j's
group were not among the top-k groups by max, then >= k groups would
have max > v_j, i.e. >= k elements exceed v_j — contradicting j <= k.
So every top-k element lives in a top-k group, and stage 2's search
space contains the exact answer.

Used by AdaptiveSoftmax.topk_log_prob (decode selection); parity
target: bit-identical VALUES to `lax.top_k` always; indices identical
except when a tie crosses the k-th boundary (see `exact_topk`'s
docstring for the tie rule).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LANES = 128


def exact_topk(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact (values, indices) top-k along the last axis of [N, V].

    Matches `jax.lax.top_k` VALUES exactly. Indices match whenever the
    selected values are distinct (the generic case for log-probs);
    when a tie crosses the k-th boundary, which of the equal columns
    is reported may differ from lax.top_k's lowest-index rule (the tie
    set can span more groups than stage 2 gathers).
    """
    N, V = x.shape
    W = _LANES
    G = -(-V // W)
    # Fall back when the two-stage search can't hold k winners: stage 2
    # runs lax.top_k over the G group maxes (needs k <= G), and the
    # exactness argument also requires k <= G (k groups must be able to
    # cover the k winners).
    if V <= 4 * W or k > V // 8 or k > G:
        return jax.lax.top_k(x, k)
    pad = G * W - V
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)),
                    constant_values=-jnp.inf)
    xg = x.reshape(N, G, W)
    gmax = jnp.max(xg, axis=-1)                      # [N, G]
    _, gi = jax.lax.top_k(gmax, k)                   # [N, k]
    cand = jnp.take_along_axis(xg, gi[:, :, None], axis=1)  # [N,k,W]
    v, ci = jax.lax.top_k(cand.reshape(N, k * W), k)  # over k*128
    grp = jnp.take_along_axis(gi, ci // W, axis=1)
    idx = grp * W + ci % W
    # Tie-breaking vs lax.top_k: for equal values, lax.top_k returns
    # the LOWEST column index. Two equal values in different groups
    # may be gathered in either order here. Restore the contract by
    # sorting the k winners by index (stable) then by value (stable
    # descending) — equal values end up index-ascending.
    by_idx = jnp.argsort(idx, axis=-1, stable=True)
    v2 = jnp.take_along_axis(v, by_idx, axis=-1)
    i2 = jnp.take_along_axis(idx, by_idx, axis=-1)
    by_val = jnp.argsort(-v2, axis=-1, stable=True)
    return (jnp.take_along_axis(v2, by_val, axis=-1),
            jnp.take_along_axis(i2, by_val, axis=-1))
