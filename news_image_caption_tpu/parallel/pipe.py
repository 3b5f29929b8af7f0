"""Pipeline parallelism: GPipe microbatch schedule over a mesh axis.

The reference has no pipeline parallelism (its only parallelism is
single-node DataParallel, SURVEY.md §2.10) — this is a beyond-reference
capability for scaling the deep homogeneous stacks (the 24-layer
RoBERTa encoder is 355M of the flagship's params) past one chip's HBM.

Design (TPU-first, not a port of torch.distributed.pipeline):

- The layer stack's params are STACKED along a leading layer dim and
  sharded over the `pipe` mesh axis, so each device physically holds
  only L/P layers — the actual memory win of PP, enforced by
  shard_map's in_specs rather than by a runtime.
- The schedule is the classic GPipe fill-drain loop expressed as a
  single `lax.scan` over M + P - 1 ticks under `shard_map`: each tick
  every device applies its own L/P layers to the activation it holds,
  then hands the result to the next stage with one `lax.ppermute` hop
  (neighbor ICI traffic only — the `pipe` axis is innermost in
  make_mesh for exactly this reason). Stage 0 feeds microbatch t at
  tick t; stage P-1 commits microbatch t-(P-1) at tick t.
- Warmup/drain bubble lanes compute on zeros and are masked out of the
  committed outputs, so they contribute exactly zero to both the
  result and (through AD) every parameter gradient: outputs and grads
  are IDENTICAL to running the L layers sequentially (pinned by
  tests/test_pipe.py, fp32 1e-6).
- Everything is plain JAX (`ppermute` has a transpose rule), so
  `jax.grad` of a pipelined loss runs the backward pipeline in the
  reverse direction automatically — no hand-written 1F1B runtime.

The carry is a PYTREE of per-sample arrays, so side inputs that must
travel with a microbatch (e.g. the RoBERTa pad mask) ride along:
`stage_fn` receives one layer's params and the carry, and returns the
updated carry. See `models/roberta.py::encode_pipelined` for the
production integration.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from news_image_caption_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS

Carry = Any          # pytree of [B, ...] arrays
StageFn = Callable[[Any, Carry], Carry]


def stack_layers(layer_params: Sequence[Any]) -> Any:
    """Stack per-layer param pytrees along a new leading layer dim.

    All layers must be shape-homogeneous (true for RobertaLayer /
    Gen2 decoder layers). The result is what `pipeline_apply` shards
    over the `pipe` axis.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0),
                        *layer_params)


def _tree_index(tree: Any, i) -> Any:
    return jax.tree.map(lambda x: x[i], tree)


def _pipe_local(stacked, carry_micro, *, stage_fn: StageFn,
                axis_name: str, n_micro: int):
    """Per-device body (under shard_map over `axis_name`).

    stacked: this stage's [L/P, ...] layer params.
    carry_micro: pytree of [M, mB, ...] microbatched inputs
    (replicated over the pipe axis). Returns pytree [M, mB, ...] —
    nonzero only for this stage's commit mask; caller psums.
    """
    n_stage = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    layers_here = jax.tree.leaves(stacked)[0].shape[0]

    zero_state = jax.tree.map(lambda x: jnp.zeros_like(x[0]),
                              carry_micro)
    # bool leaves (pad masks) ride the commit buffer as int8: the
    # final cross-stage replication is a psum, which needs numerics.
    def _num(dt):
        return jnp.int8 if dt == jnp.bool_ else dt
    outs0 = jax.tree.map(
        lambda x: jnp.zeros(x.shape, _num(x.dtype)), carry_micro)

    def tick(loop, t):
        state, outs = loop
        # Stage 0 feeds microbatch t (clipped during drain; the
        # recomputed tail lane is never committed).
        t_feed = jnp.clip(t, 0, n_micro - 1)
        h = jax.tree.map(
            lambda xm, s: jnp.where(idx == 0, xm[t_feed], s),
            carry_micro, state)
        for j in range(layers_here):       # static: L/P per stage
            h = stage_fn(_tree_index(stacked, j), h)
        # Stage P-1's output at tick t is microbatch t-(P-1).
        t_out = jnp.clip(t - (n_stage - 1), 0, n_micro - 1)
        committed = jax.tree.map(
            lambda o, v: jnp.where(
                t >= n_stage - 1,
                o.at[t_out].set(jnp.where(idx == n_stage - 1, v, 0)),
                o),
            outs, h)
        # Hand the activation to the next stage (one neighbor hop).
        perm = [(i, i + 1) for i in range(n_stage - 1)]
        state = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), h) \
            if perm else h
        return (state, committed), None

    (_, outs), _ = jax.lax.scan(
        tick, (zero_state, outs0),
        jnp.arange(n_micro + n_stage - 1, dtype=jnp.int32))
    # Only stage P-1 wrote real values; replicate them everywhere.
    return jax.tree.map(
        lambda o: jax.lax.psum(o, axis_name), outs)


def pipeline_apply(stage_fn: StageFn, stacked_params: Any,
                   carry: Carry, *, mesh: Mesh, n_micro: int,
                   axis_name: str = PIPE_AXIS,
                   batch_axis: Optional[str] = DATA_AXIS) -> Carry:
    """Apply L stacked layers to `carry` through a P-stage pipeline.

    stage_fn(layer_params, carry) -> carry applies ONE layer.
    stacked_params: pytree with leading layer dim L (L % P == 0);
    sharded over `axis_name` so each device holds L/P layers.
    carry: pytree of [B, ...] arrays, B % n_micro == 0. When the mesh
    also has `batch_axis` (default `data`) with size d > 1, each
    microbatch is additionally sharded over it (B/n_micro % d == 0) —
    composed DP x PP, with the pipe ppermute hops staying inside each
    data row. Other mesh axes see replicated data.
    Returns the carry after all L layers, numerically identical to the
    sequential loop. Differentiable (backward pipeline via AD).
    """
    if axis_name not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no axis "
                         f"{axis_name!r}")
    n_stage = mesh.shape[axis_name]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % n_stage:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{axis_name}={n_stage} stages")
    batch = jax.tree.leaves(carry)[0].shape[0]
    if batch % n_micro:
        raise ValueError(f"batch {batch} not divisible by "
                         f"n_micro={n_micro}")
    b = (batch_axis if batch_axis in mesh.axis_names
         and mesh.shape[batch_axis] > 1 else None)
    if b is not None and (batch // n_micro) % mesh.shape[b]:
        raise ValueError(
            f"microbatch {batch // n_micro} not divisible by "
            f"{b}={mesh.shape[b]} (batch {batch}, n_micro {n_micro})")
    carry_micro = jax.tree.map(
        lambda x: x.reshape((n_micro, batch // n_micro) + x.shape[1:]),
        carry)

    f = jax.shard_map(
        partial(_pipe_local, stage_fn=stage_fn, axis_name=axis_name,
                n_micro=n_micro),
        mesh=mesh,
        in_specs=(P(axis_name), P(None, b)),
        out_specs=P(None, b),
        check_vma=False)
    out_micro = f(stacked_params, carry_micro)
    return jax.tree.map(
        lambda x: x.reshape((batch,) + x.shape[2:]), out_micro)
