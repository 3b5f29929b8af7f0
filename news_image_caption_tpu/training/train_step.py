"""Sharded train/eval steps over an explicit device mesh.

The train step is one jit-compiled program: forward, backward,
optimizer update. Sharding follows the "computation follows data"
pattern: parameters are placed with `shard_params` (model axis),
batches with `batch_shardings` (data axis), and jit propagates — XLA
inserts the gradient psum over ICI, the TPU-native replacement for
NCCL DataParallel (SURVEY.md §2.10). Optimizer moments inherit the
parameter shardings automatically via `tx.init` on sharded params.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from news_image_caption_tpu.parallel.partition import (
    batch_shardings, shard_params)


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def create_train_state(params, tx: optax.GradientTransformation,
                       mesh: Optional[Mesh] = None) -> TrainState:
    """Build (optionally sharded) train state. With a mesh, params are
    placed per the partition rules and optimizer moments inherit."""
    if mesh is not None:
        params = shard_params(params, mesh)
    return TrainState(step=jnp.zeros([], jnp.int32), params=params,
                      opt_state=tx.init(params))


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh):
    return jax.tree.map(jax.device_put, batch, batch_shardings(batch, mesh))


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def create_o2_train_state(params, tx: optax.GradientTransformation,
                          mesh: Optional[Mesh] = None,
                          compute_dtype: Any = jnp.bfloat16
                          ) -> TrainState:
    """apex-O2-true storage: state.params are the STORED low-precision
    weights; the fp32 master copy lives in the optimizer state
    (reference: callback_apex_trainer.py:121-125 keeps fp16 model
    weights + fp32 master params). Halves the weight stream of every
    forward/backward; the optimizer updates the master and re-emits
    the bf16 params each step. Use with
    make_train_step(..., o2_master=True)."""
    master = _cast_floats(params, jnp.float32)
    if mesh is not None:
        master = shard_params(master, mesh)
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=_cast_floats(master, compute_dtype),
        opt_state={"master": master, "inner": tx.init(master)})


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    donate: bool = True,
                    guard_nonfinite: bool = True,
                    compute_dtype: Optional[Any] = None,
                    o2_master: bool = False) -> Callable:
    """loss_fn(params, batch, dropout_rng) -> (loss, aux).
    Returns jitted step(state, batch, rng) -> (state, metrics).

    guard_nonfinite reproduces the reference's NaN-batch skip
    (callback_apex_trainer.py:225-227) INSIDE the jitted step: when
    the loss is not finite, parameters and optimizer state keep their
    previous values (the reference skips before optimizer.step();
    applying the guard post-update is equivalent and avoids a host
    round trip). metrics["skipped"] reports it.

    compute_dtype=jnp.bfloat16 gives apex-O2-style mixed precision
    (callback_apex_trainer.py:121-125,229-233) the TPU way: master
    params and optimizer moments stay fp32; the forward/backward runs
    with bf16 params and activations (softmaxes/losses stay fp32
    internally); gradients come back fp32 through the cast transpose.
    No loss scaling — bf16 has fp32's exponent range.

    o2_master=True additionally makes the STORAGE O2-true: the state
    built by `create_o2_train_state` keeps bf16 stored params (half
    the fwd/bwd weight stream) and the fp32 master inside the
    optimizer state; gradients reach the optimizer in fp32.
    """

    def _finish(state, loss, aux, grads, _update):
        """Shared guard/skip/metrics tail of both step variants.

        A skipped batch must leave params AND optimizer state
        untouched (reference: callback_apex_trainer.py:225-227).
        lax.cond — not jnp.where over every buffer — so the COMMON
        (finite) path pays nothing: a per-leaf select streams
        old+new+out for ~1.5 GB of state (measured ~7 ms/step at
        B=64, train_profile.py r03). The guard checks the GRADIENT
        norm as well as the loss: a finite loss with NaN/Inf grads
        (masked-where backward, bf16 overflow) would otherwise
        poison the params permanently — every later step skips and
        the run silently stalls. grad_norm is already computed for
        metrics, so the extra check is free (the reference's apex
        loss scaler also skips on gradient overflow).
        """
        grad_norm = optax.global_norm(grads)
        if guard_nonfinite:
            good = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
            params, opt_state = jax.lax.cond(
                good, _update,
                lambda op: (op[1], op[2]),
                (grads, state.params, state.opt_state))
            skipped = (~good).astype(jnp.int32)
        else:
            params, opt_state = _update(
                (grads, state.params, state.opt_state))
            skipped = jnp.zeros((), jnp.int32)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        metrics = {"loss": loss, "grad_norm": grad_norm,
                   "skipped": skipped, **aux}
        return new_state, metrics

    def o2_train_step(state: TrainState, batch: Dict[str, jax.Array],
                      rng: jax.Array):
        dropout_rng = jax.random.fold_in(rng, state.step)
        cdtype = compute_dtype or jnp.bfloat16

        def _loss(params):
            return loss_fn(params, _cast_floats(batch, cdtype),
                           dropout_rng)

        (loss, aux), grads = jax.value_and_grad(_loss, has_aux=True)(
            state.params)
        grads = _cast_floats(grads, jnp.float32)

        def _update(operand):
            grads, params_old, opt_old = operand
            master = opt_old["master"]
            updates, inner = tx.update(grads, opt_old["inner"], master)
            master = optax.apply_updates(master, updates)
            return (_cast_floats(master, cdtype),
                    {"master": master, "inner": inner})

        return _finish(state, loss, aux, grads, _update)

    if o2_master:
        return jax.jit(o2_train_step,
                       donate_argnums=(0,) if donate else ())

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def _loss(params):
            if compute_dtype is not None:
                return loss_fn(_cast_floats(params, compute_dtype),
                               _cast_floats(batch, compute_dtype),
                               dropout_rng)
            return loss_fn(params, batch, dropout_rng)

        (loss, aux), grads = jax.value_and_grad(_loss, has_aux=True)(
            state.params)

        def _update(operand):
            grads, params_old, opt_old = operand
            updates, opt_state = tx.update(grads, opt_old, params_old)
            return optax.apply_updates(params_old, updates), opt_state

        return _finish(state, loss, aux, grads, _update)

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(loss_fn: Callable,
                   compute_dtype: Optional[Any] = None) -> Callable:
    """Validation step. compute_dtype mirrors the train step's mixed
    precision so early stopping / best-checkpoint selection evaluates
    under the SAME numeric policy as training (the apex-O2 reference
    validates the fp16 model). With o2-true storage the params are
    already the stored compute dtype; the cast is then a no-op."""

    def eval_step(params, batch):
        if compute_dtype is not None:
            params = _cast_floats(params, compute_dtype)
            batch = _cast_floats(batch, compute_dtype)
        loss, aux = loss_fn(params, batch, None)
        return {"loss": loss, **aux}

    return jax.jit(eval_step)
