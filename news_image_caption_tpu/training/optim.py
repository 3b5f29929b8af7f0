"""Optimizers and LR schedules matching the reference's three trainers.

Capability parity targets:
- bert_adam warmup_linear (Gen-3):
  /root/reference/ttl/expt/goodnews/5_transformer_roberta/config.yaml:118-135
  (Adam b1=0.9 b2=0.98 eps=1e-6, decoupled weight decay, per-update
  grad-norm clip 0.1, lr ramp x/warmup then linear decay 1-x)
- Noam (Gen-2): /root/reference/final/custom_v3.py:401-410
  (d_model^-0.5 * min(step^-0.5, step * warmup^-1.5), Adam lr=1)
- Gen-1 step decay + grad value clamp:
  /root/reference/train.py:106-118, misc/utils.py:180-184

apex FusedAdam's fusion is replaced by XLA: the whole optax update is
one fused program on TPU; no loss scaling is needed for bf16.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def warmup_linear_schedule(lr: float, t_total: int, warmup: float = 0.05):
    """pytorch-pretrained-bert `warmup_linear`: x/warmup then 1-x."""

    def schedule(step):
        x = jnp.minimum(step / t_total, 1.0)
        mult = jnp.where(x < warmup, x / warmup, 1.0 - x)
        return lr * jnp.maximum(mult, 0.0)

    return schedule


def noam_schedule(model_size: int, factor: float = 1.0, warmup: int = 30000):
    """Annotated-Transformer rate(): lr for step (1-indexed)."""

    def schedule(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return factor * (model_size ** -0.5) * jnp.minimum(
            s ** -0.5, s * (warmup ** -1.5))

    return schedule


def step_decay_schedule(lr: float, decay_start: int, decay_every: int,
                        decay_rate: float = 0.8):
    """Gen-1 epoch-based LR decay (train.py:106-113), in steps.

    decay_start < 0 DISABLES decay entirely — the reference gates on
    `epoch > start and start >= 0` (train.py:108) and opts.py:77-78
    documents -1 as "don't decay"."""
    if decay_start < 0:
        return lambda step: jnp.asarray(lr, jnp.float32)

    def schedule(step):
        frac = jnp.maximum(step - decay_start, 0) // jnp.maximum(
            decay_every, 1)
        return lr * (decay_rate ** frac)

    return schedule


def bert_adam(lr_schedule, b1: float = 0.9, b2: float = 0.98,
              eps: float = 1e-6, weight_decay: float = 1e-5,
              max_grad_norm: Optional[float] = 0.1,
              moment_dtype=None) -> optax.GradientTransformation:
    """BertAdam-style chain: clip -> adam(no bias corr) -> decoupled wd.

    Note: the original BertAdam does NOT use bias correction (optax's
    scale_by_adam does), so the Adam stage here is
    `_scale_by_adam_no_bias_correction` — raw EMA moments, matching
    pytorch-pretrained-bert's optimization.py exactly.

    moment_dtype=jnp.bfloat16 (opt-in) STORES the first moment in
    bf16 (EMA updates still compute in fp32): on the 112M-param
    flagship the moment streams are the Adam update's whole cost
    (~8 ms/step at the measured HBM floor, BASELINE.md), and mu
    tolerates bf16's 8 mantissa bits (it only steers the update
    direction). nu stays fp32 — sqrt(nu)+eps is precision-sensitive
    near zero.
    """
    txs = []
    if max_grad_norm is not None:
        # BertAdam clips EACH parameter tensor's grad norm to
        # max_grad_norm independently (clip_grad_norm_(p, ...) inside
        # the per-parameter loop) — NOT the global norm; the global
        # form would rescale the whole gradient nearly every step at
        # 0.1 while the reference leaves most tensors untouched.
        txs.append(clip_by_per_tensor_norm(max_grad_norm))
    txs.append(_scale_by_adam_no_bias_correction(
        b1, b2, eps, mu_dtype=moment_dtype))
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*txs)


def mask_frozen(tx: optax.GradientTransformation,
                frozen_collections) -> optax.GradientTransformation:
    """Exclude frozen top-level variable collections from `tx`.

    The reference freezes encoders by dropping their params from the
    optimizer entirely (`no_grad: ^resnet ^roberta` ->
    requires_grad=False -> AllenNLP never hands them to BertAdam).
    stop_gradient alone does NOT reproduce that: zero-grad params
    still receive decoupled weight decay (`add_decayed_weights` in
    bert_adam) — a silent per-step shrink of the frozen encoders —
    and still allocate Adam moments (8 bytes/param of pure waste for
    a 415M-param frozen ResNet+RoBERTa). optax.masked applies `tx`
    only to the trainable collections; frozen leaves' (zero) updates
    pass through untouched and hold no optimizer state.

    `frozen_collections`: top-level keys of the model's variables
    dict (e.g. Gen3Pipeline.frozen_collections).
    """
    fset = frozenset(frozen_collections)

    def mask(params):
        return {k: jax.tree.map(lambda _: k not in fset, v)
                for k, v in params.items()}

    return optax.masked(tx, mask)


def clip_by_per_tensor_norm(max_norm: float
                            ) -> optax.GradientTransformation:
    """Clip each LEAF's gradient to `max_norm` by its own L2 norm
    (BertAdam's per-parameter clip_grad_norm_, pytorch-pretrained-
    bert optimization.py — distinct from optax.clip_by_global_norm)."""

    def update_fn(updates, state, params=None):
        del params

        def c(g):
            n = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-12))
            return g * scale.astype(g.dtype)

        return jax.tree.map(c, updates), state

    return optax.GradientTransformation(
        lambda params: optax.EmptyState(), update_fn)


def _scale_by_adam_no_bias_correction(b1, b2, eps, mu_dtype=None):
    """Adam moments without bias correction (BertAdam semantics).

    mu_dtype: storage dtype for the first moment (None = same as the
    params, i.e. fp32 masters). The EMA update computes in the grad
    dtype (fp32) and rounds once on store."""

    def init_fn(params):
        # mu and nu must be distinct buffers (donation requires it).
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(
                lambda p: jnp.zeros_like(
                    p, dtype=mu_dtype or p.dtype), params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(
            lambda g, m: (b1 * m.astype(g.dtype)
                          + (1 - b1) * g).astype(m.dtype),
            updates, state.mu)
        nu = jax.tree.map(lambda g, v: b2 * v + (1 - b2) * g * g,
                          updates, state.nu)
        new_updates = jax.tree.map(
            lambda m, v: m.astype(v.dtype) / (jnp.sqrt(v) + eps),
            mu, nu)
        return new_updates, optax.ScaleByAdamState(
            count=state.count + 1, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_bert_adam(lr: float, t_total: int, warmup: float = 0.05,
                   **kw) -> optax.GradientTransformation:
    return bert_adam(warmup_linear_schedule(lr, t_total, warmup), **kw)


def accumulate_gradients(tx: optax.GradientTransformation,
                         every: int) -> optax.GradientTransformation:
    """Gradient accumulation: average grads over `every` micro-batches
    and apply the wrapped optimizer once per window (params receive
    zero updates in between). Trains reference-scale effective
    batches on a single chip: every=4 at micro-batch 64 reproduces
    the batch-256 gradient exactly (grad of a batch = mean of its
    micro-batch grads; clipping/Adam then see the averaged grad).
    The accumulator adds one fp32 grad-sized buffer to the opt state.
    """
    if every <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=every)


def noam_adam(model_size: int, factor: float = 1.0, warmup: int = 30000,
              b1: float = 0.9, b2: float = 0.98, eps: float = 1e-9
              ) -> optax.GradientTransformation:
    """Gen-2 optimizer: Adam(lr=1, Noam lambda schedule)."""
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(
            noam_schedule(model_size, factor, warmup)))


def gen1_adam(lr: float, decay_start: int, decay_every: int,
              decay_rate: float = 0.8, grad_clip_value: float = 5.0,
              b1: float = 0.8, b2: float = 0.999, eps: float = 1e-8
              ) -> optax.GradientTransformation:
    """Gen-1 trainer: per-element grad clamp + Adam + step decay.

    grad_clip_value default matches the reference's opt.grad_clip
    default of 5.0 (opts.py:59; clamp at misc/utils.py:180-184)."""
    return optax.chain(
        optax.clip(grad_clip_value),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(
            step_decay_schedule(lr, decay_start, decay_every, decay_rate)))
