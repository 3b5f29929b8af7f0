"""Dynamic and lightweight depthwise convolutions (Wu et al. 2019).

Capability parity targets:
- DynamicConv1dTBC: /root/reference/ttl/tell/modules/convolutions/dynamic.py:25-361
  (per-timestep predicted depthwise kernels, softmax-normalized,
  causal left padding K-1, ring-buffer incremental state)
- LightweightConv1dTBC: /root/reference/ttl/tell/modules/convolutions/lightweight.py:18-240
  (shared learned kernels, same machinery)

TPU-first design:
- batch-first [B, T, C];
- full-sequence forward uses either a K-term shift-accumulate
  (VPU, O(K*T*C), zero memory blowup — `method='shift'`) or a banded
  matmul (MXU, `method='band'`); both are mathematically identical to
  the reference's unfold/band forms.
- incremental decoding keeps a fixed-shape [B, K-1, C] history as part
  of the decode-state pytree (the reference's dict ring buffer,
  dynamic.py:95-99, made explicit & static-shaped). A zero-initialized
  history reproduces the reference's weight-truncation behavior for
  t < K because truncated kernel taps simply multiply zeros.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from news_image_caption_tpu.ops.dropout import dropout

from news_image_caption_tpu.ops.linear import XavierLinear

Dtype = Any


def _shift_accumulate(x: jax.Array, w: jax.Array, K: int) -> jax.Array:
    """out[b,t,h,r] = sum_k w[b,t,h,k] * x[b, t-K+1+k, h, r] (zeros off edge).

    x: [B, T, H, R]; w: [B, T, H, K]. Returns [B, T, H, R].
    """
    B, T, H, R = x.shape
    x_pad = jnp.pad(x, ((0, 0), (K - 1, 0), (0, 0), (0, 0)))
    out = jnp.zeros_like(x)
    for k in range(K):  # static unroll, each term fuses on the VPU
        out = out + w[:, :, :, k:k + 1] * x_pad[:, k:k + T]
    return out


def _band_matmul(x: jax.Array, w: jax.Array, K: int) -> jax.Array:
    """Band-matrix form: expand w into [B,H,T,T] band and matmul on MXU."""
    B, T, H, R = x.shape
    # band[b,h,t,s] = w[b,t,h, s-t+K-1] for t-K+1 <= s <= t else 0
    t_idx = jnp.arange(T)[:, None]
    s_idx = jnp.arange(T)[None, :]
    offset = s_idx - t_idx + (K - 1)  # [T, T]
    in_band = (offset >= 0) & (offset <= K - 1)
    offset_c = jnp.clip(offset, 0, K - 1)
    # w: [B, T, H, K] -> gather along K by offset -> [B, H, T, T]
    w_bhtk = jnp.transpose(w, (0, 2, 1, 3))  # [B, H, T, K]
    band = jnp.take_along_axis(
        w_bhtk, jnp.broadcast_to(offset_c[None, None], (B, H, T, T)),
        axis=3)  # [B, H, T, T]
    band = jnp.where(in_band[None, None], band, 0.0)
    x_bhtr = jnp.transpose(x, (0, 2, 1, 3))  # [B, H, T, R]
    out = jnp.einsum("bhts,bhsr->bhtr", band, x_bhtr,
                     preferred_element_type=x.dtype)
    return jnp.transpose(out, (0, 2, 1, 3))


class DynamicConv(nn.Module):
    """Depthwise conv whose kernel is predicted per (timestep, head)."""

    input_size: int
    kernel_size: int
    num_heads: int
    weight_softmax: bool = True
    weight_dropout: float = 0.0
    use_bias: bool = False       # bias of the weight-predicting linear
    conv_bias: bool = False
    method: str = "shift"        # 'shift' (VPU) or 'band' (MXU)
    param_dtype: Dtype = jnp.float32

    def setup(self):
        assert self.input_size % self.num_heads == 0
        self.weight_linear = XavierLinear(
            self.num_heads * self.kernel_size, use_bias=self.use_bias,
            param_dtype=self.param_dtype, name="weight_linear")
        if self.conv_bias:
            self.conv_bias_param = self.param(
                "conv_bias", nn.initializers.zeros, (self.input_size,),
                self.param_dtype)

    def _weights(self, query: jax.Array, deterministic: bool) -> jax.Array:
        """Predict per-position kernels [..., H, K], softmaxed + dropped."""
        H, K = self.num_heads, self.kernel_size
        w = self.weight_linear(query)
        w = w.reshape(query.shape[:-1] + (H, K))
        if self.weight_softmax:
            w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(w.dtype)
        if self.weight_dropout > 0.0 and not deterministic:
            w = dropout(self, w, self.weight_dropout, deterministic=False)
        return w

    def __call__(self, x: jax.Array, query: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """Full-sequence causal forward. x: [B, T, C] -> [B, T, C].

        method: 'shift' (XLA fused shift-accumulate; default — XLA
        fuses this to the same speed as the hand-written kernel,
        benchmarks/pallas_bench.py), 'pallas' (explicit halo-DMA VMEM
        kernel, TPU only, T % 128 == 0), 'band' (MXU band matmul —
        measured much slower at K=31, kept for reference).
        """
        B, T, C = x.shape
        H, K = self.num_heads, self.kernel_size
        R = C // H
        w = self._weights(x if query is None else query, deterministic)
        if self.method == "pallas" and T % 128 == 0:
            from news_image_caption_tpu.ops.pallas_kernels import \
                dynamic_conv_pallas
            out = dynamic_conv_pallas(x, w, num_heads=H)
        else:
            xh = x.reshape(B, T, H, R)
            if self.method == "band" and T >= K:
                out = _band_matmul(xh, w, K)
            else:
                out = _shift_accumulate(xh, w, K)
            out = out.reshape(B, T, C)
        if self.conv_bias:
            out = out + self.conv_bias_param.astype(out.dtype)
        return out

    def init_cache(self, batch_size: int, dtype=jnp.float32) -> jax.Array:
        """Zero history buffer [B, K-1, C] for incremental decoding."""
        return jnp.zeros(
            (batch_size, self.kernel_size - 1, self.input_size), dtype)

    def step(self, x_t: jax.Array, cache: jax.Array,
             deterministic: bool = True):
        """Single decode step.

        x_t: [B, C] current input; cache: [B, K-1, C] previous inputs
        (oldest first). Returns (out [B, C], new_cache).
        """
        B, C = x_t.shape
        H, K = self.num_heads, self.kernel_size
        R = C // H
        w = self._weights(x_t, deterministic)          # [B, H, K]
        hist = jnp.concatenate([cache, x_t[:, None, :]], axis=1)  # [B,K,C]
        hh = hist.reshape(B, K, H, R)
        out = jnp.einsum("bhk,bkhr->bhr", w, hh).reshape(B, C)
        if self.conv_bias:
            out = out + self.conv_bias_param.astype(out.dtype)
        return out, hist[:, 1:, :]

    def chunk(self, x_c: jax.Array, cache: jax.Array,
              deterministic: bool = True) -> jax.Array:
        """Multi-token decode: k sequential `step`s in one causal pass.

        x_c: [B, k, C] chunk inputs; cache: [B, K-1, C] previous
        inputs (oldest first, zero-filled before the sequence start —
        same truncation semantics as `step`). Returns out [B, k, C],
        identical to feeding the chunk token-by-token through `step`.

        The cache is NOT advanced here: speculative decoding commits a
        data-dependent PREFIX of the chunk after verification
        (generation/speculative.py::commit_conv_caches), so the caller
        owns the cache update.
        """
        B, k, C = x_c.shape
        H, K = self.num_heads, self.kernel_size
        R = C // H
        w = self._weights(x_c, deterministic)          # [B, k, H, K]
        full = jnp.concatenate([cache, x_c], axis=1)   # [B, K-1+k, C]
        fh = full.reshape(B, K - 1 + k, H, R)
        # out[b,t] = sum_j w[b,t,:,j] * full[b, t+j]  (tap j of the
        # causal window ending at chunk position t) — the same
        # shift-accumulate as __call__, with real left context in
        # place of zero padding. Accumulate in fp32 like `step`'s
        # einsum (MXU fp32 accumulation): bf16 products are exactly
        # representable in fp32, so the chunk trunk matches the
        # single-step trunk instead of drifting by K-1 bf16
        # rounding steps (the speculative-decode exactness contract).
        out = jnp.zeros((B, k, H, R), jnp.float32)
        for j in range(K):  # static unroll, fuses on the VPU
            out = out + (w[:, :, :, j:j + 1].astype(jnp.float32)
                         * fh[:, j:j + k].astype(jnp.float32))
        out = out.astype(x_c.dtype).reshape(B, k, C)
        if self.conv_bias:
            out = out + self.conv_bias_param.astype(out.dtype)
        return out

    def step_ring(self, x_t: jax.Array, cache: jax.Array,
                  t: jax.Array | int, deterministic: bool = True):
        """Ring-buffer decode step: O(1) cache writes.

        `step` rewrites the whole [B, K-1, C] history every token
        (shifted copy). Here slot (s mod K-1) permanently holds input
        x_s; each step writes ONE row and permutes the tap WEIGHTS
        instead of the data: history input x_{t-(K-1)+k} lives in slot
        (t+k) mod (K-1), so slot j takes weight index
        (j - t) mod (K-1) (same derivation as the Pallas kernel,
        ops/pallas_decode.py). Zero-initialized slots represent
        pre-start inputs and contribute nothing (same truncation
        semantics as `step`).

        Returns (out [B, C], cache with x_t written at slot t mod K-1).
        """
        B, C = x_t.shape
        H, K = self.num_heads, self.kernel_size
        R = C // H
        Km1 = K - 1
        w = self._weights(x_t, deterministic)          # [B, H, K]
        if K == 1:
            # Pointwise conv: no history, nothing to ring.
            out = (w[:, :, 0:1].repeat(R, axis=-1).reshape(B, C)
                   * x_t)
            if self.conv_bias:
                out = out + self.conv_bias_param.astype(out.dtype)
            return out, cache
        t = jnp.asarray(t, jnp.int32)
        slots = jnp.arange(Km1, dtype=jnp.int32)
        k_for_slot = jnp.mod(slots - t, Km1)           # [K-1]
        w_hist = jnp.take(w, k_for_slot, axis=-1)      # [B, H, K-1]
        hh = cache.reshape(B, Km1, H, R)
        out = jnp.einsum("bhk,bkhr->bhr", w_hist, hh).reshape(B, C)
        out = out + w[:, :, K - 1:K].repeat(R, axis=-1).reshape(
            B, C) * x_t
        if self.conv_bias:
            out = out + self.conv_bias_param.astype(out.dtype)
        new_cache = jax.lax.dynamic_update_slice(
            cache, x_t[:, None, :], (0, jnp.mod(t, Km1), 0))
        return out, new_cache

    def step_ring_lazy(self, x_t: jax.Array, cache: jax.Array,
                       slot_map: jax.Array, t: jax.Array | int,
                       deterministic: bool = True):
        """Ring step with LAZY beam permutation: the cache stays in
        physical row order across beam reorders; `slot_map`
        [K-1, B] gives, per ring slot, the physical row holding each
        logical beam's history. Beam search composes slot_map with
        its beam-ancestry permutation each step (O(K·B) ints) instead
        of gathering the whole [B, K-1, C] history.

        Returns (out [B, C], new_cache, new_slot_map) — the new slot
        (t mod K-1) holds x_t in logical order, so its map resets to
        identity.
        """
        B, C = x_t.shape
        H, K = self.num_heads, self.kernel_size
        R = C // H
        Km1 = K - 1
        w = self._weights(x_t, deterministic)          # [B, H, K]
        if K == 1:
            out = (w[:, :, 0:1].repeat(R, axis=-1).reshape(B, C)
                   * x_t)
            if self.conv_bias:
                out = out + self.conv_bias_param.astype(out.dtype)
            return out, cache, slot_map
        t = jnp.asarray(t, jnp.int32)
        slots = jnp.arange(Km1, dtype=jnp.int32)
        k_for_slot = jnp.mod(slots - t, Km1)           # [K-1]
        w_hist = jnp.take(w, k_for_slot, axis=-1)      # [B, H, K-1]
        hist = jnp.take_along_axis(
            cache, slot_map.T[:, :, None], axis=0)     # [B, K-1, C]
        hh = hist.reshape(B, Km1, H, R)
        out = jnp.einsum("bhk,bkhr->bhr", w_hist, hh).reshape(B, C)
        out = out + w[:, :, K - 1:K].repeat(R, axis=-1).reshape(
            B, C) * x_t
        if self.conv_bias:
            out = out + self.conv_bias_param.astype(out.dtype)
        j = jnp.mod(t, Km1)
        new_cache = jax.lax.dynamic_update_slice(
            cache, x_t[:, None, :], (0, j, 0))
        new_map = jax.lax.dynamic_update_slice(
            slot_map, jnp.arange(B, dtype=slot_map.dtype)[None, :],
            (j, 0))
        return out, new_cache, new_map


class LightweightConv(nn.Module):
    """Depthwise conv with shared learned kernels per head."""

    input_size: int
    kernel_size: int
    num_heads: int
    weight_softmax: bool = True
    weight_dropout: float = 0.0
    conv_bias: bool = False
    param_dtype: Dtype = jnp.float32

    def setup(self):
        assert self.input_size % self.num_heads == 0
        self.weight = self.param(
            "weight", nn.initializers.xavier_uniform(),
            (self.num_heads, self.kernel_size), self.param_dtype)
        if self.conv_bias:
            self.conv_bias_param = self.param(
                "conv_bias", nn.initializers.zeros, (self.input_size,),
                self.param_dtype)

    def _weights(self, deterministic: bool,
                 dtype=None) -> jax.Array:
        """Softmax-normalized taps, cast to the ACTIVATION dtype —
        fp32 params would otherwise silently re-widen a bf16 conv
        output (and everything downstream of the residual chain)."""
        w = self.weight
        if self.weight_softmax:
            w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(w.dtype)
        if self.weight_dropout > 0.0 and not deterministic:
            w = dropout(self, w, self.weight_dropout, deterministic=False)
        return w if dtype is None else w.astype(dtype)

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        B, T, C = x.shape
        H, K = self.num_heads, self.kernel_size
        R = C // H
        w = self._weights(deterministic, x.dtype)      # [H, K]
        wb = jnp.broadcast_to(w[None, None], (B, T, H, K))
        out = _shift_accumulate(x.reshape(B, T, H, R), wb, K)
        out = out.reshape(B, T, C)
        if self.conv_bias:
            out = out + self.conv_bias_param.astype(out.dtype)
        return out

    def init_cache(self, batch_size: int, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros(
            (batch_size, self.kernel_size - 1, self.input_size), dtype)

    def step(self, x_t: jax.Array, cache: jax.Array,
             deterministic: bool = True):
        B, C = x_t.shape
        H, K = self.num_heads, self.kernel_size
        R = C // H
        w = self._weights(deterministic, x_t.dtype)    # [H, K]
        hist = jnp.concatenate([cache, x_t[:, None, :]], axis=1)
        hh = hist.reshape(B, K, H, R)
        out = jnp.einsum("hk,bkhr->bhr", w, hh).reshape(B, C)
        if self.conv_bias:
            out = out + self.conv_bias_param.astype(out.dtype)
        return out, hist[:, 1:, :]

    def chunk(self, x_c: jax.Array, cache: jax.Array,
              deterministic: bool = True) -> jax.Array:
        """Multi-token decode (see DynamicConv.chunk); shared kernels."""
        B, k, C = x_c.shape
        H, K = self.num_heads, self.kernel_size
        R = C // H
        w = self._weights(deterministic, x_c.dtype)    # [H, K]
        full = jnp.concatenate([cache, x_c], axis=1)   # [B, K-1+k, C]
        fh = full.reshape(B, K - 1 + k, H, R)
        # fp32 accumulation to match `step`'s einsum (see DynamicConv).
        out = jnp.zeros((B, k, H, R), jnp.float32)
        for j in range(K):
            out = out + (w[None, None, :, j, None].astype(jnp.float32)
                         * fh[:, j:j + k].astype(jnp.float32))
        out = out.astype(x_c.dtype).reshape(B, k, C)
        if self.conv_bias:
            out = out + self.conv_bias_param.astype(out.dtype)
        return out

    def step_ring(self, x_t: jax.Array, cache: jax.Array,
                  t: jax.Array | int, deterministic: bool = True):
        """Ring-buffer step (see DynamicConv.step_ring)."""
        B, C = x_t.shape
        H, K = self.num_heads, self.kernel_size
        R = C // H
        Km1 = K - 1
        w = self._weights(deterministic, x_t.dtype)    # [H, K]
        if K == 1:
            # Pointwise conv: no history, nothing to ring.
            out = jnp.repeat(w[:, 0], R) * x_t
            if self.conv_bias:
                out = out + self.conv_bias_param.astype(out.dtype)
            return out, cache
        t = jnp.asarray(t, jnp.int32)
        slots = jnp.arange(Km1, dtype=jnp.int32)
        k_for_slot = jnp.mod(slots - t, Km1)
        w_hist = jnp.take(w, k_for_slot, axis=-1)      # [H, K-1]
        hh = cache.reshape(B, Km1, H, R)
        out = jnp.einsum("hk,bkhr->bhr", w_hist, hh).reshape(B, C)
        out = out + jnp.repeat(w[:, K - 1], R) * x_t
        if self.conv_bias:
            out = out + self.conv_bias_param.astype(out.dtype)
        new_cache = jax.lax.dynamic_update_slice(
            cache, x_t[:, None, :], (0, jnp.mod(t, Km1), 0))
        return out, new_cache
