"""Linear layers with the initializations used across the framework.

Capability parity targets:
- GehringLinear (fan-in normal init + weight normalization):
  /root/reference/ttl/tell/modules/linear.py:8-50 and
  /root/reference/final/transformer_v2.py:158-184.
- Plain xavier-init Linear used by the dynamic-conv weight predictor:
  /root/reference/ttl/tell/modules/convolutions/dynamic.py:17-22.

TPU notes: weight norm is a pure reparameterization w = g * v/||v||;
we compute it functionally at apply time (one rsqrt + scale, fused by
XLA into the matmul's producer). No in-place reparam hooks needed.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def fold_weight_norm(v: jax.Array, g: jax.Array,
                     dtype=None) -> jax.Array:
    """w = v * g / max(||v||_col, 1e-12) — the single definition of
    the weight-norm fold, shared by GehringLinear.effective_kernel
    and the fused decode kernels (decoder_flattened.py)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=0, keepdims=True))
    kernel = v * (g[None, :] / jnp.maximum(norm, 1e-12))
    return kernel if dtype is None else kernel.astype(dtype)


def gehring_normal(dropout: float = 0.0):
    """Fan-in scaled normal init: std = sqrt((1 - dropout) / fan_in).

    Weights are stored as (in_features, out_features); fan-in is axis 0.
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        std = math.sqrt((1.0 - dropout) / fan_in)
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)

    return init


class GehringLinear(nn.Module):
    """Linear with Gehring init and (optional) weight normalization.

    Weight normalization decouples magnitude and direction:
    ``w = g * v / ||v||`` with the norm taken per *output* feature
    (matching torch's ``weight_norm(dim=0)`` on a (out, in) weight;
    our storage is (in, out) so the norm runs over axis 0).
    """

    features: int
    use_bias: bool = True
    weight_norm: bool = True
    dropout: float = 0.0
    param_dtype: Dtype = jnp.float32
    dtype: Optional[Dtype] = None
    # in_features is inferred lazily on first call by default; pass it
    # explicitly to enable `effective_kernel()` access before a call
    # (the fused decode kernels read weights without applying).
    in_features: Optional[int] = None

    def _declare(self, in_features: int):
        v = self.param("kernel", gehring_normal(self.dropout),
                       (in_features, self.features), self.param_dtype)
        g = None
        if self.weight_norm:
            # At torch init, g = ||v|| so the effective weight equals
            # the sampled v; g is stored to train it separately.
            g = self.param(
                "scale",
                lambda key, shape, dtype: jnp.linalg.norm(
                    v, axis=0).astype(dtype),
                (self.features,), self.param_dtype)
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
        return v, g, b

    def effective_kernel(self, in_features: Optional[int] = None):
        """(kernel [in, out], bias [out] or None) with weight norm
        applied — what the matmul actually uses."""
        nf = in_features or self.in_features
        assert nf is not None, "pass in_features for weight access"
        v, g, b = self._declare(nf)
        kernel = fold_weight_norm(v, g) if self.weight_norm else v
        return kernel, b

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # The per-output-feature weight-norm scale commutes through
        # the contraction: x @ (v * s) == (x @ v) * s. Applying it in
        # the EPILOGUE keeps the matmul kernel a plain stored
        # parameter — a computed kernel (v * s materialized first)
        # gets a compiler-chosen layout and measured ~65% MXU on the
        # train-step Gehring matmuls; the raw-v form runs like every
        # other constant-kernel matmul. effective_kernel() still
        # materializes the folded form for porters / fused readers.
        v, g, b = self._declare(x.shape[-1])
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), v.astype(dtype),
                    preferred_element_type=dtype)
        if self.weight_norm:
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=0))
            scale = g / jnp.maximum(norm, 1e-12)
            y = y * scale.astype(dtype)[None]
        if b is not None:
            y = y + b.astype(dtype)
        return y


class XavierLinear(nn.Module):
    """Linear with xavier-uniform weight init and zero bias."""

    features: int
    use_bias: bool = True
    param_dtype: Dtype = jnp.float32
    dtype: Optional[Dtype] = None
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features), self.param_dtype)
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype),
                    preferred_element_type=dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
            y = y + b.astype(dtype)
        return y
