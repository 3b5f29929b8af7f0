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

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        v = self.param("kernel", gehring_normal(self.dropout),
                       (in_features, self.features), self.param_dtype)
        if self.weight_norm:
            # At torch init, g = ||v|| so the effective weight equals the
            # sampled v; we store g explicitly to train it separately.
            g = self.param(
                "scale",
                lambda key, shape, dtype: jnp.linalg.norm(
                    v, axis=0).astype(dtype),
                (self.features,), self.param_dtype)
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=0, keepdims=True))
            kernel = v * (g[None, :] / jnp.maximum(norm, 1e-12))
        else:
            kernel = v
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype),
                    preferred_element_type=dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
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
