"""Functional dropout usable from any (setup-style) flax method.

flax's nn.Dropout is a submodule and cannot be instantiated inside
non-setup methods; this helper draws from the module's 'dropout' RNG
stream directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def dropout(module: nn.Module, x: jax.Array, rate: float,
            deterministic: bool) -> jax.Array:
    if rate == 0.0 or deterministic:
        return x
    keep = 1.0 - rate
    key = module.make_rng("dropout")
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
