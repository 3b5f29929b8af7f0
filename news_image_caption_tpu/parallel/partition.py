"""Parameter/batch sharding rules (Megatron-style TP + DP batch).

Rules are regex patterns over flattened parameter paths; anything
unmatched is replicated. The TP layout follows the classic pattern:
column-parallel first matmul (output dim sharded), row-parallel second
matmul (input dim sharded) so XLA inserts a single psum per block:

- attention: q/k/v projections column-parallel (heads shard),
  out_proj row-parallel;
- FFN: fc1 column-parallel, fc2 row-parallel;
- adaptive embedding/softmax tables vocab-sharded (band rows).

XLA's sharding propagation + collective insertion replaces NCCL/apex
(SURVEY.md §2.9/§2.10).
"""

from __future__ import annotations

import re
from typing import Any, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from news_image_caption_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path regex, PartitionSpec) — first match wins.
DEFAULT_RULES: List[Tuple[str, P]] = [
    # Attention: column-parallel QKV, row-parallel output.
    (r"(q_proj|k_proj|v_proj)/kernel$", P(None, MODEL_AXIS)),
    (r"(q_proj|k_proj|v_proj)/bias$", P(MODEL_AXIS)),
    (r"out_proj/kernel$", P(MODEL_AXIS, None)),
    # FFN: column-parallel fc1, row-parallel fc2.
    (r"fc1/kernel$", P(None, MODEL_AXIS)),
    (r"fc1/(bias|scale)$", P(MODEL_AXIS)),
    (r"fc2/kernel$", P(MODEL_AXIS, None)),
    # Adaptive embedding / softmax band tables: vocab-sharded.
    (r"embed_\d+$", P(MODEL_AXIS, None)),
    (r"untied_(head|tail_\d+)$", P(None, MODEL_AXIS)),
]


def path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path: str, rules=None) -> P:
    for pattern, spec in (rules or DEFAULT_RULES):
        if re.search(pattern, path):
            return spec
    return P()


def param_shardings(params: Any, mesh: Mesh, rules=None):
    """NamedSharding pytree matching `params` via the rule table."""

    def assign(path, leaf):
        spec = spec_for_path(path_str(path), rules)
        if len(spec) > leaf.ndim:
            spec = P(*spec[: leaf.ndim])
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def batch_shardings(batch: Any, mesh: Mesh):
    """Shard every batch array along its leading (batch) dim."""
    return jax.tree.map(
        lambda _: NamedSharding(mesh, P(DATA_AXIS)), batch)


def shard_params(params: Any, mesh: Mesh, rules=None):
    """Device-put params according to the rules (use under jit too)."""
    sh = param_shardings(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, sh)
