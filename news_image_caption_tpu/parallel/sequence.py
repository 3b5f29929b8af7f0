"""Sequence/context parallelism extension point.

SURVEY.md §2.10 / §5: the reference bounds sequence length by
construction (articles <= 512 BPE tokens), so sequence parallelism is
not needed for parity — but the framework exposes the extension point
so long-article variants can shard the RoBERTa encoder pass over a
`context` mesh axis.

Usage: build the mesh with a context axis and constrain article
activations; XLA then partitions the (token-parallel) encoder FLOPs
and inserts the attention all-gathers:

    mesh = make_mesh(MeshConfig(data=2, model=1, context=4))
    with mesh:
        feats = shard_article_axis(roberta_hiddens, mesh)

The self-attention inside the encoder still needs full-sequence K/V;
with a sharding constraint on the hiddens, XLA chooses between
all-gathering K/V (Ulysses-style communication) or resharding — for
S <= 512 that tradeoff is moot. When it is NOT moot (long articles),
use the real sequence-parallel path instead: `parallel/ring.py`
implements exact ring attention (K/V blocks rotating over ICI with
an online-softmax combine), wired into the encoder via
`RobertaEncoder(ring_mesh=mesh)`.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CONTEXT_AXIS = "context"


def shard_article_axis(x: jax.Array, mesh: Mesh,
                       batch_axis: Optional[str] = "data") -> jax.Array:
    """Constrain [B, S, ...] activations to shard S over `context`."""
    if CONTEXT_AXIS not in mesh.axis_names:
        return x
    spec = [batch_axis if batch_axis in mesh.axis_names else None,
            CONTEXT_AXIS] + [None] * (x.ndim - 2)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def replicate_sequence(x: jax.Array, mesh: Mesh,
                       batch_axis: Optional[str] = "data") -> jax.Array:
    """Gather the sequence axis back (before the decoder consumes it)."""
    if CONTEXT_AXIS not in mesh.axis_names:
        return x
    spec = [batch_axis if batch_axis in mesh.axis_names else None,
            None] + [None] * (x.ndim - 2)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
