"""Vectorized per-row selection ops for the NAR refinement loop.

The reference's ``select_worst`` / ``select_most_confidence`` iterate over the
batch on the host with per-row ``topk`` (decoding/algorithms.py:206-215,
369-379). On TPU these become fully batched ordinal-rank computations with
static shapes, so the whole refinement loop stays on-device inside a
``lax.scan``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _ordinal_ranks(values: jnp.ndarray, descending: bool = False) -> jnp.ndarray:
    """(B, L) -> (B, L) ordinal ranks (0 = first in sort order), stable ties."""
    order = jnp.argsort(-values if descending else values, axis=-1, stable=True)
    ranks = jnp.zeros_like(order)
    b, l = values.shape
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, l))
    ranks = ranks.at[rows, order].set(jnp.broadcast_to(jnp.arange(l)[None, :], (b, l)))
    return ranks


def rank_mask_smallest(values: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """True at the k[i] smallest entries of each row (ties broken stably).

    Equivalent to the reference ``select_worst`` semantics
    (decoding/algorithms.py:206-215) where k is already >= 1:
    ``topk(largest=False)`` picks exactly k entries.
    """
    ranks = _ordinal_ranks(values, descending=False)
    return ranks < k[:, None]


def rank_mask_largest(values: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """True at the k[i] largest entries of each row (ties broken stably)."""
    ranks = _ordinal_ranks(values, descending=True)
    return ranks < k[:, None]
