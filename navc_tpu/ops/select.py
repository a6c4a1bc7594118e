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
    """(B, L) -> (B, L) ordinal ranks (0 = first in sort order), stable ties.

    Computed by O(L^2) pairwise comparison instead of argsort: sequence
    length is <= 30, so the (B, L, L) comparison tensor is tiny, and it runs
    ~10x faster than TPU's bitonic sort networks in the refinement scan.
    rank(i) = #{j : v_j strictly-before v_i} + #{j < i : v_j ties v_i}.
    """
    v = -values if descending else values
    vi = v[:, :, None]  # candidate i
    vj = v[:, None, :]  # compared j
    before = (vj < vi).sum(-1)
    l = v.shape[-1]
    idx = jnp.arange(l)
    tie_before = ((vj == vi) & (idx[None, None, :] < idx[:, None][None])).sum(-1)
    return before + tie_before


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
