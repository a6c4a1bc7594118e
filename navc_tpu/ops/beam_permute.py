"""Pallas beam-ancestry permute for the AR beam-search KV caches.

Each beam step reorders the per-beam K/V caches along beam ancestry
(reference models/Translator.py:120-127 ``update_state``; here
decoding/beam.py step()).  XLA lowers the ``take_along_axis`` over the
size-k beam axis as a select_n chain plus a gather — profiled at
~3.9 ms/step at B=1024·k=5 (three passes over the 315 MB caches,
~1.26 GB of HBM traffic per step), which made the shuffle the single
most expensive op of the whole decode.

This kernel does the permute as ONE pass: a block-diagonal one-hot
matmul on the MXU.  Rows are grouped 16 instances × k beams per block
(80 sublanes at k=5 — a whole number of bf16 (16, 128) tiles), the
(R, R) selection matrix is built in-register from the prefetched
ancestor indices, and both caches are permuted in the same kernel
invocation.  Selection by {0,1}-valued matmul is exact in bf16 and
f32: every output element is one product ``1.0 * x`` plus zeros, which
the f32 accumulator holds exactly (same argument as the qsub kernel's
one-hot query gather, ops/fused_layer.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# instances per block; R = _GROUP * k rows (multiple of 16). Larger groups
# mean fewer, bigger grid blocks in beam_attend_step (better DMA utilization,
# less per-block fixed cost) at the price of a bigger one-hot permute matmul
# (R x R) and more VMEM; env-tunable for on-device sweeps.
_GROUP = int(__import__("os").environ.get("NAVC_BEAM_GROUP", "16"))


def _pick_tm(m: int, r: int, itemsize: int) -> int:
    """Largest lane-tile width that divides m and keeps blocks in VMEM."""
    budget = 6 * 1024 * 1024  # 4 cache blocks + slack
    for tm in (4096, 3840, 2048, 1920, 1536, 1280, 1024, 768, 640, 512,
               384, 256, 128):
        if m % tm == 0 and 4 * r * tm * itemsize <= budget:
            return tm
    return 0


def _kernel(idx_ref, kc_ref, vc_ref, okc_ref, ovc_ref, *, rows: int):
    local = idx_ref[:]  # (R, 1) int32: block-local source row per output row
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    p = (col == local).astype(kc_ref.dtype)
    # f32 payloads need HIGHEST: the TPU default matmul pass truncates f32
    # operands to bf16, breaking the exact-selection argument; bf16x6
    # reconstructs 1.0 * x exactly (bf16 payloads are exact in one pass)
    prec = (jax.lax.Precision.HIGHEST if kc_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    okc_ref[:] = jnp.dot(p, kc_ref[:], precision=prec,
                         preferred_element_type=jnp.float32
                         ).astype(okc_ref.dtype)
    ovc_ref[:] = jnp.dot(p, vc_ref[:], precision=prec,
                         preferred_element_type=jnp.float32
                         ).astype(ovc_ref.dtype)


def beam_permute_eligible(b: int, k: int, m: int, itemsize: int) -> bool:
    """Shapes the kernel covers; callers fall back to take_along_axis."""
    r = _GROUP * k
    return b % _GROUP == 0 and m % 128 == 0 and _pick_tm(m, r, itemsize) > 0


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def permute_beam_caches(kc: jnp.ndarray, vc: jnp.ndarray,
                        prev_k: jnp.ndarray, k: int,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(kc, vc)[i*k + prev_k[i, j]] -> row i*k + j, in one fused pass.

    kc, vc: (b*k, ...) caches, identical trailing shape; prev_k: (b, k)
    int32 ancestor beam slots. Trailing dims must flatten to a multiple
    of 128 elements and b must be a multiple of 16 (beam_permute_eligible).
    """
    n = kc.shape[0]
    b = n // k
    m = 1
    for d in kc.shape[1:]:
        m *= d
    r = _GROUP * k
    tm = _pick_tm(m, r, kc.dtype.itemsize)
    assert tm > 0 and b % _GROUP == 0, (b, k, m)

    kc2 = kc.reshape(n, m)
    vc2 = vc.reshape(n, m)
    # absolute source row of output row nrow = (nrow//k)*k + prev_k; block
    # starts are multiples of R, so block-local index = src % R
    src = ((jnp.arange(n, dtype=jnp.int32) // k) * k
           + prev_k.astype(jnp.int32).reshape(n))
    local = (src % r).reshape(n, 1)

    grid = (n // r, m // tm)
    okc, ovc = pl.pallas_call(
        functools.partial(_kernel, rows=r),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, tm), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, tm), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((r, tm), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, tm), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, m), kc.dtype),
            jax.ShapeDtypeStruct((n, m), vc.dtype),
        ],
        name="beam_permute",
        interpret=interpret,
    )(local, kc2, vc2)
    return okc.reshape(kc.shape), ovc.reshape(vc.shape)
