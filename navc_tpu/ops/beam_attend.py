"""Fully-fused AR beam-search attention step (permute + append + attend).

One beam-search decode step touches the per-beam K/V caches three times in
the XLA formulation (decoding/beam.py): the beam-ancestry permute, the
dynamic_update_slice appending the new position, and the attention reads.
Worse, XLA prefers an N-minor cache layout for the attention contractions
but Pallas custom calls require row-major operands, so a standalone permute
kernel pays two full layout-transpose copies per step (profiled: ~2 ms/step
at B=1024·k=5 on top of ~1 ms of kernel/attend time).

This kernel owns the cache end-to-end, so the while-loop carry never passes
through an XLA op and keeps the kernel's row-major 2-D layout:

  (kc, vc, q, k_t, v_t, ancestors, mask, t) -> (kc', vc', attn_out)

per (16·k)-row block and l-tile it
  1. permutes both caches by beam ancestry with a block-diagonal one-hot
     matmul on the MXU (exact selection — every output element is one
     ``1.0 * x`` product, held exactly by the f32 accumulator);
  2. overwrites position t-1 with the new K/V row (the ancestry of the
     just-generated token is the row itself: q/k_t/v_t are computed from
     the already-permuted sequence buffer);
  3. computes the causal cached attention with an online (flash) softmax —
     per-head dot products via segment-indicator matmuls, so the head
     structure never needs a register reshape (Mosaic kernels stay 2-D).

l-tiles beyond the current prefix are clamped in the BlockSpec index maps
(same block index => Mosaic elides the re-fetch) and skipped by ``pl.when``,
so per-step HBM traffic is ~2 * t/L * cache bytes instead of the XLA
formulation's ~4 passes over the full cache.

Numerics: the permute/append are exact; attention sums and the online
softmax normalizer can differ from the XLA einsum formulation by rounding
(different f32 summation order, flash rescaling). The segment-indicator
matmuls (head sums / head broadcasts) carry REAL f32 values; in f32-payload
parity mode they run at NAVC_ATTEND_PREC (exact vs the oracles), while in
the production bf16-payload mode _segdot uses NAVC_SEG_PASSES bf16 MXU
passes (2 = hi/lo split, ~2^-18 relative — the XLA path itself rounds its
probs to bf16 for the V einsum, so this stays within the reference
arithmetic class at a third of the HIGHEST-precision pass count). The
kernel is gated device-only (decoding/beam.py) so the CPU parity oracles
keep the XLA arithmetic; reference behavior replicated:
models/Translator.py:108 + attention masking of models/SubLayers.py
(-10e6 fill, f32 softmax).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .beam_permute import _GROUP

MASK_NEG = -1e30

import os as _os

_PREC_NAMES = {"default": jax.lax.Precision.DEFAULT,
               "high": jax.lax.Precision.HIGH,
               "highest": jax.lax.Precision.HIGHEST}
_PREC_ENV = _os.environ.get("NAVC_ATTEND_PREC", "highest")
if _PREC_ENV not in _PREC_NAMES:
    raise ValueError(
        "NAVC_ATTEND_PREC=%r; expected one of %s"
        % (_PREC_ENV, sorted(_PREC_NAMES)))
_PREC = _PREC_NAMES[_PREC_ENV]

# MXU passes for the segment-indicator matmuls when the K/V payload is bf16
# (production decode). 2 = hi/lo bf16 split of the f32 operand (~2^-18
# relative, far below the softmax's sensitivity); 1 = single bf16 pass (the
# same one-rounding class as the XLA path's probs.astype(bf16) @ v einsum).
# f32-payload mode (tests/parity) always takes the exact NAVC_ATTEND_PREC
# path instead.
_SEG_PASSES = int(_os.environ.get("NAVC_SEG_PASSES", "2"))
if _SEG_PASSES not in (1, 2):
    raise ValueError("NAVC_SEG_PASSES=%r; expected 1 or 2" % _SEG_PASSES)


def _segdot(x, w, passes):
    """``x @ w`` for a REAL-f32 ``x`` against a 0/1 indicator ``w``.

    passes=0: exact via the NAVC_ATTEND_PREC precision (f32 parity mode);
    passes=1: one MXU pass (x truncated to bf16 — one extra rounding per
              product vs the XLA einsum path);
    passes=2: hi/lo bf16 split of x (w is exact in bf16), reconstructing
              x's f32 mantissa to ~2^-18 at two passes.
    """
    if passes == 0:
        return jnp.dot(x, w, precision=_PREC,
                       preferred_element_type=jnp.float32)
    d = jax.lax.Precision.DEFAULT
    if passes == 1:
        return jnp.dot(x, w, precision=d,
                       preferred_element_type=jnp.float32)
    xh = x.astype(jnp.bfloat16).astype(jnp.float32)
    xl = x - xh
    return (jnp.dot(xh, w, precision=d, preferred_element_type=jnp.float32)
            + jnp.dot(xl, w, precision=d, preferred_element_type=jnp.float32))


def pick_ltile(l: int, h: int) -> int:
    """Largest divisor of l with tile width l_tile*h lanes <= ~4096."""
    cap = max(1, 4096 // h)
    for tl in range(min(l, cap), 0, -1):
        if l % tl == 0:
            return tl
    return 1


def beam_attend_eligible(b: int, k: int, l: int, h: int,
                         itemsize: int) -> bool:
    r = _GROUP * k
    tl = pick_ltile(l, h)
    vmem = 4 * r * tl * h * itemsize + 6 * r * h * 4
    return (b % _GROUP == 0 and h % 128 == 0
            and vmem <= 10 * 1024 * 1024)


def _kernel(tpos_ref, idx_ref, q_ref, kt_ref, vt_ref, amask_ref,
            kc_ref, vc_ref, okc_ref, ovc_ref, att_ref,
            m_scr, s_scr, o_scr, *,
            rows: int, tl: int, h: int, nh: int, dh: int):
    j = pl.program_id(1)
    nl = pl.num_programs(1)
    tpos = tpos_ref[0]
    jmax = tpos // tl
    inv_sqrt_dh = 1.0 / math.sqrt(dh)
    # segment matmuls carry REAL f32 values (products, softmax weights);
    # _segdot picks the pass count: exact in f32-payload parity mode,
    # split/truncated bf16 passes in production (NAVC_SEG_PASSES)
    cprec = (_PREC if kc_ref.dtype == jnp.float32
             else jax.lax.Precision.DEFAULT)

    # segment indicators: head-sum (h, nh) and head-broadcast (nh, h)
    hgrp = jax.lax.broadcasted_iota(jnp.int32, (h, nh), 0) // dh
    hcol = jax.lax.broadcasted_iota(jnp.int32, (h, nh), 1)
    seg = (hgrp == hcol).astype(jnp.float32)  # (h, nh)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full((rows, nh), MASK_NEG, jnp.float32)
        s_scr[:] = jnp.zeros((rows, nh), jnp.float32)
        o_scr[:] = jnp.zeros((rows, h), jnp.float32)

    passes = 0 if okc_ref.dtype == jnp.float32 else _SEG_PASSES

    @pl.when(j <= jmax)
    def _work():
        local = idx_ref[:]  # (rows, 1) block-local ancestor rows
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
        p = (col == local).astype(kc_ref.dtype)
        kp = jnp.dot(p, kc_ref[:], precision=cprec,
                     preferred_element_type=jnp.float32)
        vp = jnp.dot(p, vc_ref[:], precision=cprec,
                     preferred_element_type=jnp.float32)
        rel = tpos - j * tl  # append slot within this tile (>= tl if none)
        q = q_ref[:]

        sls = []
        vsegs = []
        for lp in range(tl):
            is_app = lp == rel
            kseg = jnp.where(is_app, kt_ref[:], kp[:, lp * h:(lp + 1) * h])
            vseg = jnp.where(is_app, vt_ref[:], vp[:, lp * h:(lp + 1) * h])
            # store through the cache dtype (lossless for the one-hot
            # permute; matches the XLA path's bf16 cache writes for k_t)
            kseg = kseg.astype(okc_ref.dtype)
            vseg = vseg.astype(ovc_ref.dtype)
            okc_ref[:, lp * h:(lp + 1) * h] = kseg
            ovc_ref[:, lp * h:(lp + 1) * h] = vseg

            # lanes beyond the decoded prefix hold UNSPECIFIED data: output
            # tiles past the clamp are never written (their garbage can be
            # NaN/Inf), so scores and V contributions of invalid positions
            # must be select-guarded — the additive mask alone cannot
            # neutralize a NaN
            pos_valid = (j * tl + lp) <= tpos

            # per-head dots: f32 products of the stored values, summed on
            # the MXU via the segment indicator
            prod = q * kseg.astype(jnp.float32)
            sl = _segdot(prod, seg, passes)
            sls.append(jnp.where(pos_valid,
                                 sl * inv_sqrt_dh + amask_ref[:, lp][:, None],
                                 MASK_NEG))
            vsegs.append(jnp.where(pos_valid,
                                   vseg.astype(jnp.float32), 0.0))

        # ONE softmax rescale per l-tile (not per position): every position
        # of the tile is in registers, so the flash update needs a single
        # max/rescale/broadcast — 7 segment matmuls per tile instead of 18
        m_old = m_scr[:]
        m_tile = sls[0]
        for sl in sls[1:]:
            m_tile = jnp.maximum(m_tile, sl)
        m_new = jnp.maximum(m_old, m_tile)
        resc = jnp.exp(m_old - m_new)
        # exp(MASK_NEG - m_new) underflows to exactly 0.0 (m_new is finite:
        # position 0 is always valid), so invalid positions drop out
        pws = [jnp.exp(sl - m_new) for sl in sls]
        s_tile = pws[0]
        for pw in pws[1:]:
            s_tile = s_tile + pw
        s_scr[:] = s_scr[:] * resc + s_tile

        rb = _segdot(resc, seg.T, passes)
        csum = _segdot(pws[0], seg.T, passes) * vsegs[0]
        for lp in range(1, tl):
            csum = csum + _segdot(pws[lp], seg.T, passes) * vsegs[lp]
        o_scr[:] = o_scr[:] * rb + csum
        m_scr[:] = m_new

    @pl.when(j == nl - 1)
    def _finish():
        sb = _segdot(s_scr[:], seg.T, passes)
        att_ref[:] = o_scr[:] / sb


def _cross_kernel(q_ref, ke_ref, ve_ref, att_ref, *,
                  le: int, h: int, nh: int, dh: int):
    inv_sqrt_dh = 1.0 / math.sqrt(dh)
    hgrp = jax.lax.broadcasted_iota(jnp.int32, (h, nh), 0) // dh
    hcol = jax.lax.broadcasted_iota(jnp.int32, (h, nh), 1)
    seg = (hgrp == hcol).astype(jnp.float32)
    passes = 0 if ke_ref.dtype == jnp.float32 else _SEG_PASSES

    # the whole per-row enc K/V lives in this block, so the softmax is
    # single-pass: no online rescaling, no scratch carries across grid
    # steps, and the output block is written exactly once
    q = q_ref[:]
    sls = []
    vsegs = []
    for lp in range(le):
        kseg = ke_ref[:, lp * h:(lp + 1) * h].astype(jnp.float32)
        vsegs.append(ve_ref[:, lp * h:(lp + 1) * h].astype(jnp.float32))
        sls.append(_segdot(q * kseg, seg, passes) * inv_sqrt_dh)
    m = sls[0]
    for sl in sls[1:]:
        m = jnp.maximum(m, sl)
    pws = [jnp.exp(sl - m) for sl in sls]
    s = pws[0]
    for pw in pws[1:]:
        s = s + pw
    o = _segdot(pws[0], seg.T, passes) * vsegs[0]
    for lp in range(1, le):
        o = o + _segdot(pws[lp], seg.T, passes) * vsegs[lp]
    sb = _segdot(s, seg.T, passes)
    att_ref[:] = o / sb


def pick_rtile(n: int, le: int, h: int, itemsize: int) -> int:
    """Largest row block <= 256 dividing n with modest VMEM (see below)."""
    cap = int(_os.environ.get("NAVC_CROSS_RTILE", "256"))
    for r in range(min(n, cap), 7, -1):
        if n % r or r % 8:
            continue
        # double-buffered q/ke/ve blocks + registers + output block
        if r * h * (2 * (4 + 2 * le * itemsize) + 3 * le * 4) \
                <= 12 * 1024 * 1024:
            return r
    return 0


def cross_attend_eligible(n: int, le: int, h: int,
                          itemsize: int = 2) -> bool:
    return h % 128 == 0 and pick_rtile(n, le, h, itemsize) >= 8


@functools.partial(jax.jit, static_argnames=("nh", "interpret"))
def cross_attend(q: jnp.ndarray, ke_rows: jnp.ndarray, ve_rows: jnp.ndarray,
                 nh: int, interpret: bool = False) -> jnp.ndarray:
    """Beam cross-attention over ROW-EXPANDED, position-blocked enc K/V.

    q: (n, h) f32; ke_rows, ve_rows: (n, le*h) enc-side K/V already expanded
    to decode rows (one jnp.repeat per decode — the k beams of an instance
    share enc_output, reference models/SubLayers.py cross attention,
    mask-free in the cached beam path). Returns softmax(q K^T / sqrt(dh)) V
    as (n, h) f32.

    The previous design broadcast (b, le*h) K/V to rows INSIDE the kernel
    with per-step one-hot MXU matmuls; at B=1024·k=5 that re-spent
    ~0.5 ms/step of MXU on the broadcast and serialized 64 tiny grid blocks
    (profiled 1.73 ms/step total vs a ~0.14 ms HBM bound). Expanding once
    per decode in HBM (bf16 in the production dtype — lossless casts of
    dense() outputs) turns the step into a pure stream: a 1-D row grid,
    each block holding the WHOLE per-row enc K/V, single-pass softmax.
    """
    n, h = q.shape
    le = ke_rows.shape[1] // h
    r = pick_rtile(n, le, h, ke_rows.dtype.itemsize)
    assert r and h % 128 == 0
    dh = h // nh

    grid = (n // r,)
    att = pl.pallas_call(
        functools.partial(_cross_kernel, le=le, h=h, nh=nh, dh=dh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, le * h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, le * h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h), jnp.float32),
        name="cross_attend",
        interpret=interpret,
    )(q, ke_rows, ve_rows)
    return att


@functools.partial(jax.jit,
                   static_argnames=("k", "nh", "l", "interpret"))
def beam_attend_step(kc: jnp.ndarray, vc: jnp.ndarray,
                     q: jnp.ndarray, kt: jnp.ndarray, vt: jnp.ndarray,
                     prev_k: jnp.ndarray, amask: jnp.ndarray,
                     tpos: jnp.ndarray, k: int, nh: int, l: int,
                     interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused cached-attention beam step.

    kc, vc: (N, l*h) flat caches (N = b*k); q, kt, vt: (N, h) f32 values
    for position ``tpos`` (bf16-valued in the production dtype); prev_k:
    (b, k) int32 ancestor slots from the PREVIOUS selection; amask: (N, l)
    f32 additive key mask (0 valid / -1e7-style fill); tpos: () int32
    position being decoded (t-1). Returns (kc', vc', att (N, h) f32).

    Cache positions > tpos are UNSPECIFIED in the outputs (their l-tiles
    are clamped away and never written); they are correspondingly never
    read into the attention math — callers must treat the caches as opaque
    carries, which decoding/beam.py does.
    """
    n, m = kc.shape
    h = q.shape[1]
    assert m == l * h
    b = n // k
    r = _GROUP * k
    tl = pick_ltile(l, h)
    nl = l // tl
    tm = tl * h
    assert b % _GROUP == 0 and h % 128 == 0, (b, h)
    dh = h // nh

    src = ((jnp.arange(n, dtype=jnp.int32) // k) * k
           + prev_k.astype(jnp.int32).reshape(n))
    local = (src % r).reshape(n, 1)
    tpos_arr = jnp.asarray(tpos, jnp.int32).reshape(1)

    # re-pack the (N, l) mask to 128 lanes per l-tile (Mosaic requires lane
    # blocks divisible by 128); lanes >= tl per tile are never read
    lane = jnp.arange(nl * 128)
    src_l = jnp.minimum((lane // 128) * tl + (lane % 128), l - 1)
    amask_p = jnp.take(amask, src_l, axis=1)

    def cache_map(i, j, tpos_ref):
        return (i, jnp.minimum(j, tpos_ref[0] // tl))

    def row_map(i, j, tpos_ref):
        return (i, 0)

    grid = (n // r, nl)
    kco, vco, att = pl.pallas_call(
        functools.partial(_kernel, rows=r, tl=tl, h=h, nh=nh, dh=dh),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((r, 1), row_map),
                pl.BlockSpec((r, h), row_map),
                pl.BlockSpec((r, h), row_map),
                pl.BlockSpec((r, h), row_map),
                pl.BlockSpec((r, 128), cache_map),
                pl.BlockSpec((r, tm), cache_map),
                pl.BlockSpec((r, tm), cache_map),
            ],
            out_specs=[
                pl.BlockSpec((r, tm), cache_map),
                pl.BlockSpec((r, tm), cache_map),
                pl.BlockSpec((r, h), row_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((r, nh), jnp.float32),
                pltpu.VMEM((r, nh), jnp.float32),
                pltpu.VMEM((r, h), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n, m), kc.dtype),
            jax.ShapeDtypeStruct((n, m), vc.dtype),
            jax.ShapeDtypeStruct((n, h), jnp.float32),
        ],
        # update the caches IN PLACE (operand indices count the scalar
        # prefetch): the while-loop carry and the kernel share one HBM
        # buffer, so XLA can neither double-buffer the 2x(N, l*h) caches
        # nor pick a carry layout that disagrees with the custom call's
        # row-major operands (the failure mode that cost ~2 ms/step of
        # transpose copies around the standalone permute kernel). Tiles
        # beyond the prefix now keep their previous contents rather than
        # being unspecified — still opaque to callers by contract.
        input_output_aliases={6: 0, 7: 1},
        name="beam_attend_step",
        interpret=interpret,
    )(tpos_arr, local, q, kt, vt, amask_p, kc, vc)
    return kco, vco, att
