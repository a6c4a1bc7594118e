"""Pallas-fused BertLayer TRAINING step: forward + custom-VJP backward.

Why this exists: the XLA training step runs the decoder layer as ~30 separate
ops per pass. Profiled on the v5e at B=2048 (see docs/DESIGN.md §6): the
(B, 8, 30, 30) attention einsums execute at ~2 TFLOP/s (tiny matmuls, fwd and
bwd), the head-layout relayouts cost ~12 ms/step in pure copies, and the
dense matmuls drag to 27-70 TFLOP/s because XLA fuses the dropout/convert
chains into their epilogues. This module computes the whole layer — both
directions — in VMEM with the same 2-D block-diagonal tiling as the eval
kernel (ops/fused_layer.py): TB whole sequences flattened to (TB*L_pad, H)
rows, per-head attention as full-tile matmuls with a block-diagonal mask.

Backward strategy: **recompute, don't save**. The only residual written to
HBM is ``r2`` (the FFN input, one (N, L, H) tensor in the compute dtype);
attention probabilities and all other intermediates are recomputed in-kernel
during the backward pass (flash-attention-style), trading ~1x extra forward
FLOPs for the elimination of every intermediate HBM round-trip. Weight
gradients accumulate in f32 VMEM scratch across the (sequential) TPU grid
and are written once at the last tile.

The backward is split into two kernels so each fits comfortably in VMEM:
  * FFN backward:   (r2, dy)  -> dr2 + {dWi, dbi, dWd, dbd}   (8 MB f32 scratch)
  * attention bwd:  (x, enc, dr2) -> dx, denc + 16 attn grads (8 MB f32 scratch)

Dropout: the reference BertLayer in train mode applies hidden-dropout at four
sites (models/bert.py:182-200 self-output, same for cross-output, and the
double dropout in BertOutput, bert.py:240-247). Masks are generated IN-KERNEL
from a counter-based integer hash (murmur3-style finalizer over an iota
lattice keyed by seed/tile/site) — a pure jnp formulation that produces
bit-identical masks under Mosaic and interpret mode (pltpu.prng_* has no CPU
interpret lowering), and identical masks in forward and backward by
construction. Each mask element keeps with probability 1-p and scales by
1/(1-p), matching torch.nn.Dropout semantics. The stream is NOT the flax/
threefry stream — dropout parity with the unfused path is distributional,
not bitwise (trajectory-level equivalence is validated in tests and the
bench A/B; exact-value tests run with p=0).

Attention-probs dropout (attention_probs_dropout_prob) is NOT implemented —
the reference default is 0.0 (opts.py) and eligibility gates on it.

Parity target (p=0, compute_dtype=float32): bit-exact with the eval fused
kernel and with flax BertLayer in eval mode; gradients match jax.grad of the
flax layer to f32 tolerance (tests/test_fused_train_layer.py).
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_layer import (MASK_FILL, SQRT_2_OVER_PI, WEIGHT_KEYS, _gelu_new,
                          _pad2, _pad3, _round_up)

# int32 views of the murmur3/xxhash mixing constants (wrapping arithmetic)
_MC1 = -1640531527   # 0x9E3779B9
_MC2 = -2048144789   # 0x85EBCA6B
_MC3 = -1028477379   # 0xC2B2AE35
_MM1 = 2146121005    # 0x7FEB352D
_MM2 = -2070006133   # 0x846CA68B

# dropout site ids (fwd and bwd MUST agree)
_SITE_SELF_OUT = 0
_SITE_CROSS_OUT = 1
_SITE_FFN_DOWN = 2
_SITE_FFN_FINAL = 3
# embedding dropout (reference bert.py:104-107, the LN-output dropout) folded
# into the kernel input: generating a (B, L, H) threefry mask in XLA cost
# ~3.3 ms/pass at B=2048; the in-kernel hash mask is ~free. The caller must
# then run the flax embedding with deterministic=True and pass p_input.
_SITE_INPUT = 4


def _hash24(seed, tile, site: int, rows: int, cols: int):
    """Uniform 24-bit integers on a (rows, cols) lattice.

    murmur3 fmix over a linear combination of the lattice coordinates and a
    per-(seed, tile, site) key. int32 wrapping multiplies + logical shifts
    only — identical results under Mosaic and interpret mode.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    key = seed + (tile * jnp.int32(11) + jnp.int32(site)) * jnp.int32(_MC3)
    x = r * jnp.int32(_MC1) + c * jnp.int32(_MC2) + key
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * jnp.int32(_MM1)
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * jnp.int32(_MM2)
    x = x ^ jax.lax.shift_right_logical(x, 16)
    return x & jnp.int32(0x00FFFFFF)


def _dropmul(v, seed, tile, site: int, p: float):
    """Apply dropout(p) to f32 v, mask derived from (seed, tile, site)."""
    if p <= 0.0:
        return v
    th = jnp.int32(int(round(p * float(1 << 24))))
    bits = _hash24(seed, tile, site, v.shape[0], v.shape[1])
    keep = (bits >= th).astype(jnp.float32) * jnp.float32(1.0 / (1.0 - p))
    return v * keep


def _gelu_new_grad(a):
    u = SQRT_2_OVER_PI * (a + 0.044715 * a * a * a)
    th = jnp.tanh(u)
    du = SQRT_2_OVER_PI * (1.0 + 3.0 * 0.044715 * a * a)
    return 0.5 * (1.0 + th) + 0.5 * a * (1.0 - th * th) * du


def _mm(a, b, cdt, *, dims=((1,), (0,))):
    """a @ b with operands cast to the compute dtype, f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(cdt), b.astype(cdt),
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32)


def _attn_bias(tq, tk, lq, lk, kp_cols, causal):
    """Block-diagonal + key-pad (+causal) additive mask, exactly as the eval
    kernel builds it (ops/fused_layer.py:67-74)."""
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    masked = (row_idx // lq != col_idx // lk) | (kp_cols[None, :] > 0.5)
    if causal:
        masked = masked | (col_idx % lk > row_idx % lq)
    return jnp.where(masked, MASK_FILL, 0.0)


def _project_qkv(xq, kv, w, prefix, cdt):
    q = _mm(xq, w["wq_%s" % prefix][:], cdt) + w["bq_%s" % prefix][:]
    k = _mm(kv, w["wk_%s" % prefix][:], cdt) + w["bk_%s" % prefix][:]
    v = _mm(kv, w["wv_%s" % prefix][:], cdt) + w["bv_%s" % prefix][:]
    return q, k, v


def _attend_heads(q, k, v, bias, n_head, cdt):
    """Per-head masked softmax attention over full 2-D tiles.

    Returns (probs per head [f32 (Tq, Tk)], ctx (Tq, H) f32). Identical op
    order to the eval kernel so f32 recompute is bit-exact.
    """
    h = q.shape[1]
    d = h // n_head
    scale = 1.0 / math.sqrt(d)
    ps, ctx = [], []
    for hd in range(n_head):
        sl = slice(hd * d, (hd + 1) * d)
        scores = jax.lax.dot_general(
            q[:, sl].astype(cdt), k[:, sl].astype(cdt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        ps.append(p)
        ctx.append(_mm(p, v[:, sl], cdt))
    return ps, jnp.concatenate(ctx, axis=1)


def _attend_bwd_heads(dctx, ps, q, k, v, n_head, cdt):
    """Backward of _attend_heads given dctx (Tq, H) and saved/recomputed
    probs. Returns (dq, dk, dv) each full-width (rows, H) f32."""
    h = q.shape[1]
    d = h // n_head
    scale = 1.0 / math.sqrt(d)
    dqs, dks, dvs = [], [], []
    for hd in range(n_head):
        sl = slice(hd * d, (hd + 1) * d)
        p = ps[hd]
        dc = dctx[:, sl]
        dv = _mm(p, dc, cdt, dims=((0,), (0,)))          # (Tk, d)
        dp = _mm(dc, v[:, sl], cdt, dims=((1,), (1,)))   # (Tq, Tk)
        ds = (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * p * scale
        dq = _mm(ds, k[:, sl], cdt)                       # (Tq, d)
        dk = _mm(ds, q[:, sl], cdt, dims=((0,), (0,)))    # (Tk, d)
        dqs.append(dq); dks.append(dk); dvs.append(dv)
    return (jnp.concatenate(dqs, 1), jnp.concatenate(dks, 1),
            jnp.concatenate(dvs, 1))


def _self_cross_fwd(x, enc, kp, enc_kp, w, seed, tile, *,
                    n_head, l_pad, le_pad, causal, p, p_input, cdt):
    """Self-attn + cross-attn stages (shared by fwd kernel and attn-bwd
    recompute — identical op order guarantees bit-exact recompute).
    ``p_input`` applies the folded embedding dropout to x first."""
    x = _dropmul(x, seed, tile, _SITE_INPUT, p_input)
    tq = x.shape[0]
    tk = enc.shape[0]
    npm = (1.0 - kp)[:, None]
    bias_s = _attn_bias(tq, tq, l_pad, l_pad, kp, causal)
    q1, k1, v1 = _project_qkv(x, x, w, "s", cdt)
    ps1, c1 = _attend_heads(q1, k1, v1, bias_s, n_head, cdt)
    o1 = _mm(c1, w["wo_s"][:], cdt) + w["bo_s"][:]
    o1 = _dropmul(o1, seed, tile, _SITE_SELF_OUT, p)
    r1 = (o1 + x) * npm

    bias_c = _attn_bias(tq, tk, l_pad, le_pad, enc_kp, False)
    q2, k2, v2 = _project_qkv(r1, enc, w, "c", cdt)
    ps2, c2 = _attend_heads(q2, k2, v2, bias_c, n_head, cdt)
    o2 = _mm(c2, w["wo_c"][:], cdt) + w["bo_c"][:]
    o2 = _dropmul(o2, seed, tile, _SITE_CROSS_OUT, p)
    r2 = (o2 + r1) * npm
    return dict(x=x, npm=npm, q1=q1, k1=k1, v1=v1, ps1=ps1, c1=c1, r1=r1,
                q2=q2, k2=k2, v2=v2, ps2=ps2, c2=c2, r2=r2)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(seed_ref, x_ref, enc_ref, kp_ref, enc_kp_ref, *refs,
                n_head, l_pad, le_pad, causal, p, p_input, cdt):
    w = {key: r for key, r in zip(WEIGHT_KEYS, refs[:len(WEIGHT_KEYS)])}
    out_ref, r2_ref = refs[len(WEIGHT_KEYS):]
    seed = seed_ref[0]
    tile = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    st = _self_cross_fwd(
        x, enc_ref[:], kp_ref[:][:, 0], enc_kp_ref[:][:, 0], w, seed, tile,
        n_head=n_head, l_pad=l_pad, le_pad=le_pad, causal=causal, p=p,
        p_input=p_input, cdt=cdt)
    r2, npm = st["r2"], st["npm"]

    a = _mm(r2, w["wi"][:], cdt) + w["bi"][:]
    g = _gelu_new(a)
    d = _mm(g, w["wo2"][:], cdt) + w["bo2"][:]
    d = _dropmul(d, seed, tile, _SITE_FFN_DOWN, p)
    t = d + r2
    t = _dropmul(t, seed, tile, _SITE_FFN_FINAL, p)
    out_ref[:] = (t * npm).astype(out_ref.dtype)
    r2_ref[:] = r2.astype(r2_ref.dtype)


def _ffn_bwd_kernel(seed_ref, r2_ref, dy_ref, kp_ref, wi_ref, bi_ref, wd_ref,
                    dr2_ref, dwi_ref, dbi_ref, dwd_ref, dbd_ref,
                    dwi_s, dbi_s, dwd_s, dbd_s, *, p, cdt):
    seed = seed_ref[0]
    tile = pl.program_id(0)
    npm = (1.0 - kp_ref[:][:, 0])[:, None]
    dy = dy_ref[:].astype(jnp.float32)

    # out = drop4(drop3(g @ Wd + bd) + r2) * npm   (bert.py:240-247, 295-299)
    dt = _dropmul(dy * npm, seed, tile, _SITE_FFN_FINAL, p)
    dd = _dropmul(dt, seed, tile, _SITE_FFN_DOWN, p)

    r2 = r2_ref[:].astype(jnp.float32)
    a = _mm(r2, wi_ref[:], cdt) + bi_ref[:]
    g = _gelu_new(a)

    dg = _mm(dd, wd_ref[:], cdt, dims=((1,), (1,)))
    da = dg * _gelu_new_grad(a)
    dr2 = dt + _mm(da, wi_ref[:], cdt, dims=((1,), (1,)))
    dr2_ref[:] = dr2.astype(dr2_ref.dtype)

    dwd_t = _mm(g, dd, cdt, dims=((0,), (0,)))
    dwi_t = _mm(r2, da, cdt, dims=((0,), (0,)))
    dbd_t = jnp.sum(dd, axis=0, keepdims=True)
    dbi_t = jnp.sum(da, axis=0, keepdims=True)

    @pl.when(tile == 0)
    def _init():
        dwi_s[:] = dwi_t; dbi_s[:] = dbi_t
        dwd_s[:] = dwd_t; dbd_s[:] = dbd_t

    @pl.when(tile > 0)
    def _acc():
        dwi_s[:] += dwi_t; dbi_s[:] += dbi_t
        dwd_s[:] += dwd_t; dbd_s[:] += dbd_t

    @pl.when(tile == pl.num_programs(0) - 1)
    def _emit():
        dwi_ref[:] = dwi_s[:]; dbi_ref[:] = dbi_s[:]
        dwd_ref[:] = dwd_s[:]; dbd_ref[:] = dbd_s[:]


_ATTN_GRAD_KEYS = WEIGHT_KEYS[:16]


def _attn_bwd_kernel(seed_ref, x_ref, enc_ref, dr2_ref, kp_ref, enc_kp_ref,
                     *refs, n_head, l_pad, le_pad, causal, p, p_input, cdt):
    w = {key: r for key, r in zip(WEIGHT_KEYS, refs[:len(WEIGHT_KEYS)])}
    outs = refs[len(WEIGHT_KEYS):]
    dx_ref, denc_ref = outs[0], outs[1]
    grad_refs = dict(zip(_ATTN_GRAD_KEYS, outs[2:2 + 16]))
    scr = dict(zip(_ATTN_GRAD_KEYS, outs[2 + 16:]))
    seed = seed_ref[0]
    tile = pl.program_id(0)

    x = x_ref[:].astype(jnp.float32)
    enc = enc_ref[:].astype(jnp.float32)
    kp = kp_ref[:][:, 0]
    enc_kp = enc_kp_ref[:][:, 0]
    st = _self_cross_fwd(x, enc, kp, enc_kp, w, seed, tile,
                         n_head=n_head, l_pad=l_pad, le_pad=le_pad,
                         causal=causal, p=p, p_input=p_input, cdt=cdt)
    x = st["x"]  # post input-dropout: the tensor the layer actually consumed
    npm = st["npm"]
    dr2 = dr2_ref[:].astype(jnp.float32)

    # r2 = (drop2(c2 @ Wo_c + bo_c) + r1) * npm
    do2 = _dropmul(dr2 * npm, seed, tile, _SITE_CROSS_OUT, p)
    dr1 = dr2 * npm
    dc2 = _mm(do2, w["wo_c"][:], cdt, dims=((1,), (1,)))
    g = {}
    g["wo_c"] = _mm(st["c2"], do2, cdt, dims=((0,), (0,)))
    g["bo_c"] = jnp.sum(do2, axis=0, keepdims=True)
    dq2, dk2, dv2 = _attend_bwd_heads(
        dc2, st["ps2"], st["q2"], st["k2"], st["v2"], n_head, cdt)
    g["wq_c"] = _mm(st["r1"], dq2, cdt, dims=((0,), (0,)))
    g["bq_c"] = jnp.sum(dq2, axis=0, keepdims=True)
    g["wk_c"] = _mm(enc, dk2, cdt, dims=((0,), (0,)))
    g["bk_c"] = jnp.sum(dk2, axis=0, keepdims=True)
    g["wv_c"] = _mm(enc, dv2, cdt, dims=((0,), (0,)))
    g["bv_c"] = jnp.sum(dv2, axis=0, keepdims=True)
    dr1 = dr1 + _mm(dq2, w["wq_c"][:], cdt, dims=((1,), (1,)))
    denc = (_mm(dk2, w["wk_c"][:], cdt, dims=((1,), (1,)))
            + _mm(dv2, w["wv_c"][:], cdt, dims=((1,), (1,))))
    denc_ref[:] = denc.astype(denc_ref.dtype)

    # r1 = (drop1(c1 @ Wo_s + bo_s) + x) * npm
    do1 = _dropmul(dr1 * npm, seed, tile, _SITE_SELF_OUT, p)
    dx = dr1 * npm
    dc1 = _mm(do1, w["wo_s"][:], cdt, dims=((1,), (1,)))
    g["wo_s"] = _mm(st["c1"], do1, cdt, dims=((0,), (0,)))
    g["bo_s"] = jnp.sum(do1, axis=0, keepdims=True)
    dq1, dk1, dv1 = _attend_bwd_heads(
        dc1, st["ps1"], st["q1"], st["k1"], st["v1"], n_head, cdt)
    g["wq_s"] = _mm(x, dq1, cdt, dims=((0,), (0,)))
    g["bq_s"] = jnp.sum(dq1, axis=0, keepdims=True)
    g["wk_s"] = _mm(x, dk1, cdt, dims=((0,), (0,)))
    g["bk_s"] = jnp.sum(dk1, axis=0, keepdims=True)
    g["wv_s"] = _mm(x, dv1, cdt, dims=((0,), (0,)))
    g["bv_s"] = jnp.sum(dv1, axis=0, keepdims=True)
    dx = (dx + _mm(dq1, w["wq_s"][:], cdt, dims=((1,), (1,)))
          + _mm(dk1, w["wk_s"][:], cdt, dims=((1,), (1,)))
          + _mm(dv1, w["wv_s"][:], cdt, dims=((1,), (1,))))
    # chain through the folded input dropout (same mask, elementwise linear)
    dx = _dropmul(dx, seed, tile, _SITE_INPUT, p_input)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(tile == 0)
    def _init():
        for key in _ATTN_GRAD_KEYS:
            scr[key][:] = g[key]

    @pl.when(tile > 0)
    def _acc():
        for key in _ATTN_GRAD_KEYS:
            scr[key][:] += g[key]

    @pl.when(tile == pl.num_programs(0) - 1)
    def _emit():
        for key in _ATTN_GRAD_KEYS:
            grad_refs[key][:] = scr[key][:]


# ---------------------------------------------------------------------------
# pallas_call wrappers (pad -> 2-D tiles -> kernel -> slice)
# ---------------------------------------------------------------------------

_VMEM_LIMIT = 100 * 1024 * 1024


def _wdict(weights: Dict[str, jnp.ndarray], cdt):
    """Weights as kernel operands: matrices in cdt, biases as f32 (1, dim)."""
    out = {}
    for key, v in weights.items():
        if v.ndim == 1:
            out[key] = v.astype(jnp.float32)[None, :]
        else:
            out[key] = v.astype(cdt)
    return out


def _wspecs(w):
    specs = []
    for key in WEIGHT_KEYS:
        dims = w[key].shape
        specs.append(pl.BlockSpec(dims, lambda i: (0,) * len(dims),
                                  memory_space=pltpu.VMEM))
    return specs


def _fwd_call(x, enc, kp_mask, weights, seed, *, n_head, tb, causal, p,
              p_input, cdt, interpret, out_dtype):
    n, l, h = x.shape
    le = enc.shape[1]
    l_pad = _round_up(l, 8)
    le_pad = _round_up(le, 8)
    n_pad = _round_up(n, tb)
    t = tb * l_pad
    tk = tb * le_pad

    x2 = _pad3(x, n_pad, l_pad).reshape(n_pad * l_pad, h)
    enc2 = _pad3(enc, n_pad, le_pad).reshape(n_pad * le_pad, h)
    kp2 = _pad2(kp_mask, n_pad, l_pad).reshape(n_pad * l_pad, 1)
    enc_kp_row = (jnp.arange(le_pad) >= le).astype(jnp.float32)
    enc_kp2 = jnp.broadcast_to(enc_kp_row[None, :], (n_pad, le_pad)
                               ).reshape(n_pad * le_pad, 1)
    w = _wdict(weights, cdt)

    xspec = pl.BlockSpec((t, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((tk, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out, r2 = pl.pallas_call(
        functools.partial(_fwd_kernel, n_head=n_head, l_pad=l_pad,
                          le_pad=le_pad, causal=causal, p=p, p_input=p_input,
                          cdt=cdt),
        grid=(n_pad // tb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  xspec, kspec,
                  pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((tk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)]
                 + _wspecs(w),
        out_specs=[xspec, xspec],
        out_shape=[jax.ShapeDtypeStruct((n_pad * l_pad, h), out_dtype),
                   jax.ShapeDtypeStruct((n_pad * l_pad, h), cdt)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        name="fused_train_fwd",
        interpret=interpret,
    )(seed, x2, enc2, kp2, enc_kp2, *[w[k] for k in WEIGHT_KEYS])
    out3 = out.reshape(n_pad, l_pad, h)[:n, :l]
    return out3, r2, (n_pad, l_pad, le_pad)


def _ffn_bwd_call(r2_flat, dy, kp_mask, weights, seed, *, dims, tb, p, cdt,
                  interpret):
    n_pad, l_pad, _ = dims
    n, l, h = dy.shape
    ffn = weights["wi"].shape[1]
    t = tb * l_pad
    dy2 = _pad3(dy, n_pad, l_pad).reshape(n_pad * l_pad, h)
    kp2 = _pad2(kp_mask, n_pad, l_pad).reshape(n_pad * l_pad, 1)
    wi = weights["wi"].astype(cdt)
    bi = weights["bi"].astype(jnp.float32)[None, :]
    wd = weights["wo2"].astype(cdt)

    xspec = pl.BlockSpec((t, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    dr2, dwi, dbi, dwd, dbd = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, p=p, cdt=cdt),
        grid=(n_pad // tb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  xspec, xspec,
                  pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  cspec((h, ffn)), cspec((1, ffn)), cspec((ffn, h))],
        out_specs=[xspec, cspec((h, ffn)), cspec((1, ffn)),
                   cspec((ffn, h)), cspec((1, h))],
        out_shape=[jax.ShapeDtypeStruct((n_pad * l_pad, h), jnp.float32),
                   jax.ShapeDtypeStruct((h, ffn), jnp.float32),
                   jax.ShapeDtypeStruct((1, ffn), jnp.float32),
                   jax.ShapeDtypeStruct((ffn, h), jnp.float32),
                   jax.ShapeDtypeStruct((1, h), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((h, ffn), jnp.float32),
                        pltpu.VMEM((1, ffn), jnp.float32),
                        pltpu.VMEM((ffn, h), jnp.float32),
                        pltpu.VMEM((1, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        name="fused_train_ffn_bwd",
        interpret=interpret,
    )(seed, r2_flat, dy2, kp2, wi, bi, wd)
    return dr2, dwi, dbi[0], dwd, dbd[0]


def _attn_bwd_call(x, enc, dr2_flat, kp_mask, weights, seed, *, dims, n_head,
                   tb, causal, p, p_input, cdt, interpret):
    n_pad, l_pad, le_pad = dims
    n, l, h = x.shape
    le = enc.shape[1]
    t = tb * l_pad
    tk = tb * le_pad

    x2 = _pad3(x, n_pad, l_pad).reshape(n_pad * l_pad, h)
    enc2 = _pad3(enc, n_pad, le_pad).reshape(n_pad * le_pad, h)
    kp2 = _pad2(kp_mask, n_pad, l_pad).reshape(n_pad * l_pad, 1)
    enc_kp_row = (jnp.arange(le_pad) >= le).astype(jnp.float32)
    enc_kp2 = jnp.broadcast_to(enc_kp_row[None, :], (n_pad, le_pad)
                               ).reshape(n_pad * le_pad, 1)
    w = _wdict(weights, cdt)

    xspec = pl.BlockSpec((t, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((tk, h), lambda i: (i, 0), memory_space=pltpu.VMEM)

    grad_shapes, grad_specs, scratches = [], [], []
    for key in _ATTN_GRAD_KEYS:
        shape = tuple(w[key].shape)
        grad_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))
        grad_specs.append(pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM))
        scratches.append(pltpu.VMEM(shape, jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, n_head=n_head, l_pad=l_pad,
                          le_pad=le_pad, causal=causal, p=p, p_input=p_input,
                          cdt=cdt),
        grid=(n_pad // tb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  xspec, kspec, xspec,
                  pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((tk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)]
                 + _wspecs(w),
        out_specs=[xspec, kspec] + grad_specs,
        out_shape=[jax.ShapeDtypeStruct((n_pad * l_pad, h), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad * le_pad, h), jnp.float32)]
                  + grad_shapes,
        scratch_shapes=scratches,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        name="fused_train_attn_bwd",
        interpret=interpret,
    )(seed, x2, enc2, dr2_flat, kp2, enc_kp2, *[w[k] for k in WEIGHT_KEYS])

    dx = outs[0].reshape(n_pad, l_pad, h)[:n, :l]
    denc = outs[1].reshape(n_pad, le_pad, h)[:n, :le]
    grads = dict(zip(_ATTN_GRAD_KEYS, outs[2:]))
    return dx, denc, grads


# ---------------------------------------------------------------------------
# custom_vjp assembly
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _get_layer_fn(n_head: int, tb: int, causal: bool, p: float,
                  p_input: float, cdt_name: str, interpret: bool,
                  out_dtype_name: str):
    cdt = jnp.dtype(cdt_name)
    out_dtype = jnp.dtype(out_dtype_name)

    @jax.custom_vjp
    def layer(x, enc, kp_mask, weights, seed):
        out, _, _ = _fwd_call(x, enc, kp_mask, weights, seed,
                              n_head=n_head, tb=tb, causal=causal, p=p,
                              p_input=p_input, cdt=cdt, interpret=interpret,
                              out_dtype=out_dtype)
        return out

    def fwd_rule(x, enc, kp_mask, weights, seed):
        out, r2, dims = _fwd_call(x, enc, kp_mask, weights, seed,
                                  n_head=n_head, tb=tb, causal=causal, p=p,
                                  p_input=p_input, cdt=cdt, interpret=interpret,
                                  out_dtype=out_dtype)
        return out, (x, enc, kp_mask, weights, seed, r2, dims)

    def bwd_rule(res, dy):
        x, enc, kp_mask, weights, seed, r2, dims = res
        dr2, dwi, dbi, dwd, dbd = _ffn_bwd_call(
            r2, dy.astype(jnp.float32), kp_mask, weights, seed,
            dims=dims, tb=tb, p=p, cdt=cdt, interpret=interpret)
        dx, denc, attn_grads = _attn_bwd_call(
            x, enc, dr2, kp_mask, weights, seed,
            dims=dims, n_head=n_head, tb=tb, causal=causal, p=p,
            p_input=p_input, cdt=cdt, interpret=interpret)
        dweights = {}
        for key in WEIGHT_KEYS:
            if key == "wi":
                gval = dwi
            elif key == "bi":
                gval = dbi
            elif key == "wo2":
                gval = dwd
            elif key == "bo2":
                gval = dbd
            else:
                gval = attn_grads[key]
                if weights[key].ndim == 1:
                    gval = gval[0]
            dweights[key] = gval.astype(weights[key].dtype)
        # float0 cotangents are only legal for integer/bool primals; the
        # docstring allows bool OR float masks, so match the primal dtype
        if jnp.issubdtype(jnp.result_type(kp_mask), jnp.inexact):
            dkp = jnp.zeros(kp_mask.shape, jnp.result_type(kp_mask))
        else:
            dkp = np.zeros(kp_mask.shape, jax.dtypes.float0)
        dseed = np.zeros(seed.shape, jax.dtypes.float0)
        return (dx.astype(x.dtype), denc.astype(enc.dtype), dkp,
                dweights, dseed)

    layer.defvjp(fwd_rule, bwd_rule)
    return layer


def fused_bert_layer_train(x: jnp.ndarray, enc: jnp.ndarray,
                           kp_mask: jnp.ndarray,
                           weights: Dict[str, jnp.ndarray],
                           seed: jnp.ndarray, *,
                           n_head: int = 8, tb: int = 8,
                           causal: bool = False, p_hidden: float = 0.5,
                           p_input: float = 0.0,
                           compute_dtype=jnp.bfloat16,
                           out_dtype=jnp.float32,
                           interpret: bool = False) -> jnp.ndarray:
    """Training-mode fused BertLayer with a hand-written backward.

    x: (N, L, H) post-embedding hidden states; enc: (N, Le, H) encoder
    output; kp_mask: (N, L) bool/float, truthy where the token is PAD;
    weights: ops.fused_layer.WEIGHT_KEYS dict (from
    ``layer_weights_from_params``); seed: (1,) int32 dropout stream seed —
    the caller must vary it per step/pass (fold the step rng).

    ``causal=True`` gives the ARFormer teacher-forcing variant. Returns the
    (N, L, H) layer output; gradients flow to x, enc, and every weight.
    """
    return _get_layer_fn(n_head, tb, bool(causal), float(p_hidden),
                         float(p_input), jnp.dtype(compute_dtype).name,
                         bool(interpret), jnp.dtype(out_dtype).name)(
        x, enc, kp_mask, weights, seed)
