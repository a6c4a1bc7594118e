"""Pallas-fused NAR decoder layer: self-attn + cross-attn + FFN in VMEM.

The XLA decoder forward materializes ~15 full activation tensors per layer in
HBM (profiled: >40% of decoder time is elementwise passes and relayout
copies). This kernel computes the whole BertLayer for a tile of sequences
without touching HBM between stages:

    x   -> Q,K,V -> masked softmax -> @V -> Wo (+residual, *npm)
        -> cross Q; enc K,V -> softmax -> @V -> Wo (+residual, *npm)
        -> FFN up -> gelu_new -> FFN down (+residual, *npm)

TPU-shape design (everything stays 2-D — Mosaic supports neither >1 matmul
batch dim nor multi-dim register reshapes):
  * a tile packs TB whole sequences flattened to (T, H) rows, T = TB * L_PAD;
  * attention runs per head over column slices q[:, h*d:(h+1)*d] as full
    (T, T) scorings with a block-diagonal sequence mask built from iota —
    cross-sequence pairs get the reference's -10e6 fill, so softmax rows are
    exactly the per-sequence masked softmax. The (T/L_PAD)x padding waste is
    ~0.3ms of MXU-efficient matmul versus multi-ms of tiny-matmul and
    relayout overhead in the unfused path;
  * weights use constant-index BlockSpecs, DMA'd into VMEM once and reused
    across the grid (revisiting-block optimization);
  * matmuls run in bf16 with f32 accumulation; softmax is f32.

Parity target: the reference BertLayer in eval mode with with_layernorm=False
(the default, opts.py:36) — exactly the decode hot-loop configuration.
Sequences are pre-padded to L_PAD (multiple of 8); pad positions ride the
key-pad mask and non-pad multiplier like real PAD tokens (bert.py:271-299).
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_FILL = -10e6
SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)


def _gelu_new(x):
    return 0.5 * x * (1.0 + jnp.tanh(SQRT_2_OVER_PI * (x + 0.044715 * x * x * x)))


def _attend_2d(xq, kv, kp_cols, wq, bq, wk, bk, wv, bv, wo, bo,
               *, n_head, lq, lk, causal=False, kv_pre=None):
    """Tile-wide per-head attention with block-diagonal sequence masking.

    xq: (Tq, H) f32 query rows (TB sequences x lq); kv: (Tk, H) f32 key rows
    (TB sequences x lk); kp_cols: (Tk,) f32, 1.0 where the key is masked out.
    ``causal`` additionally masks future positions within each sequence
    (ARFormer teacher forward). ``kv_pre=(k16, v16)`` supplies PRE-PROJECTED
    bf16 K/V rows (hoisted cross-attention K/V — iteration- and
    length-beam-invariant, so callers compute them once per video); the
    k/v dots are skipped and ``kv``/``wk``.. are ignored. Bit-identical to
    the in-kernel projection: the score/apply dots cast K/V to bf16 anyway.
    Returns (Tq, H) f32 (pre-residual).
    """
    tq, h = xq.shape
    d = h // n_head

    q = jnp.dot(xq.astype(jnp.bfloat16), wq, preferred_element_type=jnp.float32) + bq
    if kv_pre is not None:
        k, v = kv_pre
        tk = k.shape[0]
    else:
        tk = kv.shape[0]
        k = jnp.dot(kv.astype(jnp.bfloat16), wk, preferred_element_type=jnp.float32) + bk
        v = jnp.dot(kv.astype(jnp.bfloat16), wv, preferred_element_type=jnp.float32) + bv

    # block-diagonal mask: query row i belongs to sequence i // lq, key row j
    # to sequence j // lk; cross-sequence or key-pad entries get MASK_FILL
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    masked = (row_idx // lq != col_idx // lk) | (kp_cols[None, :] > 0.5)
    if causal:
        masked = masked | (col_idx % lk > row_idx % lq)
    bias = jnp.where(masked, MASK_FILL, 0.0)

    scale = 1.0 / math.sqrt(d)
    ctx_heads = []
    for hd in range(n_head):
        sl = slice(hd * d, (hd + 1) * d)
        qh = q[:, sl]
        kh = k[:, sl]
        vh = v[:, sl]
        scores = jax.lax.dot_general(
            qh.astype(jnp.bfloat16), kh.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        ctx_heads.append(
            jnp.dot(probs.astype(jnp.bfloat16), vh.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32))
    ctx = jnp.concatenate(ctx_heads, axis=1)

    return jnp.dot(ctx.astype(jnp.bfloat16), wo,
                   preferred_element_type=jnp.float32) + bo


def _layer_body(x, enc, kp, enc_kp,
                wq_s, bq_s, wk_s, bk_s, wv_s, bv_s, wo_s, bo_s,
                wq_c, bq_c, wk_c, bk_c, wv_c, bv_c, wo_c, bo_c,
                wi, bi, wo2, bo2,
                out_ref, *, n_head, l_pad, le_pad, causal, enc_kv=None):
    npm = (1.0 - kp)[:, None]

    att = _attend_2d(x, x, kp, wq_s, bq_s, wk_s, bk_s,
                     wv_s, bv_s, wo_s, bo_s,
                     n_head=n_head, lq=l_pad, lk=l_pad, causal=causal)
    att = (att + x) * npm

    cross = _attend_2d(att, enc, enc_kp, wq_c, bq_c, wk_c, bk_c,
                       wv_c, bv_c, wo_c, bo_c,
                       n_head=n_head, lq=l_pad, lk=le_pad, kv_pre=enc_kv)
    att = (cross + att) * npm

    inter = jnp.dot(att.astype(jnp.bfloat16), wi,
                    preferred_element_type=jnp.float32) + bi
    inter = _gelu_new(inter)
    down = jnp.dot(inter.astype(jnp.bfloat16), wo2,
                   preferred_element_type=jnp.float32) + bo2
    out_ref[:] = ((down + att) * npm).astype(out_ref.dtype)


def _kernel(x_ref, enc_ref, kp_ref, enc_kp_ref, *wrefs,
            n_head, l_pad, le_pad, causal):
    out_ref = wrefs[-1]
    weights = [r[:] for r in wrefs[:-1]]
    _layer_body(x_ref[:].astype(jnp.float32), enc_ref[:],
                kp_ref[:][:, 0], enc_kp_ref[:][:, 0],
                *weights, out_ref,
                n_head=n_head, l_pad=l_pad, le_pad=le_pad, causal=causal)


def _kernel_fold(x_ref, static_ref, lns_ref, lnb_ref, *refs,
                 n_head, l_pad, le_pad, causal, ln_eps, pre_kv=False):
    """Variant with the embedding epilogue folded in:
    x = LayerNorm(word_embs + static) before the layer body. With ``pre_kv``
    the enc operand is replaced by hoisted bf16 cross K/V rows."""
    if pre_kv:
        ke_ref, ve_ref, kp_ref, enc_kp_ref, *wrefs = refs
        enc, enc_kv = None, (ke_ref[:], ve_ref[:])
    else:
        enc_ref, kp_ref, enc_kp_ref, *wrefs = refs
        enc, enc_kv = enc_ref[:], None
    out_ref = wrefs[-1]
    weights = [r[:] for r in wrefs[:-1]]
    x = x_ref[:].astype(jnp.float32) + static_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) * (x - mu), axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + ln_eps) * lns_ref[:] + lnb_ref[:]
    _layer_body(x, enc, kp_ref[:][:, 0], enc_kp_ref[:][:, 0],
                *weights, out_ref,
                n_head=n_head, l_pad=l_pad, le_pad=le_pad, causal=causal,
                enc_kv=enc_kv)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pad3(a, n_pad, l_pad):
    """Zero-pad (N, L, H) to (n_pad, l_pad, H) — no-op copy when already
    aligned (the decode hot loop runs on an 8-aligned canvas precisely so
    these HBM round-trips vanish). Keeps bf16 inputs bf16 (halves the HBM
    stream of the big activation operands); the kernels upcast to f32 at
    entry, so bf16-in vs f32-in changes only the input rounding."""
    n, l, h = a.shape
    dt = jnp.bfloat16 if a.dtype == jnp.bfloat16 else jnp.float32
    if n == n_pad and l == l_pad:
        return a.astype(dt)
    return jnp.zeros((n_pad, l_pad, h), dt).at[:n, :l].set(a.astype(dt))


def _pad2(a, n_pad, l_pad, fill=1.0):
    n, l = a.shape
    if n == n_pad and l == l_pad:
        return a.astype(jnp.float32)
    return jnp.full((n_pad, l_pad), fill, jnp.float32).at[:n, :l].set(
        a.astype(jnp.float32))


WEIGHT_KEYS = ["wq_s", "bq_s", "wk_s", "bk_s", "wv_s", "bv_s", "wo_s", "bo_s",
               "wq_c", "bq_c", "wk_c", "bk_c", "wv_c", "bv_c", "wo_c", "bo_c",
               "wi", "bi", "wo2", "bo2"]


@functools.partial(jax.jit, static_argnames=("n_head", "tb", "interpret",
                                             "causal", "ln_eps", "out_dtype"))
def fused_nar_decoder_layer(x: jnp.ndarray, enc: jnp.ndarray,
                            kp_mask: jnp.ndarray, weights: Dict[str, jnp.ndarray],
                            n_head: int = 8, tb: int = 8,
                            interpret: bool = False,
                            causal: bool = False,
                            static: jnp.ndarray = None,
                            ln_scale: jnp.ndarray = None,
                            ln_bias: jnp.ndarray = None,
                            ln_eps: float = 1e-5,
                            out_dtype=jnp.float32,
                            enc_kv=None) -> jnp.ndarray:
    """Run the fused decoder layer.

    x: (N, L, H) f32 embedded inputs; enc: (N, Le, H) f32; kp_mask: (N, L)
    bool, True where the token is PAD. ``causal=True`` gives the ARFormer
    (teacher) variant.

    When ``static``/``ln_scale``/``ln_bias`` are given, x is the RAW word
    embeddings and the kernel also performs the embedding epilogue
    ``LayerNorm(x + static)`` (static = position + category + enhance-input
    features, which are iteration-invariant in the refinement loop).

    ``enc_kv=(ke, ve)`` — hoisted cross-attention K/V, each (N, Le, H) bf16
    computed as ``bf16(enc @ w_kc + b_kc)``. The cross K/V projection is
    identical for every refinement iteration and every length-beam row of a
    video (reference bert.py cross-attention over enc_output), so callers
    compute it once per generate; requires ``fold`` (the hot-loop path).
    Bit-identical to the in-kernel projection — the attention dots cast K/V
    to bf16 regardless.

    Returns (N, L, H) f32 hidden states matching the XLA BertLayer in eval
    mode (up to bf16 rounding).
    """
    fold = static is not None
    pre_kv = enc_kv is not None
    assert not pre_kv or fold, "enc_kv requires the folded-epilogue path"
    n, l, h = x.shape
    le = enc_kv[0].shape[1] if pre_kv else enc.shape[1]
    l_pad = _round_up(l, 8)
    le_pad = _round_up(le, 8)
    n_pad = _round_up(n, tb)

    xp = _pad3(x, n_pad, l_pad)
    kp = _pad2(kp_mask, n_pad, l_pad)
    enc_kp_row = (jnp.arange(le_pad) >= le).astype(jnp.float32)
    enc_kp = jnp.broadcast_to(enc_kp_row[None, :], (n_pad, le_pad))

    # flatten sequences into rows; tiles slice TB sequences at a time
    x2 = xp.reshape(n_pad * l_pad, h)
    kp2 = kp.reshape(n_pad * l_pad, 1)
    enc_kp2 = enc_kp.reshape(n_pad * le_pad, 1)
    if pre_kv:
        # pad rows land as zeros rather than the in-kernel bias row; their
        # masked softmax weights are exactly 0 (exp(-1e7) underflows), so
        # the attention output is unchanged
        ke2 = _pad3(enc_kv[0], n_pad, le_pad).reshape(n_pad * le_pad, h)
        ve2 = _pad3(enc_kv[1], n_pad, le_pad).reshape(n_pad * le_pad, h)
    else:
        enc2 = _pad3(enc, n_pad, le_pad).reshape(n_pad * le_pad, h)

    w = {k: (v.astype(jnp.bfloat16) if v.ndim == 2 else v.astype(jnp.float32))
         for k, v in weights.items()}

    def wspec(key):
        dims = w[key].shape
        if len(dims) == 1:  # biases as (1, dim) rows
            w[key] = w[key][None, :]
            dims = w[key].shape
        return pl.BlockSpec(dims, lambda i: tuple(0 for _ in dims),
                            memory_space=pltpu.VMEM)

    wspecs = [wspec(k) for k in WEIGHT_KEYS]

    t = tb * l_pad
    tk = tb * le_pad
    xspec = pl.BlockSpec((t, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    base_specs = [
        xspec,
        pl.BlockSpec((tk, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]

    if fold:
        staticp = _pad3(static, n_pad, l_pad)
        static2 = staticp.reshape(n_pad * l_pad, h)
        lns = ln_scale.astype(jnp.float32)[None, :]
        lnb = ln_bias.astype(jnp.float32)[None, :]
        row_spec = pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
        enc_spec = base_specs[1]
        enc_ops = ((ke2, ve2) if pre_kv else (enc2,))
        out = pl.pallas_call(
            functools.partial(_kernel_fold, n_head=n_head, l_pad=l_pad,
                              le_pad=le_pad, causal=causal, ln_eps=ln_eps,
                              pre_kv=pre_kv),
            grid=(n_pad // tb,),
            in_specs=[xspec, xspec, row_spec, row_spec]
                     + [enc_spec] * len(enc_ops) + base_specs[2:] + wspecs,
            out_specs=pl.BlockSpec((t, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad * l_pad, h), out_dtype),
            name="fused_layer_fold",
            interpret=interpret,
        )(x2, static2, lns, lnb, *enc_ops, kp2, enc_kp2,
          *[w[k] for k in WEIGHT_KEYS])
    else:
        out = pl.pallas_call(
            functools.partial(_kernel, n_head=n_head, l_pad=l_pad, le_pad=le_pad,
                              causal=causal),
            grid=(n_pad // tb,),
            in_specs=base_specs + wspecs,
            out_specs=pl.BlockSpec((t, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad * l_pad, h), out_dtype),
            name="fused_layer",
            interpret=interpret,
        )(x2, enc2, kp2, enc_kp2, *[w[k] for k in WEIGHT_KEYS])

    return out.reshape(n_pad, l_pad, h)[:n, :l]


# ---------------------------------------------------------------------------
# Sparse-query variant: compute only K query positions per sequence
# ---------------------------------------------------------------------------
#
# Mask-predict re-predicts ONLY the re-masked slots each refinement iteration
# (reference algorithms.py:260-265) — at iteration t just ceil(len*(1-t/T))
# positions. The dense layer+projection still computes all L positions and
# throws most away. This variant shrinks the Q-side matmuls, the FFN, and the
# (H x V) vocab projection downstream by L/K while K/V cover the full canvas.
#
# Query selection happens IN-KERNEL from a one-hot matrix: every valid query
# slot is a re-masked position, so its raw word embedding is the constant
# <mask> row — only the static (position/category) features vary, and they
# are picked out exactly by a {0,1}-valued bf16 matmul on the MXU
# (sum selects a single bf16 product, which the f32 accumulator holds
# exactly). The previous design pre-gathered query rows in XLA; profiled on
# the v5e those lane-dimension take_along_axis gathers cost ~2-5 ms EACH per
# decode iteration — more than the matmuls they fed.


def _kernel_fold_qsub(sbd_ref, mrow_ref, x_ref, static_ref, lns_ref, lnb_ref,
                      *refs, n_head, k_pad, l_pad, le_pad, ln_eps,
                      pre_kv=False):
    if pre_kv:
        ke_ref, ve_ref, kp_ref, enc_kp_ref, *wrefs = refs
        enc_kv = (ke_ref[:], ve_ref[:])
    else:
        enc_ref, kp_ref, enc_kp_ref, *wrefs = refs
        enc_kv = None
    out_ref = wrefs[-1]
    weights = (wq_s, bq_s, wk_s, bk_s, wv_s, bv_s, wo_s, bo_s,
               wq_c, bq_c, wk_c, bk_c, wv_c, bv_c, wo_c, bo_c,
               wi, bi, wo2, bo2) = [r[:] for r in wrefs[:-1]]

    def ln(v):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) * (v - mu), axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + ln_eps) * lns_ref[:] + lnb_ref[:]

    sbd = sbd_ref[:]                                   # (Tq, T) bf16 one-hot
    npm_q = jnp.sum(sbd.astype(jnp.float32), axis=1, keepdims=True)
    # exact one-hot select of the static rows (0/1 weights, f32 accumulate)
    static_q = jnp.dot(sbd, static_ref[:], preferred_element_type=jnp.float32)
    xq = ln(mrow_ref[:].astype(jnp.float32) + static_q)
    x = ln(x_ref[:].astype(jnp.float32) + static_ref[:].astype(jnp.float32))

    kp = kp_ref[:][:, 0]
    att = _attend_2d(xq, x, kp, wq_s, bq_s, wk_s, bk_s,
                     wv_s, bv_s, wo_s, bo_s,
                     n_head=n_head, lq=k_pad, lk=l_pad)
    att = (att + xq) * npm_q

    cross = _attend_2d(att, None if pre_kv else enc_ref[:],
                       enc_kp_ref[:][:, 0],
                       wq_c, bq_c, wk_c, bk_c, wv_c, bv_c, wo_c, bo_c,
                       n_head=n_head, lq=k_pad, lk=le_pad, kv_pre=enc_kv)
    att = (cross + att) * npm_q

    inter = jnp.dot(att.astype(jnp.bfloat16), wi,
                    preferred_element_type=jnp.float32) + bi
    inter = _gelu_new(inter)
    down = jnp.dot(inter.astype(jnp.bfloat16), wo2,
                   preferred_element_type=jnp.float32) + bo2
    out_ref[:] = ((down + att) * npm_q).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "tb", "interpret",
                                             "ln_eps", "out_dtype"))
def fused_nar_decoder_layer_qsub(
        sel: jnp.ndarray, mask_row: jnp.ndarray, x: jnp.ndarray,
        static: jnp.ndarray, enc: jnp.ndarray, kp_mask: jnp.ndarray,
        weights: Dict[str, jnp.ndarray],
        ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
        n_head: int = 8, tb: int = 8, interpret: bool = False,
        ln_eps: float = 1e-5, out_dtype=jnp.float32,
        enc_kv=None) -> jnp.ndarray:
    """Sparse-query fused layer (embedding epilogue folded).

    sel: (N, K, L) one-hot query selection — sel[n, q, l] = 1 iff query slot
    q of row n predicts canvas position l; all-zero rows mark invalid
    (padding) query slots. Every selected position is re-masked, so its raw
    word embedding is ``mask_row`` (H,). x / static: (N, L, H) full-canvas
    raw embeddings / static features (keys/values); kp_mask: (N, L) True
    where the canvas token is PAD. ``enc_kv=(ke, ve)`` supplies hoisted
    bf16 cross K/V (see ``fused_nar_decoder_layer``); ``enc`` may then be
    None. Returns (N, K, H) hidden states — bit-identical to the dense
    kernel's rows at the selected positions (one-hot bf16 matmuls select
    exact values; LN/attention per-row math is row-independent).
    """
    n, k, l = sel.shape
    h = x.shape[-1]
    pre_kv = enc_kv is not None
    le = enc_kv[0].shape[1] if pre_kv else enc.shape[1]
    k_pad = _round_up(k, 8)
    l_pad = _round_up(l, 8)
    le_pad = _round_up(le, 8)
    n_pad = _round_up(n, tb)

    xp = _pad3(x, n_pad, l_pad)
    sp = _pad3(static, n_pad, l_pad)
    kp = _pad2(kp_mask, n_pad, l_pad)
    enc_kp_row = (jnp.arange(le_pad) >= le).astype(jnp.float32)
    enc_kp = jnp.broadcast_to(enc_kp_row[None, :], (n_pad, le_pad))

    # block-diagonal expansion: row (n, q) selects only columns of its own
    # sequence's slot within the tile (tb sequences per tile)
    selp = jnp.zeros((n_pad, k_pad, l_pad), jnp.bfloat16
                     ).at[:n, :k, :l].set(sel.astype(jnp.bfloat16))
    slot = jax.nn.one_hot(jnp.arange(n_pad) % tb, tb, dtype=jnp.bfloat16)
    sel_bd = (selp[:, :, None, :] * slot[:, None, :, None]).reshape(
        n_pad * k_pad, tb * l_pad)

    tq = tb * k_pad
    t = tb * l_pad
    tk = tb * le_pad
    x2 = xp.reshape(n_pad * l_pad, h)
    s2 = sp.reshape(n_pad * l_pad, h)
    if pre_kv:
        enc_ops = (_pad3(enc_kv[0], n_pad, le_pad).reshape(n_pad * le_pad, h),
                   _pad3(enc_kv[1], n_pad, le_pad).reshape(n_pad * le_pad, h))
    else:
        enc_ops = (_pad3(enc, n_pad, le_pad).reshape(n_pad * le_pad, h),)
    kp2 = kp.reshape(n_pad * l_pad, 1)
    enc_kp2 = enc_kp.reshape(n_pad * le_pad, 1)
    mrow = mask_row.astype(jnp.bfloat16)[None, :]

    w = {key: (v.astype(jnp.bfloat16) if v.ndim == 2 else v.astype(jnp.float32))
         for key, v in weights.items()}

    def wspec(key):
        dims = w[key].shape
        if len(dims) == 1:
            w[key] = w[key][None, :]
            dims = w[key].shape
        return pl.BlockSpec(dims, lambda i: tuple(0 for _ in dims),
                            memory_space=pltpu.VMEM)

    wspecs = [wspec(key) for key in WEIGHT_KEYS]
    lns = ln_scale.astype(jnp.float32)[None, :]
    lnb = ln_bias.astype(jnp.float32)[None, :]
    row_spec = pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((t, h), lambda i: (i, 0), memory_space=pltpu.VMEM)

    enc_spec = pl.BlockSpec((tk, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_fold_qsub, n_head=n_head, k_pad=k_pad,
                          l_pad=l_pad, le_pad=le_pad, ln_eps=ln_eps,
                          pre_kv=pre_kv),
        grid=(n_pad // tb,),
        in_specs=[pl.BlockSpec((tq, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  row_spec, xspec, xspec, row_spec, row_spec]
                 + [enc_spec] * len(enc_ops)
                 + [pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)]
                 + wspecs,
        out_specs=pl.BlockSpec((tq, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad * k_pad, h), out_dtype),
        name="fused_layer_qsub",
        interpret=interpret,
    )(sel_bd, mrow, x2, s2, lns, lnb, *enc_ops, kp2, enc_kp2,
      *[w[key] for key in WEIGHT_KEYS])

    return out.reshape(n_pad, k_pad, h)[:n, :k]


def hoist_cross_kv(enc, weights: Dict[str, jnp.ndarray]):
    """Pre-project the cross-attention K/V from enc_output.

    enc: (N, Le, H); returns (ke, ve) each (N, Le, H) bf16 with EXACTLY the
    kernel's arithmetic (bf16 operands, f32 accumulate, f32 bias add, bf16
    store — the in-kernel score/apply dots cast K/V to bf16 anyway, so
    passing these via ``enc_kv=`` is bit-identical to the in-kernel
    projection). The projection is invariant across refinement iterations
    and length-beam rows (reference bert.py cross-attention reads only
    enc_output), so one call replaces ~T*lbs in-kernel recomputes.
    """
    e16 = enc.astype(jnp.bfloat16)
    ke = (jnp.dot(e16, weights["wk_c"].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
          + weights["bk_c"].astype(jnp.float32)).astype(jnp.bfloat16)
    ve = (jnp.dot(e16, weights["wv_c"].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
          + weights["bv_c"].astype(jnp.float32)).astype(jnp.bfloat16)
    return ke, ve


# ---------------------------------------------------------------------------
# Weight extraction from the flax param tree
# ---------------------------------------------------------------------------


def layer_weights_from_params(layer_params: Dict) -> Dict[str, jnp.ndarray]:
    """Map a BertLayer flax param subtree to the kernel's weight dict."""
    def dense(p):
        return p["kernel"], p["bias"]

    att = layer_params["attention"]
    cross = layer_params["attend_to_enc_output"]
    out: Dict[str, jnp.ndarray] = {}
    for prefix, block in (("s", att), ("c", cross)):
        wq, bq = dense(block["self"]["query"])
        wk, bk = dense(block["self"]["key"])
        wv, bv = dense(block["self"]["value"])
        wo, bo = dense(block["output"]["dense"])
        out.update({
            "wq_%s" % prefix: wq, "bq_%s" % prefix: bq,
            "wk_%s" % prefix: wk, "bk_%s" % prefix: bk,
            "wv_%s" % prefix: wv, "bv_%s" % prefix: bv,
            "wo_%s" % prefix: wo, "bo_%s" % prefix: bo,
        })
    out["wi"], out["bi"] = dense(layer_params["intermediate"]["dense"])
    out["wo2"], out["bo2"] = dense(layer_params["output"]["dense"])
    return out
