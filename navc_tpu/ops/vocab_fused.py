"""Pallas-fused vocab projection + online-softmax argmax/gather.

The NAR refinement hot loop needs only three scalars per token position from
the vocab projection (reference algorithms.py:7-15 generate_step_with_prob):
the argmax token id, its softmax probability, and (for teacher rescoring,
algorithms.py:196-200) the probability of a given token. Materializing the
full (N, V) logits through HBM to compute them costs ~N*V*4 bytes of write +
read per forward — the dominant HBM traffic of the whole decode at
V ≈ 10k.

This kernel streams vocab tiles through VMEM with an online-softmax running
(max, sum-exp, argmax[, target-logit]) accumulator, so the logits never touch
HBM. FLOPs run on the MXU via jnp.dot with f32 accumulation.

Layout: grid (N/TN, V/TV); the vocab axis is innermost so accumulators in
VMEM scratch carry across vocab tiles of the same token tile.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(h_ref, w_ref, *refs, tv: int, has_bias: bool):
    if has_bias:
        b_ref, ids_ref, maxp_ref, m_scr, s_scr, amax_scr = refs
    else:
        ids_ref, maxp_ref, m_scr, s_scr, amax_scr = refs
    j = pl.program_id(1)
    scores = jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    if has_bias:
        # (1, TV) broadcast — tied-projection bias. Padded vocab columns
        # (when V is not a TV multiple) carry NEG_INF in the padded bias, so
        # they can never win the argmax nor contribute to the sum-exp — this
        # replaces a per-tile iota/compare/where masking pass (three VPU
        # passes over every (TN, TV) tile, since real vocabs are never
        # lane-tile aligned: 10048 = 64*157) with zero extra work.
        scores = scores + b_ref[:]
    tile_max = jnp.max(scores, axis=-1, keepdims=True)           # (TN, 1)
    tile_arg = (jnp.argmax(scores, axis=-1)[:, None] + j * tv)   # (TN, 1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = tile_max
        s_scr[:] = jnp.sum(jnp.exp(scores - tile_max), axis=-1, keepdims=True)
        amax_scr[:] = tile_arg.astype(jnp.int32)

    @pl.when(j > 0)
    def _update():
        m_old = m_scr[:]
        new_m = jnp.maximum(m_old, tile_max)
        s_scr[:] = (s_scr[:] * jnp.exp(m_old - new_m)
                    + jnp.sum(jnp.exp(scores - new_m), axis=-1, keepdims=True))
        better = tile_max > m_old
        amax_scr[:] = jnp.where(better, tile_arg.astype(jnp.int32), amax_scr[:])
        m_scr[:] = new_m

    @pl.when(j == pl.num_programs(1) - 1)
    def _finish():
        ids_ref[:] = amax_scr[:]
        maxp_ref[:] = 1.0 / s_scr[:]  # max prob = exp(m - m) / sum-exp


@functools.partial(jax.jit, static_argnames=("tn", "tv", "interpret"))
def fused_project_argmax(h: jnp.ndarray, w: jnp.ndarray,
                         bias: Optional[jnp.ndarray] = None,
                         tn: int = 128, tv: int = 10240,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """argmax ids + max softmax prob of h @ w (+ bias) without logits in HBM.

    h: (N, D) activations; w: (D, V) projection; bias: optional (V,) f32 —
    the tied-projection path (reference seq2seq.py:27-33) projects through
    the transposed embedding table WITH a bias. Returns (ids (N,) int32,
    max_prob (N,) float32). Matmul runs in bf16 with f32 accumulation.

    Default tiles (tn=128, tv=10240) are the round-5 live-TPU sweep winner
    at the flagship dense CT/completion shape, 49152x512x10048
    (KERNEL_BENCH.json: 4.73 ms, 107 TFLOP/s — at the raw bf16-dot rate, so
    the argmax epilogue is fully hidden). tv >= V makes the vocab grid
    one step: the (d, tv) W block index is constant across row steps, so
    Mosaic streams W from HBM once per call instead of once per row tile,
    and the online-softmax accumulator never crosses tiles. tn=1024 and
    non-whole-V wide tiles spill or crash Mosaic (see `rejected` section) —
    resweep before touching these.
    """
    n, d = h.shape
    d2, v = w.shape
    assert d == d2
    # shrink the row tile to the (8-aligned) batch so small calls — sparse
    # qsub refinement steps, B=1 latency decodes — don't pay for a
    # mostly-padding vocab matmul
    tn = min(tn, _round_up(max(n, 8), 8))
    n_pad = _round_up(max(n, 8), tn)
    v_pad = _round_up(v, tv)
    h_p = (h.astype(jnp.bfloat16) if n == n_pad else
           jnp.zeros((n_pad, d), jnp.bfloat16).at[:n].set(h.astype(jnp.bfloat16)))
    w_p = jnp.zeros((d, v_pad), jnp.bfloat16).at[:, :v].set(w.astype(jnp.bfloat16))
    # a NEG_INF-padded bias row masks the padded vocab columns for free;
    # synthesized even without a user bias whenever padding exists
    has_bias = bias is not None or v_pad != v
    inputs = [h_p, w_p]
    in_specs = [
        pl.BlockSpec((tn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, tv), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        b_p = jnp.full((1, v_pad), NEG_INF, jnp.float32).at[0, :v].set(
            jnp.zeros((v,), jnp.float32) if bias is None
            else bias.astype(jnp.float32))
        inputs.append(b_p)
        in_specs.append(
            pl.BlockSpec((1, tv), lambda i, j: (0, j), memory_space=pltpu.VMEM))

    grid = (n_pad // tn, v_pad // tv)
    ids, maxp = pl.pallas_call(
        functools.partial(_kernel, tv=tv, has_bias=has_bias),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tn, 1), jnp.float32),
            pltpu.VMEM((tn, 1), jnp.float32),
            pltpu.VMEM((tn, 1), jnp.int32),
        ],
        name="vocab_argmax",
        interpret=interpret,
    )(*inputs)

    return ids[:n, 0], maxp[:n, 0]


def _gather_kernel(h_ref, w_ref, tgt_ref, *refs, tv: int, has_bias: bool):
    if has_bias:
        b_ref, prob_ref, m_scr, s_scr, g_scr = refs
    else:
        prob_ref, m_scr, s_scr, g_scr = refs
    j = pl.program_id(1)
    scores = jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    if has_bias:
        scores = scores + b_ref[:]  # padded columns masked via NEG_INF bias
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + j * tv

    tile_max = jnp.max(scores, axis=-1, keepdims=True)
    tsel = col == tgt_ref[:]  # (TN, TV) one-hot of the target id
    tl = jnp.sum(jnp.where(tsel, scores, 0.0), axis=-1, keepdims=True)
    has = jnp.any(tsel, axis=-1, keepdims=True)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = tile_max
        s_scr[:] = jnp.sum(jnp.exp(scores - tile_max), axis=-1, keepdims=True)
        g_scr[:] = jnp.where(has, tl, NEG_INF)

    @pl.when(j > 0)
    def _update():
        m_old = m_scr[:]
        new_m = jnp.maximum(m_old, tile_max)
        s_scr[:] = (s_scr[:] * jnp.exp(m_old - new_m)
                    + jnp.sum(jnp.exp(scores - new_m), axis=-1, keepdims=True))
        g_scr[:] = jnp.where(has, tl, g_scr[:])
        m_scr[:] = new_m

    @pl.when(j == pl.num_programs(1) - 1)
    def _finish():
        # prob(target) = exp(logit_t - m) / sum-exp
        prob_ref[:] = jnp.exp(g_scr[:] - m_scr[:]) / s_scr[:]


@functools.partial(jax.jit, static_argnames=("tn", "tv", "interpret"))
def fused_project_gather_prob(h: jnp.ndarray, w: jnp.ndarray,
                              targets: jnp.ndarray,
                              bias: Optional[jnp.ndarray] = None,
                              tn: int = 128, tv: int = 10240,
                              interpret: bool = False) -> jnp.ndarray:
    """softmax(h @ w (+ bias))[i, targets[i]] without materializing logits.

    The AR-teacher rescoring gather (reference algorithms.py:196-200).
    h: (N, D); w: (D, V); targets: (N,) int32; bias: optional (V,) f32
    (tied projection). Returns (N,) f32 probs.

    Default tiles (128, 10240): whole-V W-resident, round-5 sweep winner
    (KERNEL_BENCH.json gatherp_tn128_tv10240 4.83 ms at 49152x512x10048).
    """
    n, d = h.shape
    v = w.shape[1]
    tn = min(tn, _round_up(max(n, 8), 8))  # small calls: one exact row tile
    n_pad = _round_up(max(n, 8), tn)
    v_pad = _round_up(v, tv)
    h_p = (h.astype(jnp.bfloat16) if n == n_pad else
           jnp.zeros((n_pad, d), jnp.bfloat16).at[:n].set(h.astype(jnp.bfloat16)))
    w_p = jnp.zeros((d, v_pad), jnp.bfloat16).at[:, :v].set(w.astype(jnp.bfloat16))
    t_p = jnp.zeros((n_pad, 1), jnp.int32).at[:n, 0].set(targets.astype(jnp.int32))
    has_bias = bias is not None or v_pad != v
    inputs = [h_p, w_p, t_p]
    in_specs = [
        pl.BlockSpec((tn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, tv), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        b_p = jnp.full((1, v_pad), NEG_INF, jnp.float32).at[0, :v].set(
            jnp.zeros((v,), jnp.float32) if bias is None
            else bias.astype(jnp.float32))
        inputs.append(b_p)
        in_specs.append(
            pl.BlockSpec((1, tv), lambda i, j: (0, j), memory_space=pltpu.VMEM))

    grid = (n_pad // tn, v_pad // tv)
    prob = pl.pallas_call(
        functools.partial(_gather_kernel, tv=tv, has_bias=has_bias),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tn, 1), jnp.float32),
            pltpu.VMEM((tn, 1), jnp.float32),
            pltpu.VMEM((tn, 1), jnp.float32),
        ],
        name="vocab_gather_prob",
        interpret=interpret,
    )(*inputs)
    return prob[:n, 0]


def _topk_kernel(h_ref, w_ref, *refs, tv: int, k: int, has_bias: bool):
    if has_bias:
        b_ref, wp_ref, ids_ref, m_scr, s_scr, tv_scr, ti_scr = refs
    else:
        wp_ref, ids_ref, m_scr, s_scr, tv_scr, ti_scr = refs
    j = pl.program_id(1)
    scores = jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    if has_bias:
        scores = scores + b_ref[:]  # padded columns masked via NEG_INF bias

    tile_max = jnp.max(scores, axis=-1, keepdims=True)
    s_tile = jnp.sum(jnp.exp(scores - tile_max), axis=-1, keepdims=True)

    # tile-local top-k by iterative extraction: argmax picks the FIRST max,
    # so ties resolve lowest-vocab-id-first — lax.top_k's order exactly
    lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    vals = scores
    t_vals, t_ids = [], []
    for _ in range(k):
        mx = jnp.max(vals, axis=-1, keepdims=True)
        am = jnp.argmax(vals, axis=-1)[:, None].astype(jnp.int32)
        t_vals.append(mx)
        t_ids.append(am + j * tv)
        vals = jnp.where(lane == am, NEG_INF, vals)
    tile_v = jnp.concatenate(t_vals, axis=-1)  # (TN, k) descending
    tile_i = jnp.concatenate(t_ids, axis=-1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = tile_max
        s_scr[:] = s_tile
        tv_scr[:] = tile_v
        ti_scr[:] = tile_i

    @pl.when(j > 0)
    def _update():
        m_old = m_scr[:]
        new_m = jnp.maximum(m_old, tile_max)
        s_scr[:] = (s_scr[:] * jnp.exp(m_old - new_m)
                    + s_tile * jnp.exp(tile_max - new_m))
        m_scr[:] = new_m
        # merge running top-k (earlier tiles = lower vocab ids, placed first
        # so equal values keep lax.top_k's lowest-index tie order)
        cv = jnp.concatenate([tv_scr[:], tile_v], axis=-1)  # (TN, 2k)
        ci = jnp.concatenate([ti_scr[:], tile_i], axis=-1)
        cl = jax.lax.broadcasted_iota(jnp.int32, cv.shape, 1)
        nv, ni = [], []
        for _ in range(k):
            mx = jnp.max(cv, axis=-1, keepdims=True)
            am = jnp.argmax(cv, axis=-1)[:, None].astype(jnp.int32)
            pick = cl == am
            nv.append(mx)
            ni.append(jnp.sum(jnp.where(pick, ci, 0), axis=-1, keepdims=True))
            cv = jnp.where(pick, NEG_INF, cv)
        tv_scr[:] = jnp.concatenate(nv, axis=-1)
        ti_scr[:] = jnp.concatenate(ni, axis=-1)

    @pl.when(j == pl.num_programs(1) - 1)
    def _finish():
        # normalized log-probs: (logit - max) - log(sum-exp). The online
        # rescaled sum-exp can differ from a one-pass sum by ~1 ulp — a
        # per-row constant, so within-row order is untouched
        wp_ref[:] = (tv_scr[:] - m_scr[:]) - jnp.log(s_scr[:])
        ids_ref[:] = ti_scr[:]


@functools.partial(jax.jit, static_argnames=("k", "tn", "tv", "interpret"))
def fused_project_topk(h: jnp.ndarray, w: jnp.ndarray,
                       k: int,
                       bias: Optional[jnp.ndarray] = None,
                       tn: int = 512, tv: int = 2048,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row top-k of log_softmax(h @ w (+ bias)) without logits in HBM.

    The AR beam step needs only the k best token log-probs per beam row
    (reference models/Beam.py:68-79 takes topk(beam_size) of the word
    probs); materializing (N, V) logits for lax.top_k costs two full HBM
    passes. Returns (logprobs (N, k) f32 descending, ids (N, k) int32),
    tie order identical to lax.top_k (lowest vocab id first).
    """
    n, d = h.shape
    v = w.shape[1]
    tn = min(tn, _round_up(max(n, 8), 8))  # small calls: one exact row tile
    n_pad = _round_up(max(n, 8), tn)
    v_pad = _round_up(v, tv)
    h_p = (h.astype(jnp.bfloat16) if n == n_pad else
           jnp.zeros((n_pad, d), jnp.bfloat16).at[:n].set(h.astype(jnp.bfloat16)))
    w_p = jnp.zeros((d, v_pad), jnp.bfloat16).at[:, :v].set(w.astype(jnp.bfloat16))
    has_bias = bias is not None or v_pad != v
    inputs = [h_p, w_p]
    in_specs = [
        pl.BlockSpec((tn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, tv), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        b_p = jnp.full((1, v_pad), NEG_INF, jnp.float32).at[0, :v].set(
            jnp.zeros((v,), jnp.float32) if bias is None
            else bias.astype(jnp.float32))
        inputs.append(b_p)
        in_specs.append(
            pl.BlockSpec((1, tv), lambda i, j: (0, j), memory_space=pltpu.VMEM))

    grid = (n_pad // tn, v_pad // tv)
    wp, ids = pl.pallas_call(
        functools.partial(_topk_kernel, tv=tv, k=k, has_bias=has_bias),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tn, 1), jnp.float32),
            pltpu.VMEM((tn, 1), jnp.float32),
            pltpu.VMEM((tn, k), jnp.float32),
            pltpu.VMEM((tn, k), jnp.int32),
        ],
        name="vocab_topk",
        interpret=interpret,
    )(*inputs)
    return wp[:n], ids[:n]


def reference_project_argmax(h, w):
    """jnp reference for tests: full materialization."""
    logits = (h.astype(jnp.float32) @ w.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.argmax(probs, -1).astype(jnp.int32), jnp.max(probs, -1)


def projection_weights(cfg, params):
    """(w (D, V), bias (V,) or None) for the vocab projection.

    Untied: the bias-free tgt_word_prj kernel. Tied (reference
    seq2seq.py:27-33): the transposed decoder embedding table plus the
    standalone tied bias — both fused kernels accept the bias operand.
    """
    if cfg.tie_weights:
        table = jnp.asarray(
            params["decoder"]["embedding"]["word_embeddings"]["embedding"])
        return table.T, jnp.asarray(params["tgt_word_prj_bias"])
    return jnp.asarray(params["tgt_word_prj"]["kernel"]), None
