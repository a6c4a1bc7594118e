"""Fused vocab projection + cross-entropy for the training step.

The train loss needs only TWO per-row scalars from the (N, V) vocab
projection (reference misc/crit.py:76-114): the log-softmax probability at
the label id (NLL + perplexity) and the argmax id (word accuracy). The XLA
path materializes the (B, L, V) logits through HBM and then sweeps them
repeatedly — forward max/sum-exp/gather passes plus a backward softmax
recompute and a (B, L, V) dlogits write feeding the dgrad/wgrad matmuls. At
the flagship train shape (B=2048, 2 visual-word passes, V≈10k) that [N, V]
elementwise traffic measured 13.8 ms/step with the projection matmuls paying
another ~26 ms (TRAIN_DECOMP.json, round 5).

This kernel keeps the logits in VMEM for their whole life:

* forward: one whole-V W-resident matmul per row tile; the max / argmax /
  sum-exp / label-gather epilogue runs on the tile in registers; only three
  (N,) vectors (label log-prob, argmax id, logsumexp residual) reach HBM.
* backward (custom VJP): recomputes the score tile, forms
  ``dscores = g * (onehot(label) - softmax)`` in VMEM, and immediately runs
  both backward matmuls in-kernel — ``dh = dscores @ W^T`` per tile and an
  f32 ``dW += h^T @ dscores`` accumulator carried across row tiles — so
  neither the logits nor dlogits ever exist in HBM.

Numerics: scores accumulate in f32 via ``preferred_element_type`` and the
label log-prob uses the exact ``(g - m) - log(sum exp(s - m))`` op order of
runtime.crit._label_logprob. W is pre-transposed once in XLA for the dgrad
matmul — a per-grid-step in-kernel transpose of the (d, V) tile is the one
Mosaic pattern this layout exists to avoid.

Whole-V tiles only (tv >= V, like ops/vocab_fused): W streams from HBM once
per call and the online-softmax accumulator never crosses tiles. Padded
vocab columns carry NEG_INF in the padded bias row, so they cannot win the
argmax, contribute to the sum-exp, or (exp(NEG_INF - z) == 0) leak into the
backward softmax.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_kernel(h_ref, w_ref, b_ref, lab_ref, g_ref, p_ref, z_ref):
    scores = jnp.dot(h_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32) + b_ref[:]
    m = jnp.max(scores, axis=-1, keepdims=True)
    pred = jnp.argmax(scores, axis=-1)[:, None].astype(jnp.int32)
    lse = jnp.log(jnp.sum(jnp.exp(scores - m), axis=-1, keepdims=True))
    sel = (jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
           == lab_ref[:])
    g = jnp.sum(jnp.where(sel, scores, 0.0), axis=-1, keepdims=True)
    g_ref[:] = (g - m) - lse
    p_ref[:] = pred
    z_ref[:] = m + lse


def _bwd_kernel(h_ref, w_ref, wt_ref, b_ref, lab_ref, z_ref, dg_ref,
                dh_ref, dw_ref, db_ref, *, cdt):
    i = pl.program_id(0)
    scores = jnp.dot(h_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32) + b_ref[:]
    # softmax from the saved logsumexp residual: exact recompute, and the
    # NEG_INF padded columns collapse to exp(-inf) == 0
    p = jnp.exp(scores - z_ref[:])
    sel = (jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
           == lab_ref[:])
    # d(label_logprob)/d(scores) = onehot - softmax; dg carries the loss
    # weighting (per-row -w_i * mask_i / B), zero at PAD/padded rows
    ds = (dg_ref[:] * (jnp.where(sel, 1.0, 0.0) - p)).astype(cdt)
    dh_ref[:] = jnp.dot(ds, wt_ref[:], preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dw_ref[:] = dw_ref[:] + jax.lax.dot_general(
        h_ref[:], ds, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] = db_ref[:] + jnp.sum(ds.astype(jnp.float32), axis=0,
                                    keepdims=True)


def _pad_operands(h, w, bias, labels, tn, cdt):
    n, d = h.shape
    v = w.shape[1]
    tn = min(tn, _round_up(max(n, 8), 8))
    n_pad = _round_up(max(n, 8), tn)
    v_pad = _round_up(v, 128)
    h_p = (h.astype(cdt) if n == n_pad else
           jnp.zeros((n_pad, d), cdt).at[:n].set(h.astype(cdt)))
    w_p = (w.astype(cdt) if v == v_pad else
           jnp.zeros((d, v_pad), cdt).at[:, :v].set(w.astype(cdt)))
    b_p = jnp.full((1, v_pad), NEG_INF, jnp.float32).at[0, :v].set(
        bias.astype(jnp.float32))
    l_p = jnp.zeros((n_pad, 1), jnp.int32).at[:n, 0].set(
        labels.astype(jnp.int32))
    return h_p, w_p, b_p, l_p, tn, n_pad, v_pad


def _fwd_call(h, w, bias, labels, *, tn, cdt, interpret):
    n, d = h.shape
    h_p, w_p, b_p, l_p, tn, n_pad, v_pad = _pad_operands(
        h, w, bias, labels, tn, cdt)
    grid = (n_pad // tn,)
    g, pred, z = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, v_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        name="vocab_ce_fwd",
        interpret=interpret,
    )(h_p, w_p, b_p, l_p)
    return g[:n, 0], pred[:n, 0], z


def _bwd_call(h, w, bias, labels, z_pad, dg, *, tn, cdt, interpret):
    n, d = h.shape
    v = w.shape[1]
    h_p, w_p, b_p, l_p, tn, n_pad, v_pad = _pad_operands(
        h, w, bias, labels, tn, cdt)
    wt_p = w_p.T  # one XLA transpose per step, not one per grid tile
    dg_p = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(
        dg.astype(jnp.float32))
    grid = (n_pad // tn,)
    dh, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, cdt=cdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, v_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, v_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((d, v_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, v_pad), jnp.float32),
        ],
        name="vocab_ce_bwd",
        interpret=interpret,
    )(h_p, w_p, wt_p, b_p, l_p, z_pad, dg_p)
    return dh[:n], dw[:, :v], db[0, :v]


@functools.lru_cache(maxsize=None)
def _get_ce_fn(tn: int, cdt_name: str, interpret: bool):
    cdt = jnp.dtype(cdt_name)

    @jax.custom_vjp
    def ce(h, w, bias, labels):
        g, pred, _ = _fwd_call(h, w, bias, labels, tn=tn, cdt=cdt,
                               interpret=interpret)
        return g, pred

    def fwd_rule(h, w, bias, labels):
        g, pred, z_pad = _fwd_call(h, w, bias, labels, tn=tn, cdt=cdt,
                                   interpret=interpret)
        return (g, pred), (h, w, bias, labels, z_pad)

    def bwd_rule(res, cts):
        h, w, bias, labels, z_pad = res
        dg, _ = cts  # pred is int32: its cotangent is symbolic-zero float0
        dh, dw, db = _bwd_call(h, w, bias, labels, z_pad, dg,
                               tn=tn, cdt=cdt, interpret=interpret)
        dlab = np.zeros(labels.shape, jax.dtypes.float0)
        return (dh.astype(h.dtype), dw.astype(w.dtype),
                db.astype(bias.dtype), dlab)

    ce.defvjp(fwd_rule, bwd_rule)
    return ce


def vocab_ce_train(hidden: jnp.ndarray, w: jnp.ndarray,
                   bias: Optional[jnp.ndarray], labels: jnp.ndarray, *,
                   tn: int = 256, compute_dtype=jnp.bfloat16,
                   interpret: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (label log-prob, argmax id) of softmax(hidden @ w + bias).

    hidden: (..., D) decoder output; w: (D, V); bias: (V,) f32 or None (the
    tied projection has one, reference seq2seq.py:27-33; untied is
    bias-free); labels: (...,) int ids aligned with hidden rows.

    Returns (label_logprob (...,) f32, pred (...,) int32) with gradients
    flowing to hidden, w, and bias through the in-kernel backward. PAD/label
    masking stays with the caller: masked rows simply receive a zero
    cotangent, which zeroes their dscores tile rows in the backward.
    """
    lead = hidden.shape[:-1]
    d = hidden.shape[-1]
    v = w.shape[1]
    if bias is None:
        bias = jnp.zeros((v,), jnp.float32)
    h2 = hidden.reshape(-1, d)
    lab = labels.reshape(-1)
    fn = _get_ce_fn(int(tn), jnp.dtype(compute_dtype).name, bool(interpret))
    g, pred = fn(h2, w, bias, lab)
    return g.reshape(lead), pred.reshape(lead)


def reference_ce(hidden, w, bias, labels):
    """jnp reference for tests: full (N, V) materialization."""
    logits = hidden.astype(jnp.float32) @ w.astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    lp = jax.nn.log_softmax(logits, axis=-1)
    g = jnp.take_along_axis(lp, labels[..., None].astype(jnp.int32),
                            axis=-1)[..., 0]
    return g, jnp.argmax(logits, axis=-1).astype(jnp.int32)
