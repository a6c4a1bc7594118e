"""Attention-mask builders and NAR input-enhancement resampling.

Capability parity with reference models/Decoder.py:9-54, rewritten as
static-shape vectorized jnp (the reference's per-row Python loop in
``resampling`` becomes a batched gather).

Convention: boolean masks where True = position is masked OUT (matches the
reference's uint8/bool masks fed to masked_fill).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C


def non_pad_mask(seq: jnp.ndarray) -> jnp.ndarray:
    """(B, L) ids -> (B, L, 1) float mask, 1.0 where not PAD.

    Reference models/Decoder.py:9-11.
    """
    return (seq != C.PAD).astype(jnp.float32)[..., None]


def key_pad_mask(seq_k: jnp.ndarray, len_q: int) -> jnp.ndarray:
    """(B, Lk) key ids -> (B, Lq, Lk) bool mask, True where key is PAD.

    Reference models/Decoder.py:13-21.
    """
    pad = (seq_k == C.PAD)  # (B, Lk)
    return jnp.broadcast_to(pad[:, None, :], (seq_k.shape[0], len_q, seq_k.shape[1]))


def subsequent_mask(batch: int, len_s: int, watch: int = 0) -> jnp.ndarray:
    """(B, L, L) causal mask, True above the diagonal.

    ``watch`` > 0 additionally masks positions more than ``watch`` steps in the
    past (reference models/Decoder.py:23-39).
    """
    i = jnp.arange(len_s)[:, None]
    j = jnp.arange(len_s)[None, :]
    m = j > i
    if watch != 0 and len_s >= watch:
        assert watch > 0
        m = m | (j <= i - watch)
    return jnp.broadcast_to(m[None, :, :], (batch, len_s, len_s))


def self_mask_diag(seq: jnp.ndarray) -> jnp.ndarray:
    """Key-pad mask + diagonal self-mask (reference models/Decoder.py:108-121).

    Used by the 'SelfMask' decoding type where position i may not attend to
    itself.
    """
    b, l = seq.shape
    kp = key_pad_mask(seq, l)
    diag = jnp.eye(l, dtype=bool)
    return kp | diag[None, :, :]


def enc_attention_mask(enc_output: jnp.ndarray, len_q: int) -> jnp.ndarray:
    """Cross-attention mask over encoder positions.

    The reference builds it from an all-ones src_seq (models/Decoder.py:127-128)
    so nothing is ever masked; we keep the same semantics with a constant
    False mask (XLA folds it away).
    """
    b, lk = enc_output.shape[0], enc_output.shape[1]
    return jnp.zeros((b, len_q, lk), dtype=bool)


def resample_enc_output(enc_output: jnp.ndarray, tgt_tokens: jnp.ndarray) -> jnp.ndarray:
    """NAR enhance_input == 1: stretch enc_output onto the token grid.

    Vectorized equivalent of reference models/Decoder.py:41-54: for each row i
    with non-pad length ``len_i``, position j reads
    ``enc_output[i, min(floor(j * T / len_i), T - 1)]``.
    """
    b, l = tgt_tokens.shape
    t = enc_output.shape[1]
    lengths = (tgt_tokens != C.PAD).sum(-1)  # (B,)
    scale = t / jnp.maximum(lengths, 1).astype(jnp.float32)  # (B,)
    idx = (jnp.arange(l, dtype=jnp.float32)[None, :] * scale[:, None]).astype(jnp.int32)
    idx = jnp.minimum(idx, t - 1)  # (B, L)
    return jnp.take_along_axis(enc_output, idx[:, :, None], axis=1)


def meanpool_enc_output(enc_output: jnp.ndarray, len_q: int) -> jnp.ndarray:
    """NAR enhance_input == 2: broadcast the temporal mean over the token grid
    (reference models/Decoder.py:137)."""
    pooled = enc_output.mean(axis=1, keepdims=True)
    return jnp.broadcast_to(pooled, (enc_output.shape[0], len_q, enc_output.shape[2]))
