"""Length-beam construction for NAR decoding.

Capability parity with reference decoding/na_generate.py:116-135 and the
canvas construction at na_generate.py:39-50, with one TPU-first change: the
canvas length is the **static** ``cfg.max_len`` instead of the batch-dependent
``beam.max().item()`` (a host sync, na_generate.py:37). Positions past each
beam's length are PAD everywhere, so results are identical while shapes stay
static for jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .. import constants as C


def predict_length_beam(pred_length: jnp.ndarray, length_beam_size: int,
                        length_bias: int, max_len: int,
                        gold_target_len: jnp.ndarray = None) -> jnp.ndarray:
    """Top-k predicted lengths, clamped to [4, max_len - 1].

    pred_length: (B, max_len) log-probs from the length head.
    Returns (B, length_beam_size) int32 lengths in descending-probability
    order (reference na_generate.py:123, 130-132). With ``gold_target_len``
    the beam is centered on the gold length instead
    (na_generate.py:117-121, the load_generated_captions path).
    """
    if gold_target_len is not None:
        starts = gold_target_len.astype(jnp.int32) - (length_beam_size - 1) // 2
        beam = starts[:, None] + jnp.arange(length_beam_size, dtype=jnp.int32)[None, :]
    else:
        _, idx = jax.lax.top_k(pred_length, length_beam_size)
        beam = idx.astype(jnp.int32) + length_bias
    return jnp.clip(beam, 4, max_len - 1)


def build_canvas(beam: jnp.ndarray, max_len: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All-<mask> canvases with PAD tails per length beam.

    beam: (B, lbs) lengths. Returns:
      tokens   (B*lbs, max_len) int32 — MASK where pos < len else PAD,
      pad_mask (B*lbs, max_len) bool  — True at PAD tail,
      lengths  (B*lbs,) int32.
    Reference na_generate.py:39-50 via the triu length_mask.
    """
    b, lbs = beam.shape
    lengths = beam.reshape(b * lbs)
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    pad_mask = pos >= lengths[:, None]
    tokens = jnp.where(pad_mask, C.PAD, C.MASK).astype(jnp.int32)
    return tokens, pad_mask, lengths


def enlarge(x: jnp.ndarray, beam_size: int) -> jnp.ndarray:
    """Tile rows beam_size times: (B, ...) -> (B*beam_size, ...).

    Row-major repeat matching reference misc/utils.py:205-229
    (unsqueeze(1).repeat(...).view(B*beam, ...)).
    """
    return jnp.repeat(x, beam_size, axis=0)


def select_best_length_beam(hypotheses: jnp.ndarray, lprobs: jnp.ndarray,
                            lengths: jnp.ndarray, bsz: int, lbs: int,
                            beam_alpha: float):
    """Pick the best length beam by sum(lprobs) / len**alpha.

    Reference na_generate.py:66-77. Returns (best hypotheses (B, L),
    best beam index (B,)) — the index feeds the candidate-collection gather
    so both consumers share one scoring formula.
    """
    max_len = hypotheses.shape[-1]
    hyp = hypotheses.reshape(bsz, lbs, max_len)
    lp = lprobs.reshape(bsz, lbs, max_len)
    lens = lengths.reshape(bsz, lbs).astype(jnp.float32)
    avg = lp.sum(-1) / jnp.power(lens, beam_alpha)
    best = jnp.argmax(avg, axis=-1)  # (B,)
    return (jnp.take_along_axis(hyp, best[:, None, None], axis=1)[:, 0, :],
            best)
