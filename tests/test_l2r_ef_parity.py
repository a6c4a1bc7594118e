"""Token-exact parity: Left2Right and EasyFirst vs NumPy reference ports."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import np_reference as ref
from navc_tpu.config import default_config
from navc_tpu.decoding.length_beam import build_canvas, enlarge, predict_length_beam
from navc_tpu.decoding.mask_predict import (
    NARContext, _easy_first, _left2right, _predict_fn)
from navc_tpu.models import build_model, init_params

from test_decoding_parity import make_np_predict, setup_model, small_cfg


@pytest.mark.parametrize("use_ct,q", [(False, 1), (False, 2), (True, 2)])
def test_left2right_parity(use_ct, q):
    method = "NACF" if use_ct else "NAB"
    cfg = small_cfg(method).replace(paradigm="l2r", q=q, q_iterations=1, use_ct=use_ct)
    model, variables, enc = setup_model(cfg)

    lbs = cfg.length_beam_size
    beam = predict_length_beam(enc["pred_length"], lbs, 0, cfg.max_len)
    tokens, pad_mask, lengths = build_canvas(beam, cfg.max_len)
    enc_tiled = enlarge(enc["enc_output"], lbs)

    ctx = NARContext(enc_tiled, None, None, None, None)
    predict = _predict_fn(model, variables, ctx)
    jax_tokens, jax_lprobs = _left2right(predict, None, tokens, pad_mask, lengths, cfg)

    np_predict = make_np_predict(model, variables, enc_tiled)
    ref_tokens, ref_lprobs = ref.np_left2right(
        np_predict, None, np.asarray(tokens), np.asarray(pad_mask),
        np.asarray(lengths), q, cfg.q_iterations, use_ct)

    np.testing.assert_array_equal(np.asarray(jax_tokens), ref_tokens)
    np.testing.assert_allclose(np.asarray(jax_lprobs), ref_lprobs,
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("use_ct,q", [(False, 1), (True, 3)])
def test_easy_first_parity(use_ct, q):
    method = "NACF" if use_ct else "NAB"
    cfg = small_cfg(method).replace(paradigm="ef", q=q, q_iterations=1, use_ct=use_ct)
    model, variables, enc = setup_model(cfg)

    lbs = cfg.length_beam_size
    beam = predict_length_beam(enc["pred_length"], lbs, 0, cfg.max_len)
    tokens, pad_mask, lengths = build_canvas(beam, cfg.max_len)
    enc_tiled = enlarge(enc["enc_output"], lbs)

    ctx = NARContext(enc_tiled, None, None, None, None)
    predict = _predict_fn(model, variables, ctx)
    jax_tokens, jax_lprobs = _easy_first(predict, None, tokens, pad_mask, lengths, cfg)

    np_predict = make_np_predict(model, variables, enc_tiled)
    ref_tokens, ref_lprobs = ref.np_easy_first(
        np_predict, None, np.asarray(tokens), np.asarray(pad_mask),
        np.asarray(lengths), q, cfg.q_iterations, use_ct)

    np.testing.assert_array_equal(np.asarray(jax_tokens), ref_tokens)
    np.testing.assert_allclose(np.asarray(jax_lprobs), ref_lprobs,
                               rtol=5e-3, atol=5e-3)


def test_left2right_zero_refinement_iterations():
    """translate --default sets q_iterations=0 without CT (translate.py:143)."""
    cfg = small_cfg("NAB").replace(paradigm="l2r", q=1, q_iterations=0)
    model, variables, enc = setup_model(cfg)
    lbs = cfg.length_beam_size
    beam = predict_length_beam(enc["pred_length"], lbs, 0, cfg.max_len)
    tokens, pad_mask, lengths = build_canvas(beam, cfg.max_len)
    enc_tiled = enlarge(enc["enc_output"], lbs)
    ctx = NARContext(enc_tiled, None, None, None, None)
    predict = _predict_fn(model, variables, ctx)
    jax_tokens, _ = _left2right(predict, None, tokens, pad_mask, lengths, cfg)

    np_predict = make_np_predict(model, variables, enc_tiled)
    ref_tokens, _ = ref.np_left2right(
        np_predict, None, np.asarray(tokens), np.asarray(pad_mask),
        np.asarray(lengths), 1, 0, False)
    np.testing.assert_array_equal(np.asarray(jax_tokens), ref_tokens)


def test_easy_first_mask_repredicting_model():
    """A model that argmax-predicts <mask> into a revealed slot forces the
    reference reveal loop past ceil(max_len/q) rounds before its global
    stall guard fires (algorithms.py:382-389) — the while_loop port must
    reproduce the exact same termination, leaving the stubborn slot as a
    literal <mask> with its probability updated."""
    from navc_tpu import constants as C

    cfg = small_cfg("NAB").replace(paradigm="ef", q=2, q_iterations=0,
                                   use_ct=False)
    max_len = cfg.max_len
    lengths = np.asarray([max_len - 1, 5, max_len - 1], np.int32)
    pad_mask_np = np.arange(max_len)[None, :] >= lengths[:, None]
    tokens_np = np.where(pad_mask_np, C.PAD, C.MASK).astype(np.int32)

    cols = np.arange(max_len)
    ids_row = np.where(cols == 0, C.MASK, 6 + cols).astype(np.int32)
    probs_row = np.where(cols == 0, 0.9, 0.5 / (cols + 1.0)).astype(np.float32)

    def rig_predict_jax(tokens):
        n = tokens.shape[0]
        return (jnp.broadcast_to(jnp.asarray(ids_row), (n, max_len)),
                jnp.broadcast_to(jnp.asarray(probs_row), (n, max_len)))

    def rig_predict_np(tokens):
        n = tokens.shape[0]
        return (np.broadcast_to(ids_row, (n, max_len)).copy(),
                np.broadcast_to(probs_row, (n, max_len)).copy())

    jax_tokens, jax_lprobs = _easy_first(
        rig_predict_jax, None, jnp.asarray(tokens_np),
        jnp.asarray(pad_mask_np), jnp.asarray(lengths), cfg)
    ref_tokens, ref_lprobs = ref.np_easy_first(
        rig_predict_np, None, tokens_np.copy(), pad_mask_np,
        lengths, cfg.q, cfg.q_iterations, False)

    # the stubborn slot survives as a literal <mask> on both sides
    assert (ref_tokens[:, 0] == C.MASK).all()
    np.testing.assert_array_equal(np.asarray(jax_tokens), ref_tokens)
    np.testing.assert_allclose(np.asarray(jax_lprobs), ref_lprobs,
                               rtol=1e-6, atol=1e-6)
