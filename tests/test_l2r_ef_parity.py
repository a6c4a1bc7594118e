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
