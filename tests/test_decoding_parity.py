"""Parity tests: on-device decoding vs NumPy ports of the reference semantics.

Both sides are driven by the *same* real model forward, so any divergence is
in the algorithm logic, not the network.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import np_reference as ref
from navc_tpu import constants as C
from navc_tpu.config import default_config
from navc_tpu.decoding.beam import make_ar_generator
from navc_tpu.decoding.length_beam import (
    build_canvas, enlarge, predict_length_beam, select_best_length_beam)
from navc_tpu.decoding.mask_predict import (
    NARContext, _mask_predict, _predict_fn, _teacher_score_fn, make_nar_generator)
from navc_tpu.models import build_model, init_params


def small_cfg(method="NAB", **kw):
    over = dict(
        vocab_size=30, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, dim_i=12, dim_m=10, modality="mi",
        max_len=10, batch_size=2, length_beam_size=3, iterations=3,
        compute_dtype="float32",
    )
    over.update(kw)
    return default_config(method, dataset="MSVD", **over)


def setup_model(cfg, seed=0):
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(seed), cfg)
    feats = [np.random.RandomState(seed + 1).randn(2, cfg.n_frames, d).astype(np.float32)
             for d in cfg.modality_dims]
    enc = model.apply(variables, [jnp.array(f) for f in feats],
                      method=lambda m, f: m.encode(f, deterministic=True))
    return model, variables, enc


def make_np_predict(model, variables, enc_tiled, category=None):
    """NAR predict closure shared by the NumPy reference port."""

    @jax.jit
    def _pred(tokens):
        lp, _ = model.apply(
            variables, tokens, enc_tiled, category, "NARFormer", True,
            method=lambda m, *a: m.decode_logprobs(*a))
        probs = jnp.exp(lp)
        return jnp.argmax(probs, -1).astype(jnp.int32), jnp.max(probs, -1)

    def predict(tokens_np):
        ids, probs = _pred(jnp.asarray(tokens_np))
        return np.asarray(ids), np.asarray(probs, np.float64).astype(np.float64)

    return predict


def test_length_beam_and_canvas():
    rng = np.random.RandomState(0)
    pl = jax.nn.log_softmax(jnp.array(rng.randn(3, 12)), axis=-1)
    beam = predict_length_beam(pl, 4, 0, 12)
    np_beam = np.argsort(-np.asarray(pl), kind="stable", axis=1)[:, :4]
    np_beam = np.clip(np_beam, 4, 11)
    np.testing.assert_array_equal(np.asarray(beam), np_beam)

    tokens, pad_mask, lengths = build_canvas(beam, 12)
    assert tokens.shape == (12, 12)
    for i in range(12):
        l = int(lengths[i])
        assert (np.asarray(tokens[i, :l]) == C.MASK).all()
        assert (np.asarray(tokens[i, l:]) == C.PAD).all()
        assert (np.asarray(pad_mask[i]) == (np.arange(12) >= l)).all()


def test_enlarge_row_major():
    x = jnp.arange(6).reshape(3, 2)
    y = enlarge(x, 2)
    np.testing.assert_array_equal(
        np.asarray(y), [[0, 1], [0, 1], [2, 3], [2, 3], [4, 5], [4, 5]])


@pytest.mark.parametrize("use_ct", [False, True])
def test_mask_predict_parity(use_ct):
    method = "NACF" if use_ct else "NAB"
    cfg = small_cfg(method)
    cfg = cfg.replace(use_ct=use_ct)
    model, variables, enc = setup_model(cfg)

    lbs = cfg.length_beam_size
    beam = predict_length_beam(enc["pred_length"], lbs, 0, cfg.max_len)
    tokens, pad_mask, lengths = build_canvas(beam, cfg.max_len)
    enc_tiled = enlarge(enc["enc_output"], lbs)

    # jax path
    ctx = NARContext(enc_tiled, None, None, None, None)
    predict = _predict_fn(model, variables, ctx)
    jax_tokens, jax_lprobs = _mask_predict(
        predict, None, tokens, pad_mask, lengths, cfg)

    # numpy reference path (same model)
    np_predict = make_np_predict(model, variables, enc_tiled)
    ref_tokens, ref_lprobs = ref.np_mask_predict(
        np_predict, None, np.asarray(tokens), np.asarray(pad_mask),
        np.asarray(lengths), cfg.iterations, use_ct)

    np.testing.assert_array_equal(np.asarray(jax_tokens), ref_tokens)
    # lprobs differ only by cross-compilation float noise (the scan-fused and
    # standalone forwards round differently); tokens above match exactly.
    np.testing.assert_allclose(np.asarray(jax_lprobs), ref_lprobs, rtol=5e-3, atol=5e-3)

    # end-to-end generator agrees with numpy best-beam selection
    gen = make_nar_generator(cfg, model, jit=False)
    best = gen(variables, enc, None)
    ref_best = ref.np_select_best_length_beam(
        ref_tokens, ref_lprobs, np.asarray(lengths), 2, lbs, cfg.beam_alpha)
    np.testing.assert_array_equal(np.asarray(best), ref_best)


def test_mask_predict_with_teacher_parity():
    cfg = small_cfg("NAB")
    model, variables, enc = setup_model(cfg)
    tcfg = small_cfg("ARB")
    teacher, tvars, tenc = setup_model(tcfg, seed=7)

    lbs = cfg.length_beam_size
    beam = predict_length_beam(enc["pred_length"], lbs, 0, cfg.max_len)
    tokens, pad_mask, lengths = build_canvas(beam, cfg.max_len)
    enc_tiled = enlarge(enc["enc_output"], lbs)
    tenc_tiled = enlarge(tenc["enc_output"], lbs)

    ctx = NARContext(enc_tiled, None, tenc_tiled, None, None)
    predict = _predict_fn(model, variables, ctx)
    tscore = _teacher_score_fn(teacher, tvars, ctx)
    jax_tokens, jax_lprobs = _mask_predict(
        predict, tscore, tokens, pad_mask, lengths, cfg)

    np_predict = make_np_predict(model, variables, enc_tiled)

    @jax.jit
    def _tprobs(tokens):
        bos = jnp.full((tokens.shape[0], 1), C.BOS, tokens.dtype)
        inp = jnp.concatenate([bos, tokens], axis=1)[:, :-1]
        lp, _ = teacher.apply(
            tvars, inp, tenc_tiled, None, "ARFormer", True,
            method=lambda m, *a: m.decode_logprobs(*a))
        return jnp.exp(lp)

    def np_teacher(tokens_np, pad_np):
        probs = np.asarray(_tprobs(jnp.asarray(tokens_np)), np.float64)
        g = np.take_along_axis(probs, tokens_np[..., None].astype(np.int64), axis=-1)[..., 0]
        g[pad_np] = 1.0
        return g

    ref_tokens, ref_lprobs = ref.np_mask_predict(
        np_predict, np_teacher, np.asarray(tokens), np.asarray(pad_mask),
        np.asarray(lengths), cfg.iterations, False,
        masking_decision=cfg.masking_decision,
        no_candidate_decision=cfg.no_candidate_decision)

    np.testing.assert_array_equal(np.asarray(jax_tokens), ref_tokens)
    np.testing.assert_allclose(np.asarray(jax_lprobs), ref_lprobs, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("paradigm", ["l2r", "ef"])
def test_l2r_ef_run_and_terminate(paradigm):
    """L2R/EF smoke: valid non-mask output, pads intact (parity port of these
    variants is exercised through the shared refinement helpers)."""
    cfg = small_cfg("NAB").replace(paradigm=paradigm, q=2, q_iterations=1)
    model, variables, enc = setup_model(cfg)
    gen = make_nar_generator(cfg, model, jit=False)
    best = np.asarray(gen(variables, enc, None))
    assert best.shape == (2, cfg.max_len)
    assert not (best == C.MASK).any()


def test_beam_search_parity():
    cfg = small_cfg("ARB").replace(beam_size=3, beam_alpha=1.0)
    model, variables, enc = setup_model(cfg)

    gen = make_ar_generator(cfg, model, jit=False)
    jax_hyp, jax_scores = gen(variables, enc, None)

    @jax.jit
    def _steplp(prefix_padded, t):
        lp, _ = model.apply(
            variables, prefix_padded, enc_tiled, None, "ARFormer", True,
            method=lambda m, *a: m.decode_logprobs(*a))
        return lp[:, t - 1, :]

    enc_tiled = enlarge(enc["enc_output"], cfg.beam_size)

    def decode_step(prefix_np):
        t = prefix_np.shape[1]
        padded = np.zeros((prefix_np.shape[0], cfg.max_len), np.int32)
        padded[:, :t] = prefix_np
        # the numpy port may call with fewer live instances; tile enc to match
        n = prefix_np.shape[0]
        lp, _ = model.apply(
            variables, jnp.asarray(padded), enc_tiled[:n], None, "ARFormer", True,
            method=lambda m, *a: m.decode_logprobs(*a))
        return np.asarray(lp[:, t - 1, :], np.float64)

    ref_hyps, ref_scores = ref.np_beam_search(
        decode_step, 2, cfg.beam_size, cfg.max_len, cfg.beam_alpha)

    for i in range(2):
        hyp = np.asarray(jax_hyp[i])
        # our buffer pads with PAD after the hypothesis
        got = list(hyp[: len(ref_hyps[i])])
        assert got == ref_hyps[i], (got, ref_hyps[i])
        assert abs(float(jax_scores[i]) - ref_scores[i]) < 1e-4


@pytest.mark.parametrize("seed,alpha,beam", [(11, 0.75, 2), (12, 1.35, 4), (13, 1.0, 5)])
def test_beam_search_parity_sweep(seed, alpha, beam):
    """Beam parity across seeds / alphas / widths (EOS-early, length-penalty
    reordering, max_len fallback corners)."""
    cfg = small_cfg("ARB").replace(beam_size=beam, beam_alpha=alpha)
    model, variables, enc = setup_model(cfg, seed=seed)

    gen = make_ar_generator(cfg, model, jit=False)
    jax_hyp, jax_scores = gen(variables, enc, None)

    enc_tiled = enlarge(enc["enc_output"], cfg.beam_size)

    def decode_step(prefix_np):
        t = prefix_np.shape[1]
        padded = np.zeros((prefix_np.shape[0], cfg.max_len), np.int32)
        padded[:, :t] = prefix_np
        lp, _ = model.apply(
            variables, jnp.asarray(padded), enc_tiled, None, "ARFormer", True,
            method=lambda m, *a: m.decode_logprobs(*a))
        return np.asarray(lp[:, t - 1, :], np.float64)

    ref_hyps, ref_scores = ref.np_beam_search(
        decode_step, 2, cfg.beam_size, cfg.max_len, cfg.beam_alpha)

    for i in range(2):
        hyp = np.asarray(jax_hyp[i])
        got = list(hyp[: len(ref_hyps[i])])
        assert got == ref_hyps[i], (seed, got, ref_hyps[i])
        assert abs(float(jax_scores[i]) - ref_scores[i]) < 1e-4


@pytest.mark.parametrize("seed,lbs,iters,use_ct", [
    (21, 1, 1, False),   # single length beam, single iteration
    (22, 2, 2, True),    # CT with small beams
    (23, 4, 5, False),   # default-like iteration count
])
def test_mask_predict_parity_sweep(seed, lbs, iters, use_ct):
    method = "NACF" if use_ct else "NAB"
    cfg = small_cfg(method).replace(
        use_ct=use_ct, length_beam_size=lbs, iterations=iters)
    model, variables, enc = setup_model(cfg, seed=seed)

    beam = predict_length_beam(enc["pred_length"], lbs, 0, cfg.max_len)
    tokens, pad_mask, lengths = build_canvas(beam, cfg.max_len)
    enc_tiled = enlarge(enc["enc_output"], lbs)

    ctx = NARContext(enc_tiled, None, None, None, None)
    predict = _predict_fn(model, variables, ctx)
    jax_tokens, jax_lprobs = _mask_predict(
        predict, None, tokens, pad_mask, lengths, cfg)

    np_predict = make_np_predict(model, variables, enc_tiled)
    ref_tokens, ref_lprobs = ref.np_mask_predict(
        np_predict, None, np.asarray(tokens), np.asarray(pad_mask),
        np.asarray(lengths), iters, use_ct)

    np.testing.assert_array_equal(np.asarray(jax_tokens), ref_tokens)

    gen = make_nar_generator(cfg, model, jit=False)
    best = gen(variables, enc, None)
    ref_best = ref.np_select_best_length_beam(
        ref_tokens, ref_lprobs, np.asarray(lengths), 2, lbs, cfg.beam_alpha)
    np.testing.assert_array_equal(np.asarray(best), ref_best)


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_kv_cached_beam_matches_full_recompute(compute_dtype):
    """The KV-cached incremental beam step must be token-identical to the
    full-prefix recompute path (NAVC_NO_KVCACHE kill-switch) — in BOTH
    compute dtypes: the cached step's dense() replicates flax
    nn.Dense(dtype=bf16) op-for-op (bf16 product + bf16 bias add), so the
    production bf16 path is covered too (advisor round-2 finding)."""
    import os

    import jax
    import numpy as np

    from navc_tpu.config import default_config
    from navc_tpu.decoding import make_ar_generator
    from navc_tpu.models import build_model, init_params
    from navc_tpu.ops.eligibility import kv_cached_beam_eligible

    cfg = default_config(
        "ARB", dataset="MSRVTT",
        vocab_size=60, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, dim_i=12, dim_m=10, modality="mi",
        max_len=10, batch_size=3, beam_size=3, beam_alpha=1.15,
        with_category=True, compute_dtype=compute_dtype)
    assert kv_cached_beam_eligible(cfg)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(5), cfg)
    rng = np.random.RandomState(11)
    feats = [jax.numpy.asarray(rng.randn(3, cfg.n_frames, d).astype(np.float32))
             for d in cfg.modality_dims]
    category = jax.numpy.asarray(rng.randint(0, cfg.num_category, (3, 1)))
    enc = model.apply(variables, feats, method=lambda m, f: m.encode(f))

    hyp_c, sc_c = make_ar_generator(cfg, model, jit=False)(
        variables, enc, category)
    os.environ["NAVC_NO_KVCACHE"] = "1"
    try:
        hyp_f, sc_f = make_ar_generator(cfg, model, jit=False)(
            variables, enc, category)
    finally:
        del os.environ["NAVC_NO_KVCACHE"]
    np.testing.assert_array_equal(np.asarray(hyp_c), np.asarray(hyp_f))
    np.testing.assert_allclose(np.asarray(sc_c), np.asarray(sc_f), rtol=1e-6)
