"""Pallas fused vocab-projection kernel: interpret-mode parity on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navc_tpu.ops.vocab_fused import fused_project_argmax, reference_project_argmax


@pytest.mark.parametrize("n,v", [(100, 1000), (260, 2100)])
def test_fused_project_argmax_interpret(n, v):
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(n, 64).astype(np.float32))
    w = jnp.asarray((rng.randn(64, v) * 0.1).astype(np.float32))
    ids, maxp = fused_project_argmax(h, w, tn=128, tv=512, interpret=True)
    # compare against a reference computed with the same bf16 input rounding
    h16 = h.astype(jnp.bfloat16).astype(jnp.float32)
    w16 = w.astype(jnp.bfloat16).astype(jnp.float32)
    rid, rmaxp = reference_project_argmax(h16, w16)
    ids, maxp, rid, rmaxp = map(np.asarray, (ids, maxp, rid, rmaxp))
    match = (ids == rid).mean()
    assert match > 0.99, match  # ties at bf16 may flip rarely
    agree = ids == rid
    np.testing.assert_allclose(maxp[agree], rmaxp[agree], rtol=2e-3, atol=1e-4)


def test_fused_kernel_in_nar_generator():
    """use_pallas path produces the same tokens as the default path on CPU."""
    from navc_tpu.config import default_config
    from navc_tpu.decoding import make_nar_generator
    from navc_tpu.models import build_model, init_params

    over = dict(
        vocab_size=50, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, dim_i=12, dim_m=10, modality="mi",
        max_len=10, batch_size=2, length_beam_size=2, iterations=2,
        compute_dtype="float32",
    )
    cfg = default_config("NAB", dataset="MSVD", **over)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    feats = [jnp.asarray(np.random.RandomState(1).randn(2, cfg.n_frames, d)
                         .astype(np.float32)) for d in cfg.modality_dims]
    enc = model.apply(variables, feats, method=lambda m, f: m.encode(f))

    gen_plain = make_nar_generator(cfg, model, jit=False)
    gen_pallas = make_nar_generator(cfg.replace(use_pallas=True), model, jit=False)
    a = np.asarray(gen_plain(variables, enc, None))
    b = np.asarray(gen_pallas(variables, enc, None))
    # bf16 rounding inside the kernel can flip rare near-ties; on this tiny
    # model the outputs should agree overwhelmingly
    assert (a == b).mean() > 0.9, (a, b)


def test_fused_generator_with_teacher_interpret():
    """use_pallas NACF path (fused student layer + fused teacher rescoring)
    agrees with the XLA path on CPU interpret mode."""
    from navc_tpu.config import default_config
    from navc_tpu.decoding import make_nar_generator
    from navc_tpu.models import build_model, init_params

    over = dict(
        vocab_size=50, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, dim_i=12, dim_m=10, modality="mi",
        max_len=10, batch_size=2, length_beam_size=2, iterations=2,
        compute_dtype="float32",
    )
    cfg = default_config("NAB", dataset="MSVD", **over)
    tcfg = default_config("ARB", dataset="MSVD", **over)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    teacher = build_model(tcfg)
    tvars = init_params(teacher, jax.random.PRNGKey(7), tcfg)

    rng = np.random.RandomState(1)
    feats = [jnp.asarray(rng.randn(2, cfg.n_frames, d).astype(np.float32))
             for d in cfg.modality_dims]
    enc = model.apply(variables, feats, method=lambda m, f: m.encode(f))
    tenc = teacher.apply(tvars, feats, method=lambda m, f: m.encode(f))

    plain = make_nar_generator(cfg, model, teacher, jit=False)
    fused = make_nar_generator(cfg.replace(use_pallas=True), model, teacher,
                               jit=False)
    a = np.asarray(plain(variables, enc, None, tvars, tenc, None))
    b = np.asarray(fused(variables, enc, None, tvars, tenc, None))
    assert (a == b).mean() > 0.9, (a, b)


def test_sparse_refinement_matches_dense_fused():
    """The sparse-query refinement path (Q-subset kernel + scatter) must be
    TOKEN-IDENTICAL to the dense fused scan path — same kernel math on the
    kept rows, same select-worst schedule (algorithms.py:255-265)."""
    import os

    from navc_tpu.config import default_config
    from navc_tpu.decoding import make_nar_generator
    from navc_tpu.models import build_model, init_params
    from navc_tpu.ops.eligibility import fused_sparse_eligible

    over = dict(
        vocab_size=50, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, dim_i=12, dim_m=10, modality="mi",
        max_len=12, batch_size=3, length_beam_size=3, iterations=4,
        compute_dtype="float32", use_pallas=True,
    )
    for use_ct in (False, True):
        cfg = default_config("NACF" if use_ct else "NAB", dataset="MSVD",
                             use_ct=use_ct, **over)
        cfg = cfg.replace(teacher_path="", with_teacher=False,
                          load_teacher_weights=False)
        assert fused_sparse_eligible(cfg)
        model = build_model(cfg)
        variables = init_params(model, jax.random.PRNGKey(3), cfg)
        feats = [jnp.asarray(np.random.RandomState(7).randn(3, cfg.n_frames, d)
                             .astype(np.float32)) for d in cfg.modality_dims]
        enc = model.apply(variables, feats, method=lambda m, f: m.encode(f))

        sparse = np.asarray(
            make_nar_generator(cfg, model, jit=False)(variables, enc, None))
        os.environ["NAVC_DENSE_REFINE"] = "1"
        try:
            dense = np.asarray(
                make_nar_generator(cfg, model, jit=False)(variables, enc, None))
        finally:
            del os.environ["NAVC_DENSE_REFINE"]
        np.testing.assert_array_equal(sparse, dense)


def test_sparse_refinement_with_teacher_masking_decision():
    """Sparse vs dense token identity with the AR teacher in the loop
    (masking_decision=True gates select-worst by teacher probabilities every
    step — algorithms.py:175-204)."""
    import os

    from navc_tpu.config import default_config
    from navc_tpu.decoding import make_nar_generator
    from navc_tpu.models import build_model, init_params
    from navc_tpu.ops.eligibility import fused_sparse_eligible

    over = dict(
        vocab_size=50, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, dim_i=12, dim_m=10, modality="mi",
        max_len=12, batch_size=2, length_beam_size=2, iterations=3,
        compute_dtype="float32", use_pallas=True,
    )
    cfg = default_config("NACF", dataset="MSVD", use_ct=True,
                         masking_decision=True, **over)
    cfg = cfg.replace(teacher_path="", load_teacher_weights=False)
    tcfg = default_config("ARB", dataset="MSVD", **over)
    assert fused_sparse_eligible(cfg)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(2), cfg)
    teacher = build_model(tcfg)
    tvars = init_params(teacher, jax.random.PRNGKey(9), tcfg)

    rng = np.random.RandomState(3)
    feats = [jnp.asarray(rng.randn(2, cfg.n_frames, d).astype(np.float32))
             for d in cfg.modality_dims]
    enc = model.apply(variables, feats, method=lambda m, f: m.encode(f))
    tenc = teacher.apply(tvars, feats, method=lambda m, f: m.encode(f))

    sparse = np.asarray(make_nar_generator(cfg, model, teacher, jit=False)(
        variables, enc, None, tvars, tenc, None))
    os.environ["NAVC_DENSE_REFINE"] = "1"
    try:
        dense = np.asarray(make_nar_generator(cfg, model, teacher, jit=False)(
            variables, enc, None, tvars, tenc, None))
    finally:
        del os.environ["NAVC_DENSE_REFINE"]
    np.testing.assert_array_equal(sparse, dense)


def test_sparse_query_bound_covers_f32_mask_count():
    """The device re-mask count is computed in f32 (torch python-float ->
    f32-tensor promotion, algorithms.py:255-257); at exact-integer boundaries
    f32 rounds one ABOVE the f64 floor: f32(45)*f32(0.2) = 9.0 while
    floor64(45*(1-4/5)) = 8. The sparse path's static query bound must use
    the same f32 arithmetic, or the 9th re-masked slot is never re-predicted
    and the output silently keeps a literal <mask> (advisor round-2 finding).
    Exercised at length == canvas width (the generator clips lengths to
    max_len-1, but the algorithm contract must hold at the bound)."""
    import math
    import os

    from navc_tpu import constants as C
    from navc_tpu.config import default_config
    from navc_tpu.decoding.mask_predict import (NARContext, _mask_predict,
                                                _predict_fn)
    from navc_tpu.models import build_model, init_params
    from navc_tpu.ops.eligibility import fused_sparse_eligible

    L, T = 45, 5
    # precondition: this (L, T) pair actually triggers the f32/f64 split
    assert int(np.float32(L) * np.float32(1.0 - 4 / T)) == 9
    assert math.floor(L * (1.0 - 4 / T)) == 8

    cfg = default_config(
        "NAB", dataset="MSVD", vocab_size=50, dim_hidden=16,
        num_attention_heads=2, intermediate_size=32, n_frames=4, dim_i=12,
        dim_m=10, modality="mi", max_len=L, batch_size=2, length_beam_size=1,
        iterations=T, compute_dtype="float32", use_pallas=True)
    cfg = cfg.replace(teacher_path="", with_teacher=False,
                      load_teacher_weights=False)
    assert fused_sparse_eligible(cfg)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    feats = [jnp.asarray(np.random.RandomState(1).randn(2, cfg.n_frames, d)
                         .astype(np.float32)) for d in cfg.modality_dims]
    enc = model.apply(variables, feats, method=lambda m, f: m.encode(f))

    tokens = jnp.full((2, L), C.MASK, jnp.int32)
    pad_mask = jnp.zeros((2, L), bool)
    lengths = jnp.full((2,), L, jnp.int32)
    ctx = NARContext(enc["enc_output"], None, None, None, None)

    predict = _predict_fn(model, variables, ctx, cfg, canvas_len=L)
    assert getattr(predict, "predict_sub", None) is not None
    sparse, _ = _mask_predict(predict, None, tokens, pad_mask, lengths, cfg)

    os.environ["NAVC_DENSE_REFINE"] = "1"
    try:
        predict_d = _predict_fn(model, variables, ctx, cfg, canvas_len=L)
        assert getattr(predict_d, "predict_sub", None) is None
        dense, _ = _mask_predict(predict_d, None, tokens, pad_mask, lengths, cfg)
    finally:
        del os.environ["NAVC_DENSE_REFINE"]

    np.testing.assert_array_equal(np.asarray(sparse), np.asarray(dense))


def test_fused_project_argmax_with_bias_interpret():
    """The bias operand (tied projection, seq2seq.py:27-33) must shift the
    argmax and probabilities exactly like a materialized logits + bias."""
    rng = np.random.RandomState(3)
    h = jnp.asarray(rng.randn(96, 64).astype(np.float32))
    w = jnp.asarray((rng.randn(64, 1000) * 0.1).astype(np.float32))
    b = jnp.asarray((rng.randn(1000) * 2.0).astype(np.float32))
    ids, maxp = fused_project_argmax(h, w, b, tn=128, tv=512, interpret=True)
    h16 = h.astype(jnp.bfloat16).astype(jnp.float32)
    w16 = w.astype(jnp.bfloat16).astype(jnp.float32)
    logits = h16 @ w16 + b
    probs = jax.nn.softmax(logits, axis=-1)
    rid = jnp.argmax(probs, -1).astype(jnp.int32)
    match = (np.asarray(ids) == np.asarray(rid)).mean()
    assert match > 0.99, match
    agree = np.asarray(ids) == np.asarray(rid)
    np.testing.assert_allclose(np.asarray(maxp)[agree],
                               np.asarray(jnp.max(probs, -1))[agree],
                               rtol=2e-3, atol=1e-4)


def test_tied_weights_fused_generator():
    """tie_weights configs now run the fused decode path (VERDICT r2 #9):
    eligibility admits them and tokens agree with the plain XLA path."""
    from navc_tpu.config import default_config
    from navc_tpu.decoding import make_nar_generator
    from navc_tpu.models import build_model, init_params
    from navc_tpu.ops.eligibility import (fused_decode_eligible,
                                          fused_vocab_eligible)

    over = dict(
        vocab_size=50, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, dim_i=12, dim_m=10, modality="mi",
        max_len=10, batch_size=2, length_beam_size=2, iterations=2,
        compute_dtype="float32", tie_weights=True,
    )
    cfg = default_config("NAB", dataset="MSVD", **over)
    assert fused_vocab_eligible(cfg.replace(use_pallas=True))
    assert fused_decode_eligible(cfg.replace(use_pallas=True))
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    assert "tgt_word_prj_bias" in variables["params"]
    feats = [jnp.asarray(np.random.RandomState(1).randn(2, cfg.n_frames, d)
                         .astype(np.float32)) for d in cfg.modality_dims]
    enc = model.apply(variables, feats, method=lambda m, f: m.encode(f))

    a = np.asarray(make_nar_generator(cfg, model, jit=False)(variables, enc, None))
    b = np.asarray(make_nar_generator(cfg.replace(use_pallas=True), model,
                                      jit=False)(variables, enc, None))
    assert (a == b).mean() > 0.9, (a, b)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("b,k", [(16, 5), (32, 3)])
def test_beam_permute_kernel_interpret(b, k, dtype):
    """One-hot MXU cache permute == take_along_axis, exactly, both dtypes."""
    from navc_tpu.ops.beam_permute import (beam_permute_eligible,
                                           permute_beam_caches)

    max_len, nh, dh = 6, 2, 64  # m = 768, a multiple of 128
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    assert beam_permute_eligible(b, k, max_len * nh * dh, dt.dtype.itemsize)
    rng = np.random.RandomState(3)
    kc = jnp.asarray(rng.randn(b * k, max_len, nh, dh)).astype(dt)
    vc = jnp.asarray(rng.randn(b * k, max_len, nh, dh)).astype(dt)
    prev_k = jnp.asarray(rng.randint(0, k, (b, k)), jnp.int32)

    okc, ovc = permute_beam_caches(kc, vc, prev_k, k, interpret=True)
    ref_kc = jnp.take_along_axis(
        kc.reshape(b, k, max_len, nh, dh),
        prev_k[:, :, None, None, None], axis=1).reshape(kc.shape)
    ref_vc = jnp.take_along_axis(
        vc.reshape(b, k, max_len, nh, dh),
        prev_k[:, :, None, None, None], axis=1).reshape(vc.shape)
    np.testing.assert_array_equal(np.asarray(okc), np.asarray(ref_kc))
    np.testing.assert_array_equal(np.asarray(ovc), np.asarray(ref_vc))


@pytest.mark.parametrize("n,v,k", [(100, 1000, 5), (260, 2100, 3)])
def test_fused_project_topk_interpret(n, v, k):
    """Fused top-k == lax.top_k over log_softmax logits (same bf16 inputs)."""
    from navc_tpu.ops.vocab_fused import fused_project_topk

    rng = np.random.RandomState(7)
    h = jnp.asarray(rng.randn(n, 64).astype(np.float32))
    w = jnp.asarray((rng.randn(64, v) * 0.1).astype(np.float32))
    bias = jnp.asarray(rng.randn(v).astype(np.float32) * 0.05)
    wp, ids = fused_project_topk(h, w, k, bias=bias, tn=128, tv=512,
                                 interpret=True)
    h16 = h.astype(jnp.bfloat16).astype(jnp.float32)
    w16 = w.astype(jnp.bfloat16).astype(jnp.float32)
    logits = h16 @ w16 + bias
    rv, ri = jax.lax.top_k(logits, k)
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    ids, wp, ri = map(np.asarray, (ids, wp, ri))
    rwp = np.asarray(rv - lse)
    match = (ids == ri).mean()
    assert match > 0.999, match
    agree = ids == ri
    np.testing.assert_allclose(wp[agree], rwp[agree], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("tpos", [0, 3, 5])
def test_beam_attend_step_interpret(dtype, tpos):
    """Fused permute+append+attend == the XLA formulation (per-step)."""
    from navc_tpu.ops.beam_attend import beam_attend_eligible, beam_attend_step

    b, k, l, nh, dh = 16, 5, 6, 2, 64
    h = nh * dh
    n = b * k
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    assert beam_attend_eligible(b, k, l, h, dt.dtype.itemsize)
    rng = np.random.RandomState(4)
    kc = jnp.asarray(rng.randn(n, l * h)).astype(dt)
    vc = jnp.asarray(rng.randn(n, l * h)).astype(dt)
    # zero out positions >= tpos like a real decode (never written yet)
    wiped = jnp.arange(l * h) >= tpos * h
    kc = jnp.where(wiped[None, :], 0, kc)
    vc = jnp.where(wiped[None, :], 0, vc)
    q = jnp.asarray(rng.randn(n, h).astype(np.float32))
    kt = jnp.asarray(rng.randn(n, h).astype(np.float32))
    vt = jnp.asarray(rng.randn(n, h).astype(np.float32))
    prev_k = jnp.asarray(rng.randint(0, k, (b, k)), jnp.int32)
    mask_bool = rng.rand(n, l) < 0.2
    mask_bool[:, tpos] = False          # the appended position is visible
    mask_bool |= np.arange(l)[None, :] > tpos  # causal
    amask = jnp.asarray(np.where(mask_bool, -1e7, 0.0).astype(np.float32))

    kco, vco, att = beam_attend_step(kc, vc, q, kt, vt, prev_k, amask,
                                     tpos, k=k, nh=nh, l=l, interpret=True)

    # reference: permute rows, overwrite position tpos, masked attention
    src = (np.arange(n) // k) * k + np.asarray(prev_k).reshape(n)
    rkc = np.asarray(kc, np.float32)[src].reshape(n, l, h)
    rvc = np.asarray(vc, np.float32)[src].reshape(n, l, h)
    rkc[:, tpos] = np.asarray(kt.astype(dt), np.float32)
    rvc[:, tpos] = np.asarray(vt.astype(dt), np.float32)
    # positions > tpos are unspecified in the outputs (clamped tiles)
    lim = (tpos + 1) * h
    np.testing.assert_array_equal(np.asarray(kco, np.float32)[:, :lim],
                                  rkc.reshape(n, l * h)[:, :lim])
    np.testing.assert_array_equal(np.asarray(vco, np.float32)[:, :lim],
                                  rvc.reshape(n, l * h)[:, :lim])
    qh = np.asarray(q).reshape(n, nh, dh)
    kh = rkc.reshape(n, l, nh, dh)
    vh = rvc.reshape(n, l, nh, dh)
    scores = np.einsum("nhd,nlhd->nhl", qh, kh) / np.sqrt(dh)
    scores = scores + np.asarray(amask)[:, None, :]
    pr = np.exp(scores - scores.max(-1, keepdims=True))
    pr = pr / pr.sum(-1, keepdims=True)
    ref = np.einsum("nhl,nlhd->nhd", pr, vh).reshape(n, h)
    np.testing.assert_allclose(np.asarray(att), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_beam_attend_step_chained_carry(dtype):
    """Multi-step decode with the caches as opaque in-place carries.

    The kernel aliases its cache inputs to its outputs (in-place HBM
    update); this chains 6 steps feeding each step's cache outputs into the
    next — exactly the while-loop carry pattern of decoding/beam.py — and
    checks the attention output of EVERY step against an explicitly
    materialized permute/append/attend oracle."""
    import math

    from navc_tpu.ops.beam_attend import beam_attend_eligible, beam_attend_step

    b, k, l, nh, dh = 16, 5, 8, 4, 32
    h = nh * dh
    n = b * k
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    assert beam_attend_eligible(b, k, l, h, dt.dtype.itemsize)
    rng = np.random.RandomState(11)
    kc = jnp.zeros((n, l * h), dt)
    vc = jnp.zeros((n, l * h), dt)
    kc_o = np.zeros((n, l, h), np.float32)
    vc_o = np.zeros((n, l, h), np.float32)
    for t in range(l - 2):
        q = jnp.asarray(rng.randn(n, h).astype(np.float32))
        kt = jnp.asarray(rng.randn(n, h).astype(np.float32))
        vt = jnp.asarray(rng.randn(n, h).astype(np.float32))
        pk = (jnp.asarray(rng.randint(0, k, (b, k)), jnp.int32) if t
              else jnp.zeros((b, k), jnp.int32))
        amask = jnp.broadcast_to(
            jnp.where(jnp.arange(l)[None, :] > t, -1e7, 0.0), (n, l)
        ).astype(jnp.float32)
        kc, vc, att = beam_attend_step(kc, vc, q, kt, vt, pk, amask, t,
                                       k=k, nh=nh, l=l, interpret=True)
        src = (np.arange(n) // k) * k + np.asarray(pk).reshape(n)
        kc_o, vc_o = kc_o[src], vc_o[src]
        kc_o[:, t] = np.asarray(kt.astype(dt), np.float32)
        vc_o[:, t] = np.asarray(vt.astype(dt), np.float32)
        qh = np.asarray(q).reshape(n, nh, dh)
        sc = np.einsum("nhd,nlhd->nhl", qh,
                       kc_o.reshape(n, l, nh, dh)) / math.sqrt(dh)
        sc = sc + np.asarray(amask)[:, None, :]
        pr = np.exp(sc - sc.max(-1, keepdims=True))
        pr = pr / pr.sum(-1, keepdims=True)
        ref = np.einsum("nhl,nlhd->nhd", pr,
                        vc_o.reshape(n, l, nh, dh)).reshape(n, h)
        np.testing.assert_allclose(np.asarray(att), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_cross_attend_interpret(dtype):
    """Fused beam cross-attention == per-row einsum attention.

    bfloat16 exercises the production K/V storage dtype (and the _segdot
    split-pass trace); values are bf16-representable so the oracle is
    unchanged.
    """
    from navc_tpu.ops.beam_attend import cross_attend, cross_attend_eligible

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    b, k, le, nh, dh = 16, 5, 4, 2, 64
    h = nh * dh
    n = b * k
    assert cross_attend_eligible(n, le, h)
    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(n, h).astype(np.float32))
    ke = jnp.asarray(rng.randn(b, le * h).astype(np.float32))
    ke = ke.astype(dt).astype(jnp.float32)
    ve = jnp.asarray(rng.randn(b, le * h).astype(np.float32))
    ve = ve.astype(dt).astype(jnp.float32)
    att = cross_attend(q, jnp.repeat(ke, k, axis=0).astype(dt),
                       jnp.repeat(ve, k, axis=0).astype(dt),
                       nh=nh, interpret=True)

    qh = np.asarray(q).reshape(b, k, nh, dh)
    kh = np.asarray(ke).reshape(b, le, nh, dh)
    vh = np.asarray(ve).reshape(b, le, nh, dh)
    sc = np.einsum("bkhd,blhd->bkhl", qh, kh) / np.sqrt(dh)
    pr = np.exp(sc - sc.max(-1, keepdims=True))
    pr = pr / pr.sum(-1, keepdims=True)
    ref = np.einsum("bkhl,blhd->bkhd", pr, vh).reshape(n, h)
    np.testing.assert_allclose(np.asarray(att), ref, rtol=2e-5, atol=2e-5)
