"""Fused Pallas decoder layer: interpret-mode parity vs the XLA BertLayer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navc_tpu import constants as C
from navc_tpu.config import default_config
from navc_tpu.models import build_model, init_params
from navc_tpu.ops.fused_layer import fused_nar_decoder_layer, layer_weights_from_params


def small_cfg(**kw):
    over = dict(
        vocab_size=30, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, dim_i=12, dim_m=10, modality="mi",
        max_len=10, batch_size=2, compute_dtype="float32",
    )
    over.update(kw)
    return default_config("NAB", dataset="MSVD", **over)


def test_fused_layer_matches_xla_decoder():
    cfg = small_cfg()
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    n = 6
    enc = jnp.asarray(rng.randn(n, 2 * cfg.n_frames, cfg.dim_hidden).astype(np.float32))
    tokens = np.full((n, cfg.max_len), C.PAD, np.int32)
    for i in range(n):
        l = rng.randint(4, cfg.max_len)
        tokens[i, :l] = rng.randint(4, cfg.vocab_size, size=l)
    tokens = jnp.asarray(tokens)

    # XLA reference path
    hidden_ref, _, _ = model.apply(
        variables, tokens, enc, None, "NARFormer", True,
        method=lambda m, *a: m.decode(*a))

    # fused path: embeddings (same code) + Pallas layer
    emb = model.apply(variables, tokens, enc, None,
                      method=lambda m, *a: m.nar_embed(*a))
    weights = layer_weights_from_params(
        variables["params"]["decoder"]["layer_0"])
    hidden_fused = fused_nar_decoder_layer(
        emb, enc, tokens == C.PAD, weights,
        n_head=cfg.num_attention_heads, tb=8, interpret=True)

    np.testing.assert_allclose(np.asarray(hidden_fused), np.asarray(hidden_ref),
                               rtol=2e-2, atol=2e-2)
    # PAD positions are exactly zero in both (non-pad multiplier)
    pad = np.asarray(tokens) == C.PAD
    np.testing.assert_allclose(np.asarray(hidden_fused)[pad], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hidden_ref)[pad], 0.0, atol=1e-6)


def test_fused_teacher_score_matches_jnp():
    """Causal fused layer + gather-prob kernel vs the plain teacher scorer."""
    import jax.numpy as jnp
    from navc_tpu.decoding.length_beam import build_canvas, enlarge, predict_length_beam
    from navc_tpu.decoding.mask_predict import NARContext, _teacher_score_fn
    from test_decoding_parity import setup_model, small_cfg as parity_cfg

    cfg = parity_cfg("NAB")
    tcfg = parity_cfg("ARB")
    teacher, tvars, tenc = setup_model(tcfg, seed=7)
    model, variables, enc = setup_model(cfg)

    lbs = cfg.length_beam_size
    beam = predict_length_beam(enc["pred_length"], lbs, 0, cfg.max_len)
    tokens, pad_mask, lengths = build_canvas(beam, cfg.max_len)
    # fill with plausible token ids
    rng = np.random.RandomState(3)
    filled = jnp.where(tokens == C.MASK,
                       jnp.asarray(rng.randint(6, cfg.vocab_size, tokens.shape)),
                       tokens)

    tenc_tiled = enlarge(tenc["enc_output"], lbs)
    ctx = NARContext(None, None, tenc_tiled, None, None)

    plain = _teacher_score_fn(teacher, tvars, ctx, cfg)  # use_pallas False
    fused = _teacher_score_fn(teacher, tvars, ctx, cfg.replace(use_pallas=True))
    a = np.asarray(plain(filled, pad_mask))
    b = np.asarray(fused(filled, pad_mask))
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=1e-3)
    # ranking-relevant agreement: probabilities correlate tightly
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


def test_hoisted_cross_kv_bit_identical():
    """enc_kv= (hoisted cross K/V) matches the in-kernel projection exactly:
    the kernel casts K/V to bf16 at the attention dots either way."""
    from navc_tpu.ops.fused_layer import (fused_nar_decoder_layer_qsub,
                                          hoist_cross_kv)

    cfg = small_cfg()
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    n, l, h = 6, cfg.max_len, cfg.dim_hidden
    enc = jnp.asarray(rng.randn(n, 2 * cfg.n_frames, h).astype(np.float32))
    enc16 = enc.astype(jnp.bfloat16)
    tokens = np.full((n, l), C.PAD, np.int32)
    for i in range(n):
        ln = rng.randint(4, l)
        tokens[i, :ln] = rng.randint(4, cfg.vocab_size, size=ln)
    tokens = jnp.asarray(tokens)

    weights = layer_weights_from_params(
        variables["params"]["decoder"]["layer_0"])
    emb_p = variables["params"]["decoder"]["embedding"]
    word_table = emb_p["word_embeddings"]["embedding"].astype(jnp.bfloat16)
    static = jnp.broadcast_to(
        emb_p["position_embeddings"]["embedding"][None, :l, :], (n, l, h)
    ).astype(jnp.bfloat16)
    ln_s, ln_b = emb_p["LayerNorm"]["scale"], emb_p["LayerNorm"]["bias"]
    kv = hoist_cross_kv(enc16, weights)

    kwargs = dict(n_head=cfg.num_attention_heads, tb=4, interpret=True,
                  static=static, ln_scale=ln_s, ln_bias=ln_b,
                  ln_eps=cfg.layer_norm_eps, out_dtype=jnp.bfloat16)
    base = fused_nar_decoder_layer(word_table[tokens], enc16,
                                   tokens == C.PAD, weights, **kwargs)
    hoisted = fused_nar_decoder_layer(word_table[tokens], None,
                                      tokens == C.PAD, weights,
                                      enc_kv=kv, **kwargs)
    np.testing.assert_array_equal(np.asarray(base, np.float32),
                                  np.asarray(hoisted, np.float32))

    # sparse-query variant
    k = 8
    sel = np.zeros((n, k, l), np.float32)
    masked = np.asarray(tokens).copy()
    for i in range(n):
        pos = rng.choice(np.where(masked[i] != C.PAD)[0], size=3, replace=False)
        for q, p in enumerate(pos):
            sel[i, q, p] = 1.0
            masked[i, p] = C.MASK
    qkw = dict(n_head=cfg.num_attention_heads, tb=4, interpret=True,
               ln_eps=cfg.layer_norm_eps, out_dtype=jnp.bfloat16)
    bq = fused_nar_decoder_layer_qsub(
        jnp.asarray(sel), word_table[C.MASK], word_table[jnp.asarray(masked)],
        static, enc16, jnp.asarray(masked) == C.PAD, weights, ln_s, ln_b, **qkw)
    hq = fused_nar_decoder_layer_qsub(
        jnp.asarray(sel), word_table[C.MASK], word_table[jnp.asarray(masked)],
        static, None, jnp.asarray(masked) == C.PAD, weights, ln_s, ln_b,
        enc_kv=kv, **qkw)
    np.testing.assert_array_equal(np.asarray(bq, np.float32),
                                  np.asarray(hq, np.float32))
