"""Model-stack unit tests: shapes, masking semantics, sharing, parity checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navc_tpu import constants as C
from navc_tpu.config import default_config
from navc_tpu.models import build_model, init_params
from navc_tpu.models.layers import gelu_new
from navc_tpu.ops import masking as M
from navc_tpu.ops.select import rank_mask_largest, rank_mask_smallest


def small_cfg(method="NAB", dataset="MSVD", **kw):
    over = dict(
        vocab_size=50, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, dim_i=12, dim_m=10, modality="mi",
        max_len=10, batch_size=2, compute_dtype="float32",
    )
    over.update(kw)
    return default_config(method, dataset=dataset, **over)


def test_gelu_new_matches_reference_formula():
    x = np.linspace(-3, 3, 7).astype(np.float32)
    # reference models/bert.py:12-13
    expected = 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x ** 3)))
    np.testing.assert_allclose(np.asarray(gelu_new(jnp.array(x))), expected,
                               rtol=0, atol=5e-5)


def test_masks():
    seq = jnp.array([[2, 7, 8, 0, 0], [2, 7, 0, 0, 0]])
    npm = M.non_pad_mask(seq)
    assert npm.shape == (2, 5, 1)
    np.testing.assert_array_equal(np.asarray(npm[..., 0]),
                                  [[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]])
    kp = M.key_pad_mask(seq, 5)
    assert kp.shape == (2, 5, 5)
    assert bool(kp[0, 0, 3]) and not bool(kp[0, 3, 2])
    sub = M.subsequent_mask(2, 4)
    np.testing.assert_array_equal(
        np.asarray(sub[0]).astype(int),
        [[0, 1, 1, 1], [0, 0, 1, 1], [0, 0, 0, 1], [0, 0, 0, 0]])
    diag = M.self_mask_diag(seq)
    assert bool(diag[0, 1, 1]) and not bool(diag[0, 1, 0])


def test_resample_enc_output_matches_reference_loop():
    # numpy port of reference models/Decoder.py:41-54
    rng = np.random.RandomState(0)
    enc = rng.randn(3, 7, 4).astype(np.float32)
    tokens = np.array([
        [4, 4, 4, 0, 0, 0],
        [4, 4, 4, 4, 4, 4],
        [4, 0, 0, 0, 0, 0],
    ])
    T = enc.shape[1]
    expected = np.zeros((3, 6, 4), np.float32)
    for i in range(3):
        length = (tokens[i] != 0).sum()
        scale = T / length
        idx = (np.arange(6) * scale).astype(np.int64)
        idx = np.minimum(idx, T - 1)
        expected[i] = enc[i][idx]
    got = np.asarray(M.resample_enc_output(jnp.array(enc), jnp.array(tokens)))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_rank_masks():
    vals = jnp.array([[0.5, 0.1, 0.9, 0.3], [0.2, 0.8, 0.4, 0.6]])
    m = rank_mask_smallest(vals, jnp.array([2, 1]))
    np.testing.assert_array_equal(np.asarray(m),
                                  [[False, True, False, True],
                                   [True, False, False, False]])
    m = rank_mask_largest(vals, jnp.array([1, 2]))
    np.testing.assert_array_equal(np.asarray(m),
                                  [[False, False, True, False],
                                   [False, True, False, True]])


def test_nar_forward_shapes():
    cfg = small_cfg("NAB")
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    feats = [jnp.ones((2, cfg.n_frames, d)) for d in cfg.modality_dims]
    tokens = jnp.full((2, cfg.max_len), C.MASK, jnp.int32)
    out = model.apply(variables, feats, tokens, None, deterministic=True)
    assert out["enc_output"].shape == (2, 2 * cfg.n_frames, cfg.dim_hidden)
    assert out["pred_length"].shape == (2, cfg.max_len)
    # log-softmax property
    np.testing.assert_allclose(
        np.asarray(jnp.exp(out["pred_length"]).sum(-1)), np.ones(2), rtol=1e-5)
    (lp,) = out["tgt_word_logprobs"]
    assert lp.shape == (2, cfg.max_len, cfg.vocab_size)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(lp).sum(-1)), np.ones((2, cfg.max_len)), rtol=1e-4)


def test_ar_forward_shifts_inputs():
    cfg = small_cfg("ARB")
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    feats = [jnp.ones((2, cfg.n_frames, d)) for d in cfg.modality_dims]
    tokens = jnp.zeros((2, cfg.max_len), jnp.int32).at[:, 0].set(C.BOS)
    out = model.apply(variables, feats, tokens, None, deterministic=True)
    (lp,) = out["tgt_word_logprobs"]
    # ARFormer drops the last input position (reference seq2seq.py:120)
    assert lp.shape == (2, cfg.max_len - 1, cfg.vocab_size)
    assert "pred_length" not in out


def test_visual_word_two_pass_shares_weights():
    cfg = small_cfg("NACF", dataset="MSRVTT", with_category=True)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    feats = [jnp.ones((2, cfg.n_frames, d)) for d in cfg.modality_dims]
    t1 = jnp.full((2, cfg.max_len), C.VIS, jnp.int32)
    t2 = jnp.full((2, cfg.max_len), C.MASK, jnp.int32)
    cat = jnp.zeros((2, 1), jnp.int32)
    out = model.apply(variables, feats, (t1, t2), cat, deterministic=True)
    assert len(out["tgt_word_logprobs"]) == 2
    # one decoder parameter set only (shared across the two passes)
    decoder_params = variables["params"]["decoder"]
    assert "layer_0" in decoder_params and "layer_1" not in decoder_params


def test_causal_masking_is_causal():
    """Changing a future token must not change past AR logits."""
    cfg = small_cfg("ARB")
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    feats = [jnp.ones((1, cfg.n_frames, d)) for d in cfg.modality_dims]
    enc = model.apply(variables, feats, method=lambda m, f: m.encode(f))
    tokens_a = jnp.array([[C.BOS, 7, 8, 9, 10, 0, 0, 0, 0, 0]])
    tokens_b = tokens_a.at[0, 4].set(33)

    def dec(tokens):
        lp, _ = model.apply(
            variables, tokens, enc["enc_output"], None, "ARFormer", True,
            method=lambda m, *a: m.decode_logprobs(*a))
        return np.asarray(lp)

    a, b = dec(tokens_a), dec(tokens_b)
    np.testing.assert_allclose(a[0, :4], b[0, :4], atol=1e-5)
    assert not np.allclose(a[0, 4], b[0, 4])


def test_nar_is_bidirectional():
    """NAR logits at position 0 must see position 4 (no causal mask)."""
    cfg = small_cfg("NAB")
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    feats = [jnp.ones((1, cfg.n_frames, d)) for d in cfg.modality_dims]
    enc = model.apply(variables, feats, method=lambda m, f: m.encode(f))
    tokens_a = jnp.array([[C.MASK, 7, 8, 9, 10, 0, 0, 0, 0, 0]])
    tokens_b = tokens_a.at[0, 4].set(33)

    def dec(tokens):
        lp, _ = model.apply(
            variables, tokens, enc["enc_output"], None, "NARFormer", True,
            method=lambda m, *a: m.decode_logprobs(*a))
        return np.asarray(lp)

    assert not np.allclose(dec(tokens_a)[0, 0], dec(tokens_b)[0, 0])


def test_batchnorm_updates_stats_in_training():
    cfg = small_cfg("NAB")
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    assert "batch_stats" in variables
    feats = [jnp.ones((2, cfg.n_frames, d)) for d in cfg.modality_dims]
    tokens = jnp.full((2, cfg.max_len), C.MASK, jnp.int32)
    out, updates = model.apply(
        variables, feats, tokens, None, False,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    flat_old = jax.tree_util.tree_leaves(variables["batch_stats"])
    flat_new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(flat_old, flat_new))


def test_fusion_addition_and_none():
    from navc_tpu.models.fusion import Fusion
    rng = np.random.RandomState(0)
    outs = [jnp.asarray(rng.randn(2, 4, 8).astype(np.float32)) for _ in range(2)]
    hids = [o.mean(1) for o in outs]

    fuse_add = Fusion(fusion="addition", norm_type="ln", num_streams=2, dim_hidden=8)
    v = fuse_add.init(jax.random.PRNGKey(0), outs, hids)
    out, hid = fuse_add.apply(v, outs, hids)
    assert out.shape == (2, 4, 8)  # temporal mean, not concat

    fuse_none = Fusion(fusion="none", no_encoder_bn=True, num_streams=2, dim_hidden=8)
    v = fuse_none.init(jax.random.PRNGKey(0), outs, hids)
    out, hid = fuse_none.apply(v, outs, hids)
    assert out.shape == (2, 8, 8)  # plain concat, no norm
    np.testing.assert_allclose(np.asarray(out),
                               np.concatenate([np.asarray(o) for o in outs], 1),
                               rtol=1e-6)
    assert hid.shape == (2, 8)


def test_sinusoid_position_encoding():
    from navc_tpu.models.layers import sinusoid_position_encoding
    pe = np.asarray(sinusoid_position_encoding(10, 8))
    assert pe.shape == (10, 8)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)   # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)   # cos(0)
    assert np.abs(pe).max() <= 1.0 + 1e-6
