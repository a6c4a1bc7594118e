"""Fused training-layer kernel (ops/fused_layer_train): interpret-mode parity.

Strategy (per the repo kernel-testing convention): compute_dtype=float32 so
the recompute-in-backward custom VJP can be compared tightly against
``jax.grad`` of the flax decoder path; dropout correctness (p > 0) is
validated with a central finite-difference check through the in-kernel
hash-RNG masks, which are deterministic given (seed, tile, site).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navc_tpu import constants as C
from navc_tpu.config import default_config
from navc_tpu.models import build_model, init_params
from navc_tpu.ops.fused_layer import layer_weights_from_params
from navc_tpu.ops.fused_layer_train import fused_bert_layer_train


def small_cfg(method="NAB", **kw):
    over = dict(
        vocab_size=30, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, dim_i=12, dim_m=10, modality="mi",
        max_len=10, batch_size=2, compute_dtype="float32",
    )
    over.update(kw)
    return default_config(method, dataset="MSVD", **over)


def _setup(method="NAB", seed=0, n=5):
    cfg = small_cfg(method)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed + 1)
    enc = jnp.asarray(
        rng.randn(n, 2 * cfg.n_frames, cfg.dim_hidden).astype(np.float32))
    tokens = np.full((n, cfg.max_len), C.PAD, np.int32)
    for i in range(n):
        l = rng.randint(4, cfg.max_len)
        tokens[i, :l] = rng.randint(4, cfg.vocab_size, size=l)
    return cfg, model, variables, enc, jnp.asarray(tokens)


def _fused_forward(cfg, model, variables, tokens, enc, *, decoding_type,
                   p_hidden, seed):
    causal = decoding_type == "ARFormer"
    method = "ar_embed" if causal else "nar_embed"
    if causal:
        emb = model.apply(variables, tokens,
                          method=lambda m, t: m.ar_embed(t))
    else:
        emb = model.apply(variables, tokens, enc,
                          method=lambda m, t, e: m.nar_embed(t, e))
    weights = layer_weights_from_params(
        variables["params"]["decoder"]["layer_0"])
    return fused_bert_layer_train(
        emb, enc, tokens == C.PAD, weights, seed,
        n_head=cfg.num_attention_heads, tb=2, causal=causal,
        p_hidden=p_hidden, compute_dtype=jnp.float32, interpret=True)


@pytest.mark.parametrize("decoding_type", ["NARFormer", "ARFormer"])
def test_fwd_matches_flax_p0(decoding_type):
    """p=0 forward is (tightly) the flax BertLayer in eval mode."""
    cfg, model, variables, enc, tokens = _setup()
    seed = jnp.array([7], jnp.int32)

    ref, _, _ = model.apply(
        variables, tokens, enc, None, decoding_type, True,
        method=lambda m, *a: m.decode(*a))
    out = _fused_forward(cfg, model, variables, tokens, enc,
                         decoding_type=decoding_type, p_hidden=0.0, seed=seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    pad = np.asarray(tokens) == C.PAD
    np.testing.assert_allclose(np.asarray(out)[pad], 0.0, atol=1e-6)


@pytest.mark.parametrize("decoding_type", ["NARFormer", "ARFormer"])
def test_grads_match_flax_p0(decoding_type):
    """Custom-VJP gradients == jax.grad of the flax decode path (p=0, f32),
    for the layer weights, the embedding tables upstream, and enc."""
    cfg, model, variables, enc, tokens = _setup()
    seed = jnp.array([7], jnp.int32)
    rng = np.random.RandomState(9)
    g_out = jnp.asarray(
        rng.randn(tokens.shape[0], cfg.max_len, cfg.dim_hidden)
        .astype(np.float32))

    def loss_ref(params, enc):
        hidden, _, _ = model.apply(
            {"params": params}, tokens, enc, None, decoding_type, True,
            method=lambda m, *a: m.decode(*a))
        return jnp.sum(hidden * g_out)

    def loss_fused(params, enc):
        out = _fused_forward(cfg, model, {"params": params}, tokens, enc,
                             decoding_type=decoding_type, p_hidden=0.0,
                             seed=seed)
        return jnp.sum(out * g_out)

    gr_ref = jax.grad(loss_ref, argnums=(0, 1))(variables["params"], enc)
    gr_fus = jax.grad(loss_fused, argnums=(0, 1))(variables["params"], enc)

    # enc cotangent (kernel denc + any embedding enhance-input flows)
    np.testing.assert_allclose(np.asarray(gr_fus[1]), np.asarray(gr_ref[1]),
                               rtol=1e-3, atol=1e-4)
    # every layer weight gradient
    ref_layer = gr_ref[0]["decoder"]["layer_0"]
    fus_layer = gr_fus[0]["decoder"]["layer_0"]
    flat_r, _ = jax.tree_util.tree_flatten_with_path(ref_layer)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(fus_layer)
    for (pr, vr), (pf, vf) in zip(flat_r, flat_f):
        assert pr == pf
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vr), rtol=2e-3, atol=2e-4,
            err_msg=str(pr))
    # embedding gradients (flow through dx into the tables)
    ref_emb = gr_ref[0]["decoder"]["embedding"]
    fus_emb = gr_fus[0]["decoder"]["embedding"]
    for key in ref_emb:
        ra, fa = jax.tree_util.tree_leaves(ref_emb[key]), \
            jax.tree_util.tree_leaves(fus_emb[key])
        for a, b in zip(ra, fa):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-3, atol=2e-4, err_msg=key)


def test_dropout_finite_difference():
    """p=0.5: the custom VJP is the true derivative of the (fixed-seed)
    stochastic forward — validates mask regeneration in both bwd kernels."""
    cfg, model, variables, enc, tokens = _setup()
    seed = jnp.array([42], jnp.int32)
    weights = layer_weights_from_params(
        variables["params"]["decoder"]["layer_0"])
    emb = model.apply(variables, tokens, enc,
                      method=lambda m, t, e: m.nar_embed(t, e))
    rng = np.random.RandomState(3)
    g_out = jnp.asarray(rng.randn(*emb.shape).astype(np.float32))

    def f(x, enc, weights):
        out = fused_bert_layer_train(
            x, enc, tokens == C.PAD, weights, seed,
            n_head=cfg.num_attention_heads, tb=2, causal=False,
            p_hidden=0.5, p_input=0.3, compute_dtype=jnp.float32,
            interpret=True)
        return jnp.sum(out * g_out)

    val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(emb, enc, weights)

    eps = 1e-3
    # direction in x
    vx = jnp.asarray(rng.randn(*emb.shape).astype(np.float32))
    fd = (f(emb + eps * vx, enc, weights)
          - f(emb - eps * vx, enc, weights)) / (2 * eps)
    an = jnp.sum(grads[0] * vx)
    np.testing.assert_allclose(float(fd), float(an), rtol=2e-2)
    # direction in enc
    ve = jnp.asarray(rng.randn(*enc.shape).astype(np.float32))
    fd = (f(emb, enc + eps * ve, weights)
          - f(emb, enc - eps * ve, weights)) / (2 * eps)
    an = jnp.sum(grads[1] * ve)
    np.testing.assert_allclose(float(fd), float(an), rtol=2e-2)
    # direction in the full weight pytree
    vw = {k: jnp.asarray(rng.randn(*np.shape(v)).astype(np.float32))
          for k, v in weights.items()}
    wp = {k: weights[k] + eps * vw[k] for k in weights}
    wm = {k: weights[k] - eps * vw[k] for k in weights}
    fd = (f(emb, enc, wp) - f(emb, enc, wm)) / (2 * eps)
    an = sum(jnp.sum(grads[2][k] * vw[k]) for k in weights)
    np.testing.assert_allclose(float(fd), float(an), rtol=2e-2)


def test_dropout_determinism_and_stats():
    cfg, model, variables, enc, tokens = _setup()
    weights = layer_weights_from_params(
        variables["params"]["decoder"]["layer_0"])
    emb = model.apply(variables, tokens, enc,
                      method=lambda m, t, e: m.nar_embed(t, e))

    def run(seed_val, p):
        return fused_bert_layer_train(
            emb, enc, tokens == C.PAD, weights,
            jnp.array([seed_val], jnp.int32),
            n_head=cfg.num_attention_heads, tb=2, causal=False,
            p_hidden=p, compute_dtype=jnp.float32, interpret=True)

    a = np.asarray(run(1, 0.5))
    b = np.asarray(run(1, 0.5))
    c = np.asarray(run(2, 0.5))
    assert (a == b).all(), "same seed must give identical dropout"
    assert not (a == c).all(), "different seeds must differ"

    # E[dropout(v)] = v: many-seed mean approaches the p=0 forward
    base = np.asarray(run(0, 0.0))
    acc = np.zeros_like(base)
    n_seeds = 24
    for s in range(n_seeds):
        acc += np.asarray(run(100 + s, 0.5))
    mean = acc / n_seeds
    mask = np.abs(base) > 0.5
    assert mask.sum() > 50
    ratio = mean[mask] / base[mask]
    assert abs(float(ratio.mean()) - 1.0) < 0.15


def test_hash_mask_keep_rate():
    from navc_tpu.ops.fused_layer_train import _hash24
    bits = np.asarray(_hash24(jnp.int32(123), jnp.int32(0), 1, 256, 512))
    frac = (bits < (1 << 23)).mean()  # p = 0.5 threshold
    assert abs(frac - 0.5) < 0.02
    # rows decorrelated: no column identical across adjacent rows
    assert (bits[0] != bits[1]).mean() > 0.99


def test_grad_with_float_kp_mask():
    """The docstring allows bool OR float masks; a float mask primal must get
    a float (not float0) cotangent from the custom bwd rule."""
    cfg, model, variables, enc, tokens = _setup("NAB")
    emb = model.apply(variables, tokens, enc,
                      method=lambda m, t, e: m.nar_embed(t, e))
    weights = layer_weights_from_params(
        variables["params"]["decoder"]["layer_0"])
    fmask = (tokens == C.PAD).astype(jnp.float32)

    def loss(x, mask):
        out = fused_bert_layer_train(
            x, enc, mask, weights, jnp.zeros((1,), jnp.int32),
            n_head=cfg.num_attention_heads, tb=2, causal=False,
            p_hidden=0.0, compute_dtype=jnp.float32, interpret=True)
        return jnp.sum(out ** 2)

    gx, gm = jax.grad(loss, argnums=(0, 1))(emb, fmask)
    assert gx.shape == emb.shape and np.isfinite(np.asarray(gx)).all()
    assert gm.shape == fmask.shape and gm.dtype == jnp.float32
