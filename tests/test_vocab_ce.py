"""Fused vocab projection + cross-entropy kernel (ops/vocab_ce).

Interpret-mode CPU checks (CLAUDE.md kernel rule; the device half lives in
scripts/kernel_device_parity.py::check_vocab_ce): forward parity against a
full-materialization reference, custom-VJP gradients against jax.grad of the
same reference loss, and the train-step integration A/B via the
NAVC_NO_FUSED_CE kill-switch.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navc_tpu.ops.vocab_ce import reference_ce, vocab_ce_train

from test_fused_train_step import make_batch, small_cfg, _one_step


def _inputs(seed=0, b=4, l=7, d=64, v=157, scale=0.3):
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(b, l, d).astype(np.float32))
    w = jnp.asarray((rng.randn(d, v) * scale).astype(np.float32))
    bias = jnp.asarray((rng.randn(v) * 0.1).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, v, (b, l)), jnp.int32)
    return h, w, bias, lab


@pytest.mark.parametrize("v", [157, 128, 40])
@pytest.mark.parametrize("with_bias", [True, False])
def test_fwd_parity_f32(v, with_bias):
    """f32 label log-probs match the reference exactly; argmax ids equal.

    v=157 exercises padded vocab columns (NEG_INF bias masking), v=128 the
    no-padding fast path, v=40 a sub-lane-tile vocab.
    """
    h, w, bias, lab = _inputs(v=v)
    if not with_bias:
        bias = None
    g, p = vocab_ce_train(h, w, bias, lab, compute_dtype=jnp.float32,
                          interpret=True)
    gr, pr = reference_ce(h, w, bias, lab)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(pr))


def test_partial_row_tile():
    """Row counts that are not multiples of the tile (nor of 8) pad cleanly."""
    h, w, bias, lab = _inputs(b=1, l=3)  # N=3 -> padded to 8
    g, p = vocab_ce_train(h, w, bias, lab, compute_dtype=jnp.float32,
                          interpret=True)
    gr, pr = reference_ce(h, w, bias, lab)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(pr))


@pytest.mark.parametrize("with_bias", [True, False])
def test_grads_match_reference(with_bias):
    """d(loss)/d(h, w, bias) through the in-kernel backward equals jax.grad
    of the materialized reference, including PAD-masked rows (zero
    cotangent rows must contribute nothing to dW/db)."""
    h, w, bias, lab = _inputs(seed=3)
    mask = jnp.asarray(
        np.random.RandomState(5).rand(*lab.shape) > 0.4, jnp.float32)

    def loss(fn, *args):
        g, _ = fn(*args)
        return -(g * mask).sum() / h.shape[0]

    if with_bias:
        f_fus = lambda h, w, b: loss(
            lambda *a: vocab_ce_train(*a, lab, compute_dtype=jnp.float32,
                                      interpret=True), h, w, b)
        f_ref = lambda h, w, b: loss(lambda *a: reference_ce(*a, lab), h, w, b)
        gf = jax.grad(f_fus, argnums=(0, 1, 2))(h, w, bias)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(h, w, bias)
    else:
        f_fus = lambda h, w: loss(
            lambda *a: vocab_ce_train(*a, None, lab,
                                      compute_dtype=jnp.float32,
                                      interpret=True), h, w)
        f_ref = lambda h, w: loss(lambda *a: reference_ce(*a, None, lab), h, w)
        gf = jax.grad(f_fus, argnums=(0, 1))(h, w)
        gr = jax.grad(f_ref, argnums=(0, 1))(h, w)

    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fully_masked_rows_zero_grad():
    """An all-zero cotangent (e.g. a padded final batch row) yields exactly
    zero dW/db — the backward's per-row dscores scale by the cotangent."""
    h, w, bias, lab = _inputs(seed=7)

    def loss(h, w, b):
        g, _ = vocab_ce_train(h, w, b, lab, compute_dtype=jnp.float32,
                              interpret=True)
        return (g * 0.0).sum()

    dh, dw, db = jax.grad(loss, argnums=(0, 1, 2))(h, w, bias)
    assert float(jnp.abs(dh).max()) == 0.0
    assert float(jnp.abs(dw).max()) == 0.0
    assert float(jnp.abs(db).max()) == 0.0


def test_bf16_close_to_f32():
    """bf16 matmul path: f32-accumulated scores keep the label log-prob
    within bf16 input-rounding error of the f32 reference."""
    h, w, bias, lab = _inputs(seed=11)
    h16 = h.astype(jnp.bfloat16).astype(jnp.float32)
    w16 = w.astype(jnp.bfloat16).astype(jnp.float32)
    g, p = vocab_ce_train(h16, w16, bias, lab, compute_dtype=jnp.bfloat16,
                          interpret=True)
    gr, _ = reference_ce(h16, w16, bias, lab)
    # inputs are bf16-representable, so only the f32-vs-bf16 dot ordering
    # differs; interpret mode computes both in f32 -> tight
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("method", ["NACF", "ARB"])
def test_train_step_ce_ab(method):
    """The full train step with the fused-CE path vs the XLA logits path
    (NAVC_NO_FUSED_CE): identical data, p=0, f32 -> matching metrics and
    updated decoder params. Covers the tied/untied projection wiring, the
    visual-word two-pass labels, and the AR label shift."""
    cfg = small_cfg(method, hidden_dropout_prob=0.0, encoder_dropout=0.0)
    batch = make_batch(cfg)

    os.environ["NAVC_NO_FUSED_CE"] = "1"
    try:
        s_ref, m_ref = _one_step(cfg, batch)
    finally:
        del os.environ["NAVC_NO_FUSED_CE"]
    s_fus, m_fus = _one_step(cfg, batch)

    for key in m_ref:
        np.testing.assert_allclose(m_fus[key], m_ref[key], rtol=2e-3,
                                   atol=1e-4, err_msg=key)
    ref_l = jax.tree_util.tree_leaves(s_ref.params)
    fus_l = jax.tree_util.tree_leaves(s_fus.params)
    for a, b in zip(ref_l, fus_l):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)


def test_ce_eligibility():
    from navc_tpu.ops.eligibility import fused_vocab_ce_eligible
    assert fused_vocab_ce_eligible(small_cfg("NACF"))
    assert not fused_vocab_ce_eligible(small_cfg("NACF", use_pallas=False))
    # a vocab too large for the whole-V resident backward is rejected
    assert not fused_vocab_ce_eligible(small_cfg("NACF", vocab_size=3_000_000))
    os.environ["NAVC_NO_FUSED_CE"] = "1"
    try:
        assert not fused_vocab_ce_eligible(small_cfg("NACF"))
    finally:
        del os.environ["NAVC_NO_FUSED_CE"]
