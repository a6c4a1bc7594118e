"""Fused training-step integration: the custom-VJP layer inside the real
jitted train step (runtime/train_step._fused_train_apply).

With all dropout probabilities at 0 and compute_dtype=float32 the fused and
flax paths must produce (near-)identical losses and gradients; with the
production dropout on, training must still learn (loss decreases over steps
with identical data).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navc_tpu import constants as C
from navc_tpu.config import default_config
from navc_tpu.models import build_model, init_params
from navc_tpu.runtime.train_step import (create_train_state, make_train_step)


def small_cfg(method="NACF", **kw):
    over = dict(
        vocab_size=40, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, dim_i=12, dim_m=10, modality="mi",
        max_len=10, batch_size=4, compute_dtype="float32", use_pallas=True,
    )
    over.update(kw)
    return default_config(method, dataset="MSVD", **over)


def make_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    b = cfg.batch_size
    tokens = np.full((b, cfg.max_len), C.PAD, np.int32)
    labels = np.full((b, cfg.max_len), C.PAD, np.int32)
    for i in range(b):
        l = rng.randint(5, cfg.max_len)
        tokens[i, :l] = rng.randint(6, cfg.vocab_size, size=l)
        labels[i, :l] = rng.randint(6, cfg.vocab_size, size=l)
    lt = rng.rand(b, cfg.max_len).astype(np.float32)
    lt /= lt.sum(-1, keepdims=True)
    batch = {
        "tokens": jnp.asarray(tokens), "labels": jnp.asarray(labels),
        "tokens_1": jnp.full((b, cfg.max_len), C.VIS, jnp.int32),
        "labels_1": jnp.asarray(labels),
        "length_target": jnp.asarray(lt),
        "category": jnp.zeros((b, 1), jnp.int32),
    }
    for ch in cfg.modality.lower():
        batch["feats_%s" % ch] = jnp.asarray(
            rng.randn(b, cfg.n_frames, getattr(cfg, "dim_%s" % ch))
            .astype(np.float32))
    return batch


def _one_step(cfg, batch, seed=0):
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(seed), cfg)
    state, tx = create_train_state(cfg, model, variables)
    step = make_train_step(cfg, model, tx)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
    return new_state, {k: float(v) for k, v in metrics.items()}


@pytest.mark.parametrize("method", ["NACF", "ARB", "NAB"])
def test_fused_matches_flax_no_dropout(method):
    """p=0 + f32: fused and flax steps give (tightly) equal losses/metrics
    and equal updated params."""
    cfg = small_cfg(method, hidden_dropout_prob=0.0, encoder_dropout=0.0)
    batch = make_batch(cfg)

    os.environ["NAVC_NO_FUSED_TRAIN"] = "1"
    try:
        s_ref, m_ref = _one_step(cfg, batch)
    finally:
        del os.environ["NAVC_NO_FUSED_TRAIN"]
    s_fus, m_fus = _one_step(cfg, batch)

    for key in m_ref:
        np.testing.assert_allclose(m_fus[key], m_ref[key], rtol=2e-3,
                                   atol=1e-4, err_msg=key)
    # layer_0 params after one optimizer step agree
    ref_l = jax.tree_util.tree_leaves(s_ref.params["decoder"]["layer_0"])
    fus_l = jax.tree_util.tree_leaves(s_fus.params["decoder"]["layer_0"])
    for a, b in zip(ref_l, fus_l):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)


def test_fused_learns_with_dropout():
    """Dropout on: repeated steps on one batch reduce the loss — gradients
    through the stochastic kernel are useful. (At the production p=0.5 and
    toy dims both the flax and fused trajectories just bounce — see the
    committed A/B in docs/DESIGN.md — so this uses a moderate rate.)"""
    cfg = small_cfg("NACF", hidden_dropout_prob=0.1)
    batch = make_batch(cfg)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(cfg, model, variables)
    step = make_train_step(cfg, model, tx)
    rng = jax.random.PRNGKey(3)
    losses = []
    for i in range(12):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    # descent at toy dims is slow (~2-3%/12 steps, same for the flax path)
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.995, losses


def test_eligibility_gating():
    from navc_tpu.ops.eligibility import fused_train_eligible
    assert fused_train_eligible(small_cfg("NACF"))
    assert fused_train_eligible(small_cfg("ARB"))
    assert not fused_train_eligible(small_cfg("NACF", use_pallas=False))
    assert not fused_train_eligible(
        small_cfg("NACF", num_hidden_layers_decoder=2))
    assert not fused_train_eligible(
        small_cfg("NACF", attention_probs_dropout_prob=0.1))
    os.environ["NAVC_NO_FUSED_TRAIN"] = "1"
    try:
        assert not fused_train_eligible(small_cfg("NACF"))
    finally:
        del os.environ["NAVC_NO_FUSED_TRAIN"]
