"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Validates the BASELINE.json config-5 scenario (batch x length-beam inference
sweep over the mesh) and that data-parallel training is numerically identical
to single-device training (global-batch BN stats + gradient all-reduce).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from navc_tpu import constants as C
from navc_tpu.config import default_config
from navc_tpu.decoding import make_nar_generator
from navc_tpu.models import build_model, init_params
from navc_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from navc_tpu.runtime.train_step import create_train_state, make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def small_cfg(method="NAB", **kw):
    over = dict(
        vocab_size=64, dim_hidden=32, num_attention_heads=4,
        intermediate_size=64, n_frames=4, dim_i=16, dim_m=16, modality="mi",
        max_len=10, batch_size=8, length_beam_size=2, iterations=2,
        compute_dtype="float32",
    )
    over.update(kw)
    return default_config(method, dataset="MSVD", **over)


def make_batch(cfg, b, seed=0):
    rng = np.random.RandomState(seed)
    lengths = rng.randint(3, cfg.max_len - 1, size=b)
    tokens = np.full((b, cfg.max_len), C.PAD, np.int32)
    labels = np.full((b, cfg.max_len), C.PAD, np.int32)
    for i in range(b):
        l = lengths[i]
        tokens[i, :l] = rng.randint(6, cfg.vocab_size, size=l)
        tokens[i, : l // 2] = C.MASK
        labels[i, : l // 2] = rng.randint(6, cfg.vocab_size, size=l // 2)
    lt = rng.rand(b, cfg.max_len).astype(np.float32)
    lt /= lt.sum(-1, keepdims=True)
    batch = {
        "tokens": tokens, "labels": labels, "length_target": lt,
        "category": rng.randint(0, cfg.num_category, size=(b, 1)).astype(np.int32),
        "valid_mask": np.ones(b, np.float32),
    }
    for ch in cfg.modality.lower():
        batch["feats_%s" % ch] = rng.randn(
            b, cfg.n_frames, getattr(cfg, "dim_%s" % ch)).astype(np.float32)
    return batch


def test_dp_training_matches_single_device():
    cfg = small_cfg("NAB")
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg, cfg.batch_size)
    rng = jax.random.PRNGKey(42)

    # single device
    state1, tx1 = create_train_state(cfg, model, variables)
    step1 = make_train_step(cfg, model, tx1)
    new1, m1 = step1(state1, {k: jnp.asarray(v) for k, v in batch.items()}, rng)

    # 8-device data parallel
    mesh = make_mesh({"data": 8, "model": 1})
    state8, tx8 = create_train_state(cfg, model, variables)
    sharded = state8._replace(params=shard_params(state8.params, mesh),
                              batch_stats=shard_params(state8.batch_stats, mesh)
                              if state8.batch_stats else {})
    step8 = make_train_step(cfg, model, tx8)
    new8, m8 = step8(sharded, shard_batch(batch, mesh), rng)

    assert abs(float(m1["total_loss"]) - float(m8["total_loss"])) < 1e-5
    # Adam amplifies reduction-order float noise for near-zero gradients
    # (update -> ±lr·sign(g)); bound the param delta by the lr scale instead
    # of exact equality
    l1 = jax.tree_util.tree_leaves(new1.params)
    l8 = jax.tree_util.tree_leaves(new8.params)
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(l1, l8))
    assert worst < 2 * cfg.learning_rate, worst


def test_tp_training_runs_and_matches():
    cfg = small_cfg("NAB")
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg, cfg.batch_size)
    rng = jax.random.PRNGKey(42)

    state1, tx1 = create_train_state(cfg, model, variables)
    step1 = make_train_step(cfg, model, tx1)
    _, m1 = step1(state1, {k: jnp.asarray(v) for k, v in batch.items()}, rng)

    mesh = make_mesh({"data": 4, "model": 2})
    state, tx = create_train_state(cfg, model, variables)
    sharded = state._replace(params=shard_params(state.params, mesh),
                             batch_stats=shard_params(state.batch_stats, mesh)
                             if state.batch_stats else {})
    step = make_train_step(cfg, model, tx)
    _, m = step(sharded, shard_batch(batch, mesh), rng)
    assert abs(float(m1["total_loss"]) - float(m["total_loss"])) < 1e-4


def test_sharded_inference_sweep_matches_single_device():
    """NAR generate with the (B·lbs) sweep sharded over 'data'."""
    cfg = small_cfg("NAB")
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    b = 8
    rng = np.random.RandomState(1)
    feats = [jnp.asarray(rng.randn(b, cfg.n_frames, d).astype(np.float32))
             for d in cfg.modality_dims]
    enc = model.apply(variables, feats, method=lambda m, f: m.encode(f))

    gen = make_nar_generator(cfg, model)
    ref = np.asarray(gen(variables, enc, None))

    mesh = make_mesh({"data": 8, "model": 1})
    sharded_vars = shard_params(variables, mesh)
    enc_sharded = {
        k: jax.device_put(v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))))
        for k, v in enc.items()
    }
    out = np.asarray(gen(sharded_vars, enc_sharded, None))
    np.testing.assert_array_equal(out, ref)
