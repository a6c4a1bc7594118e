"""Mid-training resume: optimizer state + lr schedule survive a restart."""

import os

import numpy as np

from navc_tpu.config import default_config
from navc_tpu.data.synthetic import make_synthetic_corpus, make_synthetic_feats
from navc_tpu.runtime.checkpoint import load_checkpoint
from navc_tpu.runtime.loop import train_network_all


def test_resume_continues_from_checkpoint(tmp_path):
    over = dict(
        vocab_size=40, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, n_total_frames=10,
        dim_i=12, dim_m=10, modality="mi", max_len=8, batch_size=4,
        epochs=2, hidden_dropout_prob=0.1, encoder_dropout=0.1,
        compute_dtype="float32", no_test=True,
        base_checkpoint_path=str(tmp_path),
    )
    cfg = default_config("ARB", dataset="MSVD", **over)
    corpus, refs = make_synthetic_corpus(cfg, n_videos=8, n_caps=2, vocab_size=40)
    feats = make_synthetic_feats(cfg, n_videos=8, n_total_frames=10)
    workdir = os.path.join(str(tmp_path), "run")

    out1 = train_network_all(cfg, workdir=workdir, info_corpus=corpus,
                             references=refs, in_memory_feats=feats, verbose=False)
    ckpt = load_checkpoint(os.path.join(workdir, "checkpoint.ckpt"))
    assert ckpt["epoch"] == 2
    assert ckpt["opt_state"] is not None
    assert ckpt["lr_schedule"]["n_current_steps"] > 0

    # resume with a higher epoch budget: continues from epoch 2, not 0
    cfg2 = cfg.replace(epochs=3)
    out2 = train_network_all(cfg2, workdir=workdir, info_corpus=corpus,
                             references=refs, in_memory_feats=feats,
                             verbose=False, resume=True)
    assert len(out2["history"]) == 1  # only epoch 2 ran
    ckpt2 = load_checkpoint(os.path.join(workdir, "checkpoint.ckpt"))
    assert ckpt2["epoch"] == 3
    # lr decayed across all three epochs total
    assert ckpt2["lr_schedule"]["learning_rate"] < ckpt["lr_schedule"]["learning_rate"]


def test_orbax_backend_roundtrip(tmp_path):
    pytest_orbax = __import__("pytest")
    try:
        import orbax.checkpoint  # noqa: F401
    except Exception:
        pytest_orbax.skip("orbax unavailable")
    import jax
    import numpy as np
    from navc_tpu.models import build_model, init_params
    from navc_tpu.runtime.checkpoint import (load_checkpoint_orbax,
                                             save_checkpoint_orbax)

    cfg = default_config(
        "NAB", dataset="MSVD", vocab_size=40, dim_hidden=16,
        num_attention_heads=2, intermediate_size=32, n_frames=4,
        dim_i=12, dim_m=10, modality="mi", max_len=8,
        compute_dtype="float32")
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    state = {"epoch": 3, "params": variables["params"],
             "batch_stats": variables.get("batch_stats"),
             "settings": cfg}
    d = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(state, d)
    loaded = load_checkpoint_orbax(d)
    assert loaded["epoch"] == 3
    assert loaded["settings"]["vocab_size"] == 40
    a = jax.tree_util.tree_leaves(variables["params"])
    b = jax.tree_util.tree_leaves(loaded["params"])
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_orbax_opt_state_template_restore(tmp_path):
    """Orbax restores untyped containers; the templates arg must bring optax
    NamedTuple states back in a form tx.update accepts."""
    import pytest as pytest_orbax
    try:
        import orbax.checkpoint  # noqa: F401
    except Exception:
        pytest_orbax.skip("orbax unavailable")
    import jax
    import jax.numpy as jnp
    from navc_tpu.models import build_model, init_params
    from navc_tpu.runtime.checkpoint import (load_checkpoint_orbax,
                                             save_checkpoint_orbax)
    from navc_tpu.runtime.optim import make_optimizer

    cfg = default_config(
        "ARB", dataset="MSVD", vocab_size=40, dim_hidden=16,
        num_attention_heads=2, intermediate_size=32, n_frames=4,
        dim_i=12, dim_m=10, modality="mi", max_len=8,
        compute_dtype="float32")
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg)
    opt_state = tx.init(variables["params"])

    d = str(tmp_path / "orbax_opt")
    save_checkpoint_orbax({"epoch": 1, "params": variables["params"],
                           "opt_state": opt_state, "settings": cfg}, d)
    loaded = load_checkpoint_orbax(
        d, templates={"opt_state": tx.init(variables["params"])})
    grads = jax.tree_util.tree_map(jnp.ones_like, variables["params"])
    updates, _ = tx.update(grads, loaded["opt_state"], variables["params"])
    assert jax.tree_util.tree_structure(updates) == \
        jax.tree_util.tree_structure(variables["params"])
