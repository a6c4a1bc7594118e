"""Candidate-collection modes: NAR per-iteration results, AR n-best."""

import jax
import jax.numpy as jnp
import numpy as np

from navc_tpu import constants as C
from navc_tpu.config import default_config
from navc_tpu.decoding import make_ar_generator, make_nar_generator
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


def setup(cfg, seed=0):
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(seed), cfg)
    feats = [jnp.asarray(np.random.RandomState(seed + 1)
                         .randn(2, cfg.n_frames, d).astype(np.float32))
             for d in cfg.modality_dims]
    enc = model.apply(variables, feats, method=lambda m, f: m.encode(f))
    return model, variables, enc


def test_nar_iterative_collection():
    cfg = small_cfg("NAB")
    model, variables, enc = setup(cfg)
    gen = make_nar_generator(cfg, model, jit=False, collect=True)
    best, (iter_toks, iter_probs) = gen(variables, enc, None)
    assert best.shape == (2, cfg.max_len)
    # T iterations collected (no CT): iterations count
    assert iter_toks.shape == (2, cfg.iterations, cfg.max_len)
    assert iter_probs.shape == (2, cfg.iterations, cfg.max_len)
    # the last iteration's canvas must equal the final hypothesis
    np.testing.assert_array_equal(np.asarray(iter_toks[:, -1]), np.asarray(best))


def test_ar_nbest():
    cfg = small_cfg("ARB").replace(beam_size=3, topk=3)
    model, variables, enc = setup(cfg)
    gen = make_ar_generator(cfg, model, jit=False)
    hyps, scores = gen(variables, enc, None)
    assert hyps.shape == (2, 3, cfg.max_len - 1)
    assert scores.shape == (2, 3)
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all(), "n-best must be sorted desc"
    # the top-1 must match the topk=1 generator
    cfg1 = cfg.replace(topk=1)
    gen1 = make_ar_generator(cfg1, model, jit=False)
    h1, s1 = gen1(variables, enc, None)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(hyps[:, 0]))


def test_ar_collect_run_eval(tmp_path):
    """The reference collects AR candidates whenever collect+ARFormer,
    independent of topk (run.py:126): a topk==1 collect run must produce
    caption/score pairs, not an empty pickle."""
    import os
    import pickle

    from navc_tpu.data.loader import get_loader
    from navc_tpu.data.synthetic import make_synthetic_corpus, make_synthetic_feats
    from navc_tpu.runtime.evaluate import Evaluator, run_eval

    for topk in (1, 2):
        cfg = small_cfg("ARB").replace(beam_size=3, topk=topk, batch_size=4)
        corpus, refs = make_synthetic_corpus(cfg, n_videos=8, n_caps=2,
                                             vocab_size=cfg.vocab_size)
        feats = make_synthetic_feats(cfg, n_videos=8,
                                     n_total_frames=cfg.n_total_frames)
        loader = get_loader(cfg, "validate", info_corpus=corpus,
                            in_memory_feats=feats)
        loader.dataset.set_references(refs)
        model = build_model(cfg)
        variables = init_params(model, jax.random.PRNGKey(0), cfg)
        ev = Evaluator(cfg, model)
        path = os.path.join(str(tmp_path), "collect_top%d.pkl" % topk)
        out = run_eval(cfg, ev, variables, loader,
                       loader.dataset.get_vocab(), collect_path=path)
        assert out["collected"] > 0
        with open(path, "rb") as f:
            collected = pickle.load(f)
        assert len(collected) == len(loader.dataset)
        for vid, entries in collected.items():
            assert len(entries) == topk
            for e in entries:
                assert set(e) == {"caption", "score"}
                assert isinstance(e["score"], float)


def test_scoring_rejects_nbest(tmp_path):
    """Scoring n-best lists would corrupt metrics (the reference asserts one
    hypothesis per video when scoring, run.py:158)."""
    import pytest

    from navc_tpu.data.loader import get_loader
    from navc_tpu.data.synthetic import make_synthetic_corpus, make_synthetic_feats
    from navc_tpu.runtime.evaluate import Evaluator, run_eval

    cfg = small_cfg("ARB").replace(beam_size=3, topk=2, batch_size=4)
    corpus, refs = make_synthetic_corpus(cfg, n_videos=8, n_caps=2,
                                         vocab_size=cfg.vocab_size)
    feats = make_synthetic_feats(cfg, n_videos=8,
                                 n_total_frames=cfg.n_total_frames)
    loader = get_loader(cfg, "validate", info_corpus=corpus,
                        in_memory_feats=feats)
    loader.dataset.set_references(refs)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    ev = Evaluator(cfg, model)
    with pytest.raises(ValueError, match="topk"):
        run_eval(cfg, ev, variables, loader, loader.dataset.get_vocab())
