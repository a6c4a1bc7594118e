"""CaptionPipeline: checkpoint -> captions serving façade."""

import os
import pickle

import numpy as np

from navc_tpu.api import CaptionPipeline
from navc_tpu.config import default_config
from navc_tpu.data.synthetic import make_synthetic_corpus, make_synthetic_feats
from navc_tpu.runtime.loop import train_network_all


def test_pipeline_from_checkpoint(tmp_path):
    over = dict(
        vocab_size=40, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, n_total_frames=10,
        dim_i=12, dim_m=10, modality="mi", max_len=8, batch_size=4,
        epochs=1, hidden_dropout_prob=0.1, encoder_dropout=0.1,
        compute_dtype="float32", no_test=True, length_beam_size=2,
        iterations=2, base_checkpoint_path=str(tmp_path),
    )
    cfg = default_config("NAB", dataset="MSVD", **over)
    # missing teacher paths are fatal (reference opts.py:208); this test
    # trains a teacher-free NAB (replace AFTER the --default preset layer,
    # which resolves a teacher path)
    cfg = cfg.replace(teacher_path="", load_teacher_weights=False,
                      with_teacher=False)
    corpus, refs = make_synthetic_corpus(cfg, n_videos=8, n_caps=2, vocab_size=40)
    feats = make_synthetic_feats(cfg, n_videos=8, n_total_frames=10)
    workdir = os.path.join(str(tmp_path), "run")
    train_network_all(cfg, workdir=workdir, info_corpus=corpus,
                      references=refs, in_memory_feats=feats, verbose=False)

    corpus_path = os.path.join(str(tmp_path), "info_corpus.pkl")
    with open(corpus_path, "wb") as f:
        pickle.dump(corpus, f)

    pipe = CaptionPipeline.from_checkpoints(
        os.path.join(workdir, "best.ckpt"), info_corpus=corpus_path)

    rng = np.random.RandomState(0)
    b = 3
    batch_feats = {
        "feats_i": rng.randn(b, cfg.n_frames, cfg.dim_i).astype(np.float32),
        "feats_m": rng.randn(b, cfg.n_frames, cfg.dim_m).astype(np.float32),
    }
    ids = pipe.caption_ids(batch_feats)
    assert ids.shape == (b, cfg.max_len)
    sents = pipe.caption(batch_feats)
    assert len(sents) == b
    assert all(isinstance(s, str) for s in sents)
    assert all("<mask>" not in s for s in sents)
