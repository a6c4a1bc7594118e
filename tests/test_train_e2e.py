"""End-to-end integration: synthetic-corpus training for every method.

Mirrors the reference's training-as-integration-test strategy (SURVEY.md §4):
train -> validate -> checkpoint -> test-eval on a tiny synthetic dataset, for
the ARB teacher and the NACF student (teacher warm start + rescoring).
"""

import os

import numpy as np
import pytest

from navc_tpu.config import default_config
from navc_tpu.data.synthetic import make_synthetic_corpus, make_synthetic_feats
from navc_tpu.runtime.loop import train_network_all


def tiny_cfg(method, tmp_path, **kw):
    over = dict(
        vocab_size=40, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, n_total_frames=10,
        dim_i=12, dim_m=10, modality="mi", max_len=8, batch_size=4,
        epochs=2, hidden_dropout_prob=0.1, encoder_dropout=0.1,
        compute_dtype="float32",
        base_checkpoint_path=str(tmp_path), checkpoint_path="",
    )
    # teacher_path is resolved by the --default preset layer; re-apply the
    # explicit override after resolution so tests control the location
    teacher_path = kw.pop("teacher_path", None)
    over.update(kw)
    cfg = default_config(method, dataset="MSVD", **over)
    if teacher_path is not None:
        cfg = cfg.replace(teacher_path=teacher_path)
    return cfg


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("synth")
    cfg = tiny_cfg("ARB", tmp)
    corpus, refs = make_synthetic_corpus(cfg, n_videos=10, n_caps=2, vocab_size=40)
    feats = make_synthetic_feats(cfg, n_videos=10, n_total_frames=10)
    return tmp, corpus, refs, feats


def test_arb_end_to_end(synth):
    tmp, corpus, refs, feats = synth
    workdir = os.path.join(str(tmp), "ARB")
    cfg = tiny_cfg("ARB", tmp)
    out = train_network_all(cfg, workdir=workdir, info_corpus=corpus,
                            references=refs, in_memory_feats=feats, verbose=False)
    assert len(out["history"]) == 2
    losses = [h["train_loss"] for h in out["history"]]
    assert losses[-1] < losses[0], "training loss should decrease"
    assert "CIDEr" in out["test_res"]
    assert os.path.exists(os.path.join(workdir, "best.ckpt"))
    assert os.path.exists(os.path.join(workdir, "trainning_record.csv"))


def test_nacf_with_teacher_end_to_end(synth):
    tmp, corpus, refs, feats = synth
    teacher_path = os.path.join(str(tmp), "ARB", "best.ckpt")
    assert os.path.exists(teacher_path), "run test_arb_end_to_end first"

    workdir = os.path.join(str(tmp), "NACF")
    cfg = tiny_cfg("NACF", tmp, with_category=False,
                   teacher_path=teacher_path, length_beam_size=2, iterations=2)
    out = train_network_all(cfg, workdir=workdir, info_corpus=corpus,
                            references=refs, in_memory_feats=feats, verbose=False)
    assert len(out["history"]) == 2
    assert "CIDEr" in out["test_res"]
    # NAR adds the length loss
    assert "Length Loss" in out["test_res"]


def test_nab_no_ct(synth):
    tmp, corpus, refs, feats = synth
    teacher_path = os.path.join(str(tmp), "ARB", "best.ckpt")
    workdir = os.path.join(str(tmp), "NAB")
    cfg = tiny_cfg("NAB", tmp, teacher_path=teacher_path,
                   length_beam_size=2, iterations=2, epochs=1)
    out = train_network_all(cfg, workdir=workdir, info_corpus=corpus,
                            references=refs, in_memory_feats=feats, verbose=False)
    assert "CIDEr" in out["test_res"]


def test_arb2_visual_word_ar(synth):
    tmp, corpus, refs, feats = synth
    workdir = os.path.join(str(tmp), "ARB2")
    cfg = tiny_cfg("ARB2", tmp, epochs=1)
    out = train_network_all(cfg, workdir=workdir, info_corpus=corpus,
                            references=refs, in_memory_feats=feats, verbose=False)
    assert "CIDEr" in out["test_res"]
