"""CLI integration: train + translate through the real file-based pipeline."""

import json
import os
import pickle

import pytest

from navc_tpu.config import Config
from navc_tpu.data.synthetic import (make_synthetic_corpus,
                                     make_synthetic_feats, write_hdf5_feats)


@pytest.fixture(scope="module")
def data_tree(tmp_path_factory):
    """A data directory shaped like the reference layout."""
    tmp = tmp_path_factory.mktemp("clidata")
    ddir = tmp / "Youtube2Text"
    (ddir / "feats").mkdir(parents=True)

    cfg = Config(dataset="Youtube2Text", modality="i", dim_i=12, max_len=8,
                 n_frames=4, n_total_frames=10)
    corpus, refs = make_synthetic_corpus(cfg, n_videos=8, n_caps=2, vocab_size=40)
    feats = make_synthetic_feats(cfg, n_videos=8, n_total_frames=10)
    with open(ddir / "info_corpus.pkl", "wb") as f:
        pickle.dump(corpus, f)
    with open(ddir / "refs.pkl", "wb") as f:
        pickle.dump(refs, f)
    write_hdf5_feats(str(ddir / "feats" / "image_feats.hdf5"), feats["feats_i"])
    return tmp


def test_train_and_translate_cli(data_tree, tmp_path):
    from navc_tpu.cli.train import main as train_main
    from navc_tpu.cli.translate import main as translate_main

    ckpt_root = str(tmp_path / "experiments")
    common = [
        "--dataset", "MSVD", "--method", "ARB", "--scope", "t",
        "--modality", "i", "--dim_i", "12", "--dim_hidden", "16",
        "--num_attention_heads", "2", "--intermediate_size", "32",
        "--n_frames", "4", "--max_len", "8", "--batch_size", "4",
        "--epochs", "1", "--beam_size", "2",
        "--feats_i_name", "image_feats.hdf5",
        "--base_data_path", str(data_tree),
        "--base_checkpoint_path", ckpt_root,
        "--compute_dtype", "float32",
        "--hidden_dropout_prob", "0.1",
    ]
    out = train_main(common)
    workdir = os.path.join(ckpt_root, "Youtube2Text", "ARB", "t")
    assert os.path.exists(os.path.join(workdir, "best.ckpt"))
    assert os.path.exists(os.path.join(workdir, "opt_info.json"))
    with open(os.path.join(workdir, "opt_info.json")) as f:
        saved = json.load(f)
    assert saved["vocab_size"] == 40
    assert "CIDEr" in out["test_res"]

    results = translate_main([
        "--model_path", os.path.join(workdir, "best.ckpt"),
        "-em", "test", "-analyze", "-bs", "2",
    ])
    assert "CIDEr" in results["test"]
    assert "ave_length" in results["test"]


def test_full_nacf_workflow_cli(data_tree, tmp_path):
    """The reference's canonical workflow (README.md:150-181): train ARB,
    train NACF with the ARB teacher, evaluate NACF with --default + CT."""
    from navc_tpu.cli.train import main as train_main
    from navc_tpu.cli.translate import main as translate_main

    ckpt_root = str(tmp_path / "experiments")
    base = [
        "--dataset", "MSVD", "--scope", "w",
        "--modality", "i", "--dim_i", "12", "--dim_hidden", "16",
        "--num_attention_heads", "2", "--intermediate_size", "32",
        "--n_frames", "4", "--batch_size", "4",
        "--epochs", "1", "--no_test",
        "--feats_i_name", "image_feats.hdf5",
        "--base_data_path", str(data_tree),
        "--base_checkpoint_path", ckpt_root,
        "--compute_dtype", "float32",
        "--hidden_dropout_prob", "0.1",
    ]
    # --default applies max_len=20 for MSVD; our fixture captions are <= 8
    train_main(base + ["--method", "ARB", "--default", "--max_len", "8"])
    teacher = os.path.join(ckpt_root, "Youtube2Text", "ARB", "w", "best.ckpt")
    assert os.path.exists(teacher)

    train_main(base + ["--method", "NACF", "--default", "--max_len", "8",
                       "--length_beam_size", "2", "--iterations", "2"])
    student = os.path.join(ckpt_root, "Youtube2Text", "NACF", "w", "best.ckpt")
    assert os.path.exists(student)

    results = translate_main([
        "--default", "--method", "NACF", "--dataset", "MSVD",
        "--scope", "w", "-use_ct", "-em", "test",
        "--base_checkpoint_path", ckpt_root,
    ])
    assert "CIDEr" in results["test"]


def test_translate_collect_writes_pickle(data_tree, tmp_path):
    """NAR candidate-collection mode writes the per-iteration pickle
    (reference translate.py -collect / misc/run.py:202-210)."""
    import pickle
    from navc_tpu.cli.translate import main as translate_main

    ckpt_root = str(tmp_path / "experiments")
    from navc_tpu.cli.train import main as train_main
    base = [
        "--dataset", "MSVD", "--scope", "c", "--method", "NAB",
        "--modality", "i", "--dim_i", "12", "--dim_hidden", "16",
        "--num_attention_heads", "2", "--intermediate_size", "32",
        "--n_frames", "4", "--batch_size", "4", "--max_len", "8",
        "--epochs", "1", "--no_test",
        "--length_beam_size", "2", "--iterations", "2",
        "--feats_i_name", "image_feats.hdf5",
        "--base_data_path", str(data_tree),
        "--base_checkpoint_path", ckpt_root,
        "--compute_dtype", "float32", "--hidden_dropout_prob", "0.1",
    ]
    train_main(base)
    model = os.path.join(ckpt_root, "Youtube2Text", "NAB", "c", "best.ckpt")

    collect_dir = str(tmp_path / "collected")
    translate_main([
        "--model_path", model, "-em", "test",
        "-i", "2", "-lbs", "2",
        "-collect", "-collect_path", collect_dir,
    ])
    files = os.listdir(collect_dir)
    assert len(files) == 1, files
    with open(os.path.join(collect_dir, files[0]), "rb") as f:
        sents, scores = pickle.load(f)
    assert sents and scores
    vid = next(iter(sents))
    assert len(sents[vid]) == 2  # one sentence per iteration
    assert isinstance(sents[vid][0], str)
