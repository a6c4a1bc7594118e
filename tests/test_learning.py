"""Learning sanity: the full stack generalizes on a learnable synthetic task.

Videos belong to latent classes (clustered features, one caption per class);
training must recover the class->caption mapping on HELD-OUT videos — this
exercises encoder, fusion, decoder, loss, optimizer, beam decode, and the
metric stack end to end (calibrated run: val CIDEr 1.7 -> 4.7 over 16 epochs).
"""

import numpy as np

from navc_tpu.config import default_config
from navc_tpu.data.synthetic import make_learnable_synthetic
from navc_tpu.runtime.loop import train_network_all


def test_model_learns_class_captions(tmp_path):
    cfg = default_config(
        "ARB", dataset="MSVD",
        vocab_size=40, dim_hidden=32, num_attention_heads=2,
        intermediate_size=64, n_frames=4, n_total_frames=10,
        dim_i=12, dim_m=10, modality="mi", max_len=10, batch_size=8,
        epochs=12, hidden_dropout_prob=0.0, encoder_dropout=0.0,
        compute_dtype="float32", beam_size=2, save_checkpoint_every=4,
        learning_rate=2e-3, minimum_learning_rate=5e-4,
        base_checkpoint_path=str(tmp_path))
    corpus, refs, feats = make_learnable_synthetic(cfg, n_videos=24, n_classes=4)
    out = train_network_all(cfg, workdir=str(tmp_path / "run"),
                            info_corpus=corpus, references=refs,
                            in_memory_feats=feats, verbose=False)
    h = out["history"]
    assert h[-1]["train_loss"] < h[0]["train_loss"] * 0.8
    assert max(x["CIDEr"] for x in h) > 2.0, [x["CIDEr"] for x in h]
    # generalization: held-out test videos of seen classes score well
    assert out["test_res"]["CIDEr"] > 1.5, out["test_res"]


def test_nar_mask_predict_learns(tmp_path):
    """NAB (length head + mask-predict decode) also generalizes on the
    learnable task (calibrated: val CIDEr 0.86 -> 1.66 over 16 epochs)."""
    cfg = default_config(
        "NAB", dataset="MSVD",
        vocab_size=40, dim_hidden=32, num_attention_heads=2,
        intermediate_size=64, n_frames=4, n_total_frames=10,
        dim_i=12, dim_m=10, modality="mi", max_len=10, batch_size=8,
        epochs=16, hidden_dropout_prob=0.0, encoder_dropout=0.0,
        compute_dtype="float32", save_checkpoint_every=4,
        learning_rate=2e-3, minimum_learning_rate=5e-4,
        length_beam_size=3, iterations=3,
        base_checkpoint_path=str(tmp_path))
    cfg = cfg.replace(teacher_path="", load_teacher_weights=False,
                      with_teacher=False)
    corpus, refs, feats = make_learnable_synthetic(cfg, n_videos=24, n_classes=4)
    out = train_network_all(cfg, workdir=str(tmp_path / "run"),
                            info_corpus=corpus, references=refs,
                            in_memory_feats=feats, verbose=False)
    h = out["history"]
    assert max(x["CIDEr"] for x in h) > 1.0, [x["CIDEr"] for x in h]
    assert out["test_res"]["CIDEr"] > 0.7, out["test_res"]
