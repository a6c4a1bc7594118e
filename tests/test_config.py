"""Config resolution semantics vs. the reference (opts.py / methods.yaml)."""

import pytest

from navc_tpu import constants as C
from navc_tpu.config import Config, METHODS, default_config, resolve


def test_method_registry_matches_reference():
    # reference config/methods.yaml:1-26
    assert set(METHODS) == {"ARB", "ARB2", "NAB", "NACF"}
    assert METHODS["ARB"]["decoding_type"] == "ARFormer"
    assert METHODS["NACF"]["decoder"] == "BertDecoderDisentangled"
    assert METHODS["NACF"]["visual_word_generation"] is True
    assert METHODS["NAB"]["visual_word_generation"] is False
    assert METHODS["ARB2"]["demand"] == ["VERB", "NOUN"]


def test_default_arb_msvd():
    cfg = default_config("ARB", dataset="MSVD")
    # opts.py:162-165 dataset presets
    assert cfg.dataset == "Youtube2Text"
    assert cfg.max_len == 20
    assert cfg.with_category is False
    assert cfg.beta == [0.0, 1.0]
    # opts.py:211-213 AR presets
    assert cfg.beam_size == 5
    assert cfg.beam_alpha == 1.0
    assert cfg.crit == ["lang"]
    assert cfg.decoding_type == "ARFormer"


def test_default_nacf_msrvtt():
    cfg = default_config("NACF", dataset="MSRVTT")
    # opts.py:166-169 dataset presets
    assert cfg.max_len == 30
    assert cfg.with_category is True
    assert cfg.beta == [0.35, 0.9]
    # opts.py:185-189 NAR crit forcing
    assert cfg.crit == ["lang", "length"]
    assert cfg.crit_scale == [1.0, 1.0]
    # opts.py:192-210 NAR presets
    assert cfg.use_ct is True
    assert cfg.nv_weights == [0.8, 1.0]
    assert cfg.enhance_input == 2
    assert cfg.length_beam_size == 6
    assert cfg.iterations == 5
    assert cfg.beam_alpha == 1.35
    assert cfg.load_teacher_weights is True
    assert cfg.with_teacher is True
    # opts.py:189 crit_key mapping
    assert cfg.crit_key == [C.mapping["lang"], C.mapping["length"]]


def test_default_nab_msvd_alpha():
    cfg = default_config("NAB", dataset="Youtube2Text")
    assert cfg.beam_alpha == 1.0  # opts.py:199
    assert cfg.use_ct is False  # only visual-word methods get CT


def test_msvd_rejects_category():
    with pytest.raises(ValueError):
        resolve(Config(dataset="Youtube2Text", with_category=True, scope="s"))


def test_unknown_method_rejected():
    with pytest.raises(ValueError):
        resolve(Config(method="XYZ", scope="s"))


def test_scope_required_without_default():
    with pytest.raises(ValueError):
        resolve(Config(method="ARB", default=False, scope=""))


def test_roundtrip_dict():
    cfg = default_config("NACF", dataset="MSRVTT", vocab_size=123)
    cfg2 = Config.from_dict(cfg.to_dict())
    assert cfg2 == cfg


def test_modality_dims():
    cfg = Config(modality="mi")
    assert cfg.modality_dims == [2048, 2048]
    cfg = Config(modality="i", dim_i=512)
    assert cfg.modality_dims == [512]


def test_resolve_data_paths_layout():
    from navc_tpu.config import resolve_data_paths, where_to_save_model
    cfg = default_config("ARB", dataset="MSRVTT", base_data_path="/data",
                         base_checkpoint_path="/ckpt", scope="s")
    cfg = resolve_data_paths(cfg)
    # reference train.py:15-26, 67-70 layout
    assert cfg.info_corpus == "/data/MSRVTT/info_corpus.pkl"
    assert cfg.reference == "/data/MSRVTT/refs.pkl"
    assert cfg.feats_i == ["/data/MSRVTT/feats/image_resnet101_imagenet_fps_max60.hdf5"]
    assert cfg.feats_m == ["/data/MSRVTT/feats/motion_resnext101_kinetics_duration16_overlap8.hdf5"]
    assert where_to_save_model(cfg) == "/ckpt/MSRVTT/ARB/s"


def test_crit_key_property():
    cfg = default_config("NACF", dataset="MSRVTT")
    assert cfg.crit_key[0] == ("tgt_word_logprobs", "tgt_word_labels")
    assert cfg.crit_key[1] == ("pred_length", "tgt_length")
