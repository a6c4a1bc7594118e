"""Unit tests for the centralized fused-path eligibility predicates
(navc_tpu/ops/eligibility.py) — one definition used by all decode paths."""

from navc_tpu.config import default_config
from navc_tpu.ops import fused_layer_eligible, fused_vocab_eligible


def cfg(**kw):
    over = dict(vocab_size=100, compute_dtype="float32", use_pallas=True)
    over.update(kw)
    return default_config("NACF", dataset="MSRVTT", **over)


def test_default_flagship_is_eligible():
    c = cfg()
    assert fused_layer_eligible(c, causal=False)
    assert fused_layer_eligible(c, causal=True)
    assert fused_vocab_eligible(c)


def test_pallas_off_disables_everything():
    c = cfg(use_pallas=False)
    assert not fused_layer_eligible(c, causal=False)
    assert not fused_layer_eligible(c, causal=True)
    assert not fused_vocab_eligible(c)


def test_layer_knobs_disable_fused_layer():
    for kw in (dict(num_hidden_layers_decoder=2), dict(pos_attention=True),
               dict(with_layernorm=True), dict(hidden_act="relu")):
        c = cfg(**kw)
        assert not fused_layer_eligible(c, causal=False), kw
        assert not fused_layer_eligible(c, causal=True), kw
        # vocab fusion is independent of the layer shape
        assert fused_vocab_eligible(c), kw


def test_watch_only_disables_causal():
    c = cfg(watch=2)
    assert fused_layer_eligible(c, causal=False)
    assert not fused_layer_eligible(c, causal=True)


def test_enhance_input_resampling_only_disables_nar():
    # NB: replace() after resolution — the --default NAR preset forces
    # enhance_input=2 (reference opts.py:197)
    c = cfg().replace(enhance_input=1)
    assert not fused_layer_eligible(c, causal=False)
    assert fused_layer_eligible(c, causal=True)


def test_tied_weights_remain_fused_eligible():
    # the projection kernels take the tied table + bias via their bias
    # operand (ops.vocab_fused.projection_weights), so tying no longer
    # knocks a config off the fused path
    c = cfg(tie_weights=True)
    assert fused_vocab_eligible(c)
    assert fused_layer_eligible(c, causal=True)
