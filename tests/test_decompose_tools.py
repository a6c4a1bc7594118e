"""Unit tests for the trace-decomposition tooling (scripts/).

The decompose scripts themselves need a live-TPU capture; these tests pin
the pure parts — the self-time stack sweep with a custom key function, the
train-step lane classifier over synthetic HLO long_names, and the per-shape
vocab_argmax table — with hand-built Chrome-trace events.
"""

import os
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(HERE), "scripts"))


def _ev(name, ts, dur, pid=3, tid=3, long_name="", category=""):
    args = {}
    if long_name:
        args["long_name"] = long_name
    if category:
        args["hlo_category"] = category
    return {"ph": "X", "pid": pid, "tid": tid, "ts": ts, "dur": dur,
            "name": name, "args": args}


def _meta(pid=3, tid=3):
    return [
        {"ph": "M", "pid": pid, "name": "process_name",
         "args": {"name": "device"}},
        {"ph": "M", "pid": pid, "tid": tid, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
    ]


def test_self_times_keyfn_groups_by_custom_key():
    from trace_summary import self_times

    events = _meta() + [
        _ev("fusion.1", 0.0, 10.0, long_name="%fusion.1 = f32[8,10048]"),
        _ev("fusion.2", 20.0, 5.0, long_name="%fusion.2 = f32[8,512]"),
        # nested child: parent self-time must exclude it
        _ev("fusion.3", 30.0, 10.0, long_name="%fusion.3 = f32[8,512]"),
        _ev("copy.1", 32.0, 4.0, long_name="%copy.1 = f32[8,512]"),
    ]

    def keyfn(ev):
        return "vocab" if "10048" in ev["args"].get("long_name", "") else "rest"

    by_key, n = self_times(events, keyfn=keyfn)
    assert by_key["vocab"] == pytest.approx(10.0)
    # fusion.2 (5) + fusion.3 self (10 - 4 nested) + copy.1 (4)
    assert by_key["rest"] == pytest.approx(15.0)
    # default grouping still collapses instance suffixes
    by_op, _ = self_times(events)
    assert by_op["fusion"] == pytest.approx(21.0)


def test_train_classifier_separates_vocab_lanes():
    from train_decompose import make_classifier

    classify = make_classifier(v=10048, d=512)
    cases = [
        (_ev("fused_train_fwd.4", 0, 1), "fused layer fwd"),
        (_ev("fused_train_ffn_bwd", 0, 1), "fused layer bwd (ffn)"),
        (_ev("fusion.9", 0, 1,
             long_name="%fusion.9 = f32[61440,10048]{1,0:T(8,128)} fusion(...)",
             category="convolution fusion"),
         "vocab fwd (projection + softmax epilogue)"),
        (_ev("fusion.10", 0, 1,
             long_name="%fusion.10 = f32[512,10048]{1,0} fusion(...)",
             category="output fusion"),
         "vocab bwd (wgrad)"),
        (_ev("fusion.11", 0, 1,
             long_name="%fusion.11 = f32[61440,512]{1,0} fusion("
                       "f32[61440,10048]{1,0} %p)",
             category="convolution fusion"),
         "vocab bwd (dgrad)"),
        (_ev("multiply_add_fusion.2", 0, 1,
             long_name="%multiply_add_fusion.2 = f32[10048,512]{1,0} "
                       "fusion(...)", category="loop fusion"),
         "vocab-sized elementwise (loss math + embed Adam)"),
        (_ev("copy.3", 0, 1, long_name="%copy.3 = f32[8,512]"),
         "copies/relayouts"),
        (_ev("fusion.12", 0, 1, long_name="%fusion.12 = f32[2048,512]",
             category="convolution fusion"),
         "XLA fusions (encoder, losses, clip, Adam)"),
    ]
    for ev, want in cases:
        assert classify(ev) == want, (ev["name"], classify(ev), want)


def test_argmax_shape_table_aggregates_per_shape():
    from nacf_decompose import argmax_shape_table

    from navc_tpu.config import default_config

    cfg = default_config("NACF", dataset="MSRVTT", vocab_size=10048)
    events = []
    # two decodes x two shapes: dense N=1572864 (~90 ns/row realistic),
    # sparse N=196608
    for rep in range(2):
        events.append(_ev("vocab_argmax.1", rep * 1e6, 141557.0,
                          long_name="%vocab_argmax.1 = (f32[1572864]{0}, "
                                    "s32[1572864]{0}) custom-call(...)"))
        events.append(_ev("vocab_argmax.2", rep * 1e6 + 5e5, 17000.0,
                          long_name="%vocab_argmax.2 = (f32[196608]{0}, "
                                    "s32[196608]{0}) custom-call(...)"))
    table = argmax_shape_table(events, cfg, n_decodes=2, batch=8192)
    shapes = table["per_shape"]
    assert set(shapes) == {"N=1572864", "N=196608"}
    big = shapes["N=1572864"]
    assert big["calls_per_decode"] == 1.0
    assert big["ns_per_row"] == pytest.approx(141557e3 / 1572864, rel=1e-2)
    bounds = table["bounds_ns_per_row"]
    assert bounds["bound(max)"] >= bounds["mxu"] > 0
