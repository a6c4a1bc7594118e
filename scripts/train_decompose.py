"""NACF train-step whole-step bound decomposition (VERDICT r4 #6).

The NACF decode (NACF_DECOMP.json) and ARB beam decode (ARB_DECOMP.json)
carry trace-driven per-lane accounting; this is the same treatment for the
training step — the reference cost anchor is one optimizer step of the
2-pass visual-word forward (reference models/Decoder.py:206-210 wiring,
train.py epoch loop): forward (encoder streams + fusion + length head +
2 decoder passes each ending in a full-width vocab projection), losses,
backward, global-norm clip, Adam.

Produces, from one profiled run of ``bench.measure_train``:

  1. per-lane device time attributed by pallas kernel name
     (fused_train_fwd / fused_train_ffn_bwd / fused_train_attn_bwd) and —
     for the XLA ops that share the generic ``fusion.N`` name — by the
     operand/result shapes in the trace's ``long_name`` HLO string: the
     vocab projection fwd (result [*, V]), its backward (wgrad [d, V] /
     dgrad reading [*, V]), optimizer/elementwise traffic over the
     [V, d]-sized embedding moments, and everything else;
  2. an analytic per-lane resource model — MXU FLOPs and HBM bytes for the
     fused layer fwd/bwd, the vocab projection fwd/bwd, and the
     Adam + clip update (params + grads + 2 moments, read + write) — and
     each lane's implied roofline at the device's peak matmul rate and HBM
     bandwidth;
  3. the verdict: measured step time vs max(MXU, HBM) overlapped bound and
     the serial (sum) bound, plus per-lane measured-vs-bound ratios so the
     top lane's headroom is a number, not prose.

Writes TRAIN_DECOMP.json. Run on the live TPU:

    python scripts/train_decompose.py [--batch 2048] [--no-run profiles/<ts>]
"""

import argparse
import collections
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

# v5e HBM: 16 GB @ ~819 GB/s per chip (public spec); override for other gens
HBM_GBPS = float(os.environ.get("NAVC_TPU_HBM_GBPS", "819"))
MXU_TFLOPS = 197e12 * 0.95  # bf16 peak x achievable


def make_classifier(v: int, d: int):
    """Lane classifier over trace events (name + HLO long_name shapes)."""
    res_v = re.compile(r"^%%?\S+ = \S*\[(\d+,)*%d\]" % v)
    any_v = re.compile(r"\[[0-9,]*\b%d\b[0-9,]*\]" % v)
    wgrad = re.compile(r"= \S*\[(%d,%d|%d,%d)\]" % (d, v, v, d))

    def classify(ev) -> str:
        name = ev.get("name", "?")
        base = re.sub(r"\.\d+$", "", name).lstrip("%")
        args = ev.get("args", {})
        long_name = args.get("long_name", "")
        for key, lane in (
                ("fused_train_ffn_bwd", "fused layer bwd (ffn)"),
                ("fused_train_attn_bwd", "fused layer bwd (attn)"),
                ("fused_train_fwd", "fused layer fwd"),
                ("vocab_ce_fwd", "vocab CE fwd (fused proj+stats)"),
                ("vocab_ce_bwd", "vocab CE bwd (fused dgrad+wgrad)"),
                ("vocab_", "vocab pallas epilogues"),
        ):
            if key in name:
                return lane
        if any_v.search(long_name):
            cat = args.get("hlo_category", "")
            if "loop" in cat or base in ("reduce", "add", "multiply",
                                         "subtract", "convert"):
                # elementwise over a [*, V]-shaped buffer: logits loss math
                # or the Adam moments of the tied [V, d] embedding
                return "vocab-sized elementwise (loss math + embed Adam)"
            if wgrad.search(long_name):
                return "vocab bwd (wgrad)"
            if res_v.search(long_name):
                return "vocab fwd (projection + softmax epilogue)"
            return "vocab bwd (dgrad)"
        if re.search(r"dynamic.update.slice", base):
            return "dynamic-update-slice"
        if re.match(r"^(copy|transpose|bitcast)", base):
            return "copies/relayouts"
        if ("fusion" in base or base.startswith("loop_")
                or base in ("reduce", "convolution", "dot")):
            return "XLA fusions (encoder, losses, clip, Adam)"
        if re.search(r"while|select-and|tuple|parameter|broadcast|iota|"
                     r"reshape|gather|scatter|concatenate", base):
            return "plumbing (layout, gathers, sequencing)"
        return "other"

    return classify


def _param_bytes(cfg) -> int:
    """Total trainable parameter count (f32 bytes) via shape evaluation."""
    import jax

    from navc_tpu.models import build_model, init_params

    model = build_model(cfg)
    shapes = jax.eval_shape(
        lambda k: init_params(model, k, cfg), jax.random.PRNGKey(0))
    return sum(int(np_prod(x.shape)) * 4
               for x in jax.tree_util.tree_leaves(shapes["params"]))


def np_prod(shape):
    out = 1
    for s in shape:
        out *= int(s)
    return out


def lane_model(cfg, n_enc: int, b: int, param_bytes: int):
    """Analytic per-lane MXU-us / HBM-us bounds for one train step at B=b.

    Mirrors the compiled step (runtime/train_step.py): 2 decoder passes
    through the custom-VJP fused layer (fwd kernel + 2 bwd kernels), vocab
    projection fwd (XLA matmul, f32 logits) + log-softmax/NLL losses, vocab
    backward (dlogits elementwise, dgrad + wgrad matmuls), encoder/fusion/
    length-head matmuls fwd+bwd, and the global-norm clip + Adam update
    (optax adam: read grad+param+2 moments, write param+2 moments).
    """
    d = cfg.dim_hidden
    v = cfg.vocab_size
    ffn = cfg.intermediate_size
    L = cfg.max_len
    Te = n_enc
    n_tok = b * L
    passes = 2 if cfg.visual_word_generation else 1

    def us_mxu(flops):
        return flops / MXU_TFLOPS * 1e6

    def us_hbm(bytes_):
        return bytes_ / (HBM_GBPS * 1e9) * 1e6

    lanes = {}

    # fused decoder layer: matmul flops per pass (q/k/v/o self + q/kv/o
    # cross + ffn) + attention contractions
    layer_flops = (2 * n_tok * d * d * 4            # self q,k,v,o
                   + 2 * n_tok * d * d * 2          # cross q,o
                   + 2 * b * Te * d * d * 2         # cross k,v (enc rows)
                   + 2 * 2 * b * L * L * d          # self attn scores+values
                   + 2 * 2 * b * L * Te * d         # cross attn
                   + 2 * n_tok * d * ffn * 2)       # ffn up+down
    layer_bytes = (n_tok * d * 2 * 6                # x in/out, 4 resid reads
                   + n_tok * d * 2 * 4              # self/cross K,V rw
                   + (4 * d * d + 2 * d * d + 2 * d * ffn) * 2)  # weights
    lanes["fused layer fwd"] = {
        "mxu_us": us_mxu(passes * layer_flops),
        "hbm_us": us_hbm(passes * layer_bytes),
    }
    # backward: dgrad + wgrad double the matmul work, and the two bwd
    # kernels recompute the forward in-kernel (flash-style — the only HBM
    # residual is the FFN input; DESIGN.md §6) -> 3x fwd flops total
    lanes["fused layer bwd"] = {
        "mxu_us": us_mxu(3 * passes * layer_flops),
        "hbm_us": us_hbm(2.5 * passes * layer_bytes),
    }

    # vocab projection lanes depend on the compiled path:
    vocab_flops = 2 * n_tok * d * v
    w_bytes = d * v * 4
    from navc_tpu.ops.eligibility import fused_vocab_ce_eligible
    if fused_vocab_ce_eligible(cfg):
        # fused CE (ops/vocab_ce): logits/dlogits never in HBM. fwd streams
        # W bf16 once + h rows, writes three (N,) vectors; bwd recomputes the
        # score matmul (so 3x flops: recompute + dgrad + wgrad) and streams
        # W + W^T bf16 in, dW f32 out.
        lanes["vocab CE fwd (fused proj+stats)"] = {
            "mxu_us": us_mxu(passes * vocab_flops),
            "hbm_us": us_hbm(passes * (w_bytes // 2 + n_tok * d * 2
                                       + n_tok * 12)),
        }
        lanes["vocab CE bwd (fused dgrad+wgrad)"] = {
            "mxu_us": us_mxu(passes * 3 * vocab_flops),
            "hbm_us": us_hbm(passes * (w_bytes + w_bytes  # W+Wt in, dW out
                                       + n_tok * d * 2 * 2 + n_tok * 8)),
        }
    else:
        # XLA path: fwd logits f32[n_tok, v] written + read by the
        # softmax/NLL epilogue; bwd dlogits read by BOTH dgrad and wgrad
        lanes["vocab fwd"] = {
            "mxu_us": us_mxu(passes * vocab_flops),
            "hbm_us": us_hbm(passes * (n_tok * v * 4 * 2     # logits w + r
                                       + n_tok * d * 2 + w_bytes)),
        }
        lanes["vocab bwd"] = {
            "mxu_us": us_mxu(passes * 2 * vocab_flops),      # dgrad + wgrad
            "hbm_us": us_hbm(passes * (n_tok * v * 4 * 3     # dlogits w + 2r
                                       + n_tok * d * 2 * 2 + 2 * w_bytes)),
        }

    # encoder/fusion/length head fwd+bwd (small next to the above)
    enc_flops = sum(2 * b * cfg.n_frames * (dim * d + 2 * d * d)
                    for dim in cfg.modality_dims) + 2 * b * d * L
    lanes["encoder+heads fwd+bwd"] = {
        "mxu_us": us_mxu(3 * enc_flops),
        "hbm_us": us_hbm(3 * b * cfg.n_frames * sum(cfg.modality_dims) * 4),
    }

    # optimizer: global-norm clip reads every grad; adam reads
    # grad+param+mu+nu and writes param+mu+nu -> ~8 full passes over P
    lanes["clip + Adam"] = {
        "mxu_us": 0.0,
        "hbm_us": us_hbm(8 * param_bytes),
    }

    for entry in lanes.values():
        entry["bound_us"] = max(entry["mxu_us"], entry["hbm_us"])
        for k in ("mxu_us", "hbm_us", "bound_us"):
            entry[k] = round(entry[k], 1)
    return lanes


# map trace lanes onto model lanes for the measured/bound ratios
TRACE_TO_MODEL = {
    "fused layer fwd": "fused layer fwd",
    "fused layer bwd (ffn)": "fused layer bwd",
    "fused layer bwd (attn)": "fused layer bwd",
    "vocab fwd (projection + softmax epilogue)": "vocab fwd",
    "vocab bwd (wgrad)": "vocab bwd",
    "vocab bwd (dgrad)": "vocab bwd",
    "vocab CE fwd (fused proj+stats)": "vocab CE fwd (fused proj+stats)",
    "vocab CE bwd (fused dgrad+wgrad)": "vocab CE bwd (fused dgrad+wgrad)",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--no-run", metavar="CAPTURE_DIR", default=None,
                    help="skip the live run; decompose an existing capture "
                         "(pairs with the freshest BENCH_LIVE_TRAIN.json)")
    ap.add_argument("--out", default=os.path.join(ROOT, "TRAIN_DECOMP.json"))
    args = ap.parse_args()

    import bench
    from trace_summary import find_trace, load_events, module_spans, self_times

    if args.no_run:
        with open(os.path.join(ROOT, "BENCH_LIVE_TRAIN.json")) as f:
            result = json.load(f)
        trace_dir = args.no_run
    else:
        if not bench._device_available():
            print(json.dumps({"error": "accelerator unreachable"}))
            return 1
        result = bench.measure_train(batch_size=args.batch, profile=True)
        trace_dir = result["trace_dir"]

    from navc_tpu.config import default_config
    cfg = default_config("NACF", dataset="MSRVTT", vocab_size=10048,
                         batch_size=args.batch, use_pallas=True)
    n_enc = cfg.n_frames * len(cfg.modality)
    param_bytes = _param_bytes(cfg)

    events = load_events(find_trace(trace_dir))
    classify = make_classifier(cfg.vocab_size, cfg.dim_hidden)
    by_lane, n_op = self_times(events, keyfn=classify)
    module_us, n_modules = module_spans(events)

    total_op_us = sum(by_lane.values())
    # the profiled region covers BOTH timed loops of measure_train
    # (10 sequential + 10 pipelined steps); normalize by executed modules
    n_steps = n_modules if n_modules else 20
    per_step_us = total_op_us / n_steps

    model = lane_model(cfg, n_enc, args.batch, param_bytes)
    mxu_us = sum(l["mxu_us"] for l in model.values())
    hbm_us = sum(l["hbm_us"] for l in model.values())
    overlap = max(mxu_us, hbm_us)
    serial = sum(l["bound_us"] for l in model.values())

    lane_table = {}
    for lane, dur in sorted(by_lane.items(), key=lambda kv: -kv[1]):
        entry = {
            "us_per_step": round(dur / n_steps, 1),
            "pct": round(100.0 * dur / total_op_us, 1),
        }
        mlane = TRACE_TO_MODEL.get(lane)
        if mlane:
            measured = dur / n_steps
            # aggregate trace lanes sharing one model lane before the ratio
            shared = sum(by_lane.get(t, 0.0) for t, m in TRACE_TO_MODEL.items()
                         if m == mlane) / n_steps
            entry["model_lane"] = mlane
            entry["lane_bound_us"] = model[mlane]["bound_us"]
            entry["lane_pct_of_bound"] = round(
                100.0 * model[mlane]["bound_us"] / shared, 1) if shared else None
        lane_table[lane] = entry

    out = {
        "protocol": ("one profiled bench.measure_train run (B=%d, NACF "
                     "2-pass fwd + losses + bwd + clip + Adam; %d steps "
                     "traced); device-lane op self-time attributed by "
                     "pallas kernel name + HLO result/operand shapes "
                     "(long_name); analytic per-lane MXU/HBM model at "
                     "%.0f GB/s, 197 bf16 TFLOP/s (x0.95 achievable), "
                     "f32 logits" % (args.batch, n_steps, HBM_GBPS)),
        "measured": {
            "captions_per_sec": result["value"],
            "pipelined_captions_per_sec": result.get("pipelined_value"),
            "mfu": result.get("mfu"),
            "pipelined_mfu": result.get("pipelined_mfu"),
            "per_step_device_ms": round(per_step_us / 1e3, 2),
            "wall_per_step_ms": round(args.batch / result["value"] * 1e3, 2),
            "module_span_ms_per_step": round(module_us / n_modules / 1e3, 2)
            if n_modules else None,
            "n_traced_steps": n_steps,
        },
        "bounds_us_per_step": {
            "mxu": round(mxu_us, 1),
            "hbm": round(hbm_us, 1),
            "overlapped(max)": round(overlap, 1),
            "serial(sum of per-lane max)": round(serial, 1),
            "pct_of_overlapped_bound": round(100.0 * overlap / per_step_us, 1),
            "pct_of_serial_bound": round(100.0 * serial / per_step_us, 1),
        },
        "model_lanes_us": model,
        "model_inputs": {
            "param_bytes": param_bytes,
            "n_enc": n_enc,
            "flops_per_caption_algorithmic": bench.train_flops_per_caption(
                cfg, cfg.n_frames),
        },
        "device_lanes_us_per_step": lane_table,
        "trace_dir": trace_dir,
        "timestamp": result.get("timestamp"),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "captions_per_sec": result["value"],
        "per_step_device_ms": out["measured"]["per_step_device_ms"],
        "bounds": out["bounds_us_per_step"],
        "lanes": {k: v["us_per_step"]
                  for k, v in lane_table.items()},
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
