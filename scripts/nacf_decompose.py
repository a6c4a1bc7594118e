"""NACF mask-predict decode whole-run bound decomposition.

The ARB beam path got DESIGN §6-grade accounting in ARB_DECOMP.json
(scripts/arb_decompose.py); this is the same treatment for the flagship
NACF decode — the headline bench (reference cost anchor:
decoding/algorithms.py:242, 271-272 — (T + use_ct) student forwards plus one
AR-teacher rescoring forward per length-beam row).

Produces, from one profiled run of ``bench.main``:

  1. per-kernel device time for the timed region, attributed by the pallas
     kernel names (fused_layer / fused_layer_fold = dense student forwards,
     fused_layer_qsub = sparse refinement forwards, vocab_argmax,
     vocab_gather_prob = teacher rescoring gather) and XLA op classes;
  2. an analytic per-caption resource model — MXU FLOPs
     (bench.decode_flops_per_caption) and HBM bytes (vocab weight
     re-streaming per row tile, per-call layer weights, activation handoffs,
     hoisted enc K/V reads) — and the implied per-caption roofline;
  3. the verdict: measured us/caption vs max(MXU, HBM) and serial bounds,
     with the residual attributed to the trace lanes.

Writes NACF_DECOMP.json. Run on the live TPU:

    python scripts/nacf_decompose.py [--batch 8192] [--no-run profiles/<ts>]
"""

import argparse
import collections
import json
import math
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

# v5e HBM: 16 GB @ ~819 GB/s per chip (public spec); override for other gens
HBM_GBPS = float(os.environ.get("NAVC_TPU_HBM_GBPS", "819"))
# v5e VPU: 8x128 f32 lanes x 8 sublanes @ ~0.94 GHz ~= 3.8e12 elem-ops/s
# (derived estimate, not a published spec; used only for the argmax-epilogue
# floor below — override to recalibrate)
VPU_EOPS = float(os.environ.get("NAVC_TPU_VPU_EOPS", "3.8e12"))

KERNEL_LANES = {
    "fused_layer_qsub": "fused_layer_qsub (sparse refinement forwards)",
    "fused_layer_fold": "fused_layer dense (CT pass/completion + teacher)",
    "fused_layer": "fused_layer dense (CT pass/completion + teacher)",
    "vocab_argmax": "vocab argmax (fused projection+online-softmax)",
    "vocab_gather_prob": "vocab gather-prob (teacher rescoring)",
    "vocab_topk": "vocab top-k",
}


def classify(op: str) -> str:
    for key, lane in KERNEL_LANES.items():
        if key in op:
            return lane
    if re.search(r"dynamic.update.slice", op):
        return "dynamic-update-slice"
    if re.search(r"^(copy|transpose|bitcast)", op):
        return "copies/relayouts"
    if op.startswith("fusion") or op.startswith("loop_"):
        return ("XLA fusions (select-worst, scatter, length-beam "
                "scoring, enc-KV hoist)")
    if re.search(r"while|select-and|tuple|parameter|broadcast", op):
        return "scan plumbing (self-time: sequencing gaps)"
    return "other"


def _round_up(x, m):
    return (x + m - 1) // m * m


def run_model(cfg, n_enc: int, b: int):
    """Analytic per-caption HBM bytes of one flagship decode.

    Mirrors the compiled program (decoding/mask_predict.py): per length-beam
    row, (iterations + use_ct) student forwards — dense for the CT pass and
    CT completion, sparse-width q_t = max(1, floor(L*(1-t/T))) after — plus
    one dense causal AR-teacher forward; each = fused BertLayer + fused
    vocab kernel (argmax for the student, gather-prob for the teacher).
    Vocab weights stream from HBM once per kernel call (round-5 whole-V
    tiles, tv >= V: the W block index is constant across the 1-D row grid —
    this is NOT the rejected V-outer grid reordering, DESIGN.md §2); layer
    weights ride constant-index BlockSpecs (DMA'd once per call); cross K/V
    are hoisted (computed once from unique rows, read back per forward).
    """
    from navc_tpu.ops.eligibility import fused_sparse_eligible

    d = cfg.dim_hidden
    v = cfg.vocab_size
    ffn = cfg.intermediate_size
    L = cfg.max_len
    L_pad = _round_up(L, 8)          # 8-aligned canvas (DESIGN.md §2.5)
    lbs = cfg.length_beam_size
    rows = b * lbs                   # canvas sequences

    T = cfg.iterations + (1 if cfg.use_ct else 0)
    widths = [L_pad]                 # iteration 0 (CT pass or first predict)
    for c in range(1, T):
        if fused_sparse_eligible(cfg) and not (cfg.use_ct and c == 1):
            widths.append(max(1, int(math.floor(L * (1.0 - c / T)))))
        else:
            widths.append(L_pad)     # dense step (CT completion)

    layer_w_bytes = (4 * d * d + 2 * d * d + 2 * d * ffn) * 2  # qkvo+crossqo+ffn
    # round-5 tiles: both vocab kernels run whole-V (tn=128, tv=10240 >= V,
    # vocab_fused.py defaults) — the W block index is constant across the
    # 1-D row grid, so Mosaic streams W from HBM ONCE per kernel call
    v_pad_arg = _round_up(v, 10240)
    v_pad_gp = _round_up(v, 10240)

    def fwd_bytes(q, tn, v_pad, argmax=True):
        n_rows = rows * q                             # flattened token rows
        vocab_w = d * v_pad * 2                       # W streamed once/call
        vocab_h = n_rows * d * 2                      # hidden into the kernel
        acts = n_rows * d * 2 * 2                     # layer in + out (bf16)
        enc_kv = rows * n_enc * d * 2 * 2             # hoisted K+V read back
        kv_self = rows * L_pad * d * 2 * 2 * 2        # self K/V write + read
        out_small = n_rows * 8                        # ids + probs
        return {
            "vocab_w_restream": vocab_w,
            "vocab_h": vocab_h,
            "layer_acts": acts + kv_self,
            "enc_kv_read": enc_kv,
            "layer_weights": layer_w_bytes,
            "small_outputs": out_small,
        }

    per = collections.Counter()
    n_student_dense = 0
    n_student_sparse = 0
    for q in widths:
        for k2, b2 in fwd_bytes(q, tn=256, v_pad=v_pad_arg).items():
            per[k2] += b2
        if q == L_pad:
            n_student_dense += 1
        else:
            n_student_sparse += 1
    # teacher rescoring forward: dense causal, gather-prob epilogue
    for k2, b2 in fwd_bytes(L_pad, tn=512, v_pad=v_pad_gp).items():
        per[k2] += b2

    total = sum(per.values())
    return {
        "forward_widths": widths + ["teacher:%d" % L_pad],
        "n_student_dense": n_student_dense,
        "n_student_sparse": n_student_sparse,
        "canvas_rows_per_batch": rows,
        "hbm_bytes_per_caption": {k: round(v2 / b, 1)
                                  for k, v2 in per.items()},
        "hbm_bytes_per_caption_total": round(total / b, 1),
        "_total_bytes_per_batch": total,
    }


def argmax_shape_table(events, cfg, n_decodes: int, batch: int):
    """Per-call-shape accounting of the vocab_argmax kernel (VERDICT r4 #3).

    The kernel-bench sweep (KERNEL_BENCH.json) times ONE shape
    (N=49152 rows); the real decode calls the kernel at a DIFFERENT N per
    iteration — dense forwards at canvas_rows * L_pad and sparse refinement
    forwards at canvas_rows * q_t. This table, keyed by the N parsed from
    each trace instance's HLO result shape, shows where the kernel actually
    spends its time and what each shape's own roofline is:

      * mxu_ns_row: 2*d*v_pad flops/row at 197 bf16 TFLOP/s x0.95;
      * wstream_ns_row: the (d, v_pad) bf16 weight re-streamed once per
        tn-row tile (production tn=256, tv=2560 — ops/vocab_fused.py:79);
      * vpu_ns_row: the online-softmax epilogue, ~8 elementwise passes over
        v_pad f32 lanes per row (max, compare/select argmax, exp, sum,
        online merges) at VPU_EOPS.

    bound_ns_row = max of the three — if measured ns/row sits at the bound
    the kernel is at its floor for that shape and further tile chasing is
    rejected; if not, the gap is the target.
    """
    d = cfg.dim_hidden
    v_pad = _round_up(cfg.vocab_size, 2560)
    tn = 256
    mxu_ns = 2.0 * d * v_pad / (197e12 * 0.95) * 1e9
    wstream_ns = (d * v_pad * 2.0 / tn) / (HBM_GBPS * 1e9) * 1e9
    vpu_ns = 8.0 * v_pad / VPU_EOPS * 1e9
    bound = max(mxu_ns, wstream_ns, vpu_ns)

    per = collections.defaultdict(lambda: [0.0, 0])
    shape_re = re.compile(r"=\s*\(?[a-z0-9]+\[(\d+)")
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if "vocab_argmax" not in ev.get("name", ""):
            continue
        m = shape_re.search(ev.get("args", {}).get("long_name", ""))
        rows = int(m.group(1)) if m else -1
        acc = per[rows]
        acc[0] += ev["dur"]
        acc[1] += 1
    table = {}
    for rows, (us, cnt) in sorted(per.items(), key=lambda kv: -kv[1][0]):
        ns_row = us * 1e3 / (cnt * rows) if rows > 0 else None
        table["N=%d" % rows] = {
            "calls_per_decode": round(cnt / n_decodes, 2),
            "us_per_caption": round(us / n_decodes / batch, 2),
            "ns_per_row": round(ns_row, 1) if ns_row else None,
            "pct_of_shape_bound": round(100.0 * bound / ns_row, 1)
            if ns_row else None,
        }
    return {
        "bounds_ns_per_row": {
            "mxu": round(mxu_ns, 1),
            "w_restream_tn%d" % tn: round(wstream_ns, 1),
            "vpu_epilogue": round(vpu_ns, 1),
            "bound(max)": round(bound, 1),
        },
        "per_shape": table,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--no-run", metavar="CAPTURE_DIR", default=None,
                    help="skip the live run; decompose an existing capture "
                         "(pairs with the freshest BENCH_LIVE.json)")
    ap.add_argument("--out", default=os.path.join(ROOT, "NACF_DECOMP.json"))
    args = ap.parse_args()

    import bench
    from trace_summary import find_trace, load_events, module_spans, self_times

    if args.no_run:
        with open(os.path.join(ROOT, "BENCH_LIVE.json")) as f:
            result = json.load(f)
        trace_dir = args.no_run
    else:
        if not bench._device_available():
            print(json.dumps({"error": "accelerator unreachable"}))
            return 1
        result = bench.main(batch_size=args.batch, profile=True)
        trace_dir = result["trace_dir"]

    events = load_events(find_trace(trace_dir))
    by_op, n_op = self_times(events)
    module_us, n_modules = module_spans(events)

    lanes = collections.Counter()
    lane_ops = collections.defaultdict(collections.Counter)
    for op, dur in by_op.items():
        lane = classify(op)
        lanes[lane] += dur
        lane_ops[lane][op] += dur

    total_op_us = sum(by_op.values())
    iters = 20   # bench.main timed loop (sequential region is traced first)

    from navc_tpu.config import default_config
    cfg = default_config("NACF", dataset="MSRVTT", vocab_size=10048,
                         batch_size=args.batch, use_pallas=True)
    # temporal_concat: one stream of n_frames per modality (fusion.py)
    n_enc = cfg.n_frames * len(cfg.modality)
    model = run_model(cfg, n_enc, args.batch)

    # the trace covers the sequential timed loop only (bench.main stops the
    # trace before the pipelined loop); normalize by executed modules when
    # available in the capture, else by the loop count
    n_decodes = n_modules if n_modules else iters
    per_caption_us = total_op_us / n_decodes / args.batch

    flops_caption = bench.decode_flops_per_caption(cfg, n_enc)
    mxu_us = flops_caption / (197e12 * 0.95) * 1e6
    hbm_us = (model["_total_bytes_per_batch"] / args.batch
              / (HBM_GBPS * 1e9) * 1e6)
    model.pop("_total_bytes_per_batch")
    overlap_bound = max(mxu_us, hbm_us)
    serial_bound = mxu_us + hbm_us

    lane_table = {
        lane: {
            "us_per_caption": round(dur / n_decodes / args.batch, 2),
            "pct": round(100.0 * dur / total_op_us, 1),
            "top_ops": {op: round(d2 / n_decodes / args.batch, 2)
                        for op, d2 in lane_ops[lane].most_common(3)},
        }
        for lane, dur in lanes.most_common()
    }

    out = {
        "protocol": ("one profiled bench.main run (B=%d, T=%d+CT, lbs=%d, "
                     "teacher rescore; %d sequential decodes traced, "
                     "pipelined loop untraced); "
                     "device-lane op self-time attributed by pallas "
                     "kernel name + XLA op class; analytic per-caption "
                     "MXU/HBM model at %.0f GB/s, 197 bf16 TFLOP/s "
                     "(x0.95 achievable)"
                     % (args.batch, cfg.iterations, cfg.length_beam_size,
                        iters, HBM_GBPS)),
        "measured": {
            "captions_per_sec": result["value"],
            "mfu": result.get("mfu"),
            "us_per_caption_device": round(per_caption_us, 2),
            "us_per_caption_wall": round(1e6 / result["value"], 2),
            "module_span_ms_per_decode": round(module_us / n_modules / 1e3, 2)
            if n_modules else None,
            "n_traced_decodes": n_decodes,
        },
        "bounds_us_per_caption": {
            "mxu": round(mxu_us, 2),
            "hbm": round(hbm_us, 2),
            "overlapped(max)": round(overlap_bound, 2),
            "serial(sum)": round(serial_bound, 2),
            "pct_of_overlapped_bound": round(
                100.0 * overlap_bound / per_caption_us, 1),
            "pct_of_serial_bound": round(
                100.0 * serial_bound / per_caption_us, 1),
        },
        "model_per_caption": dict(model,
                                  mxu_gflops=round(flops_caption / 1e9, 2)),
        "device_lanes_us_per_caption": lane_table,
        "vocab_argmax_by_shape": argmax_shape_table(
            events, cfg, n_decodes, args.batch),
        "trace_dir": trace_dir,
        "timestamp": result.get("timestamp"),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "captions_per_sec": result["value"],
        "us_per_caption_device": out["measured"]["us_per_caption_device"],
        "bounds": out["bounds_us_per_caption"],
        "lanes": {k: v["us_per_caption"] for k, v in lane_table.items()},
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
