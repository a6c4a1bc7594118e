"""ARB beam-decode whole-step bound decomposition (VERDICT r3 #2).

The NACF decode and train step both carry DESIGN §6 trace-driven accounting;
this closes the gap for the AR beam path — the teacher inside every NACF
rescoring deployment (reference models/Translator.py:148-157 is the cost
anchor: full-prefix recompute + all-position vocab projection every step,
which the KV-cached while_loop here replaces).

Produces, from one profiled run of ``bench.measure_arb``:

  1. per-kernel device time for the timed decode region, attributed by the
     pallas kernel names (beam_attend_step / vocab_topk / cross_attend) and
     XLA op classes (fusions = beam bookkeeping, copies/relayouts,
     dynamic-update-slice, scalar while-loop overhead);
  2. an analytic per-step resource model — MXU FLOPs, HBM bytes (KV-cache
     prefix read+write through the aliased beam-attend kernel, vocab weight
     re-streaming per row tile, activations) — and the implied per-step
     roofline at the device's peak matmul rate and HBM bandwidth;
  3. the verdict: measured step time vs max(MXU, HBM) bound and vs the
     serial (sum) bound, with the residual attributed to the trace lanes.

Writes ARB_DECOMP.json. Run on the live TPU:

    python scripts/arb_decompose.py [--batch 1024] [--no-run profiles/<ts>]
"""

import argparse
import collections
import json
import os
import re
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

# v5e HBM: 16 GB @ ~819 GB/s per chip (public spec); override for other gens
HBM_GBPS = float(os.environ.get("NAVC_TPU_HBM_GBPS", "819"))

KERNEL_LANES = {
    "beam_attend_step": "beam_attend (fused permute+append+attend)",
    "vocab_topk": "vocab top-k (fused projection+online-softmax top-k)",
    "cross_attend": "cross_attend (once per decode)",
    "vocab_argmax": "vocab argmax",
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
        return "XLA fusions (beam bookkeeping: top-k merge, reorder, scores)"
    if re.search(r"while|select-and|tuple|parameter|broadcast", op):
        return "while-loop plumbing (self-time: per-step sequencing gaps)"
    return "other"


def step_model(cfg, n_enc: int, b: int):
    """Analytic per-decode-step MXU FLOPs and HBM bytes at batch b.

    Mirrors what the compiled program actually does (decoding/beam.py):
    one fused beam_attend_step (in-place cache prefix read+write), the
    per-position dense q/k/v/o + FFN matmuls, one fused vocab top-k, and
    the (b, k*k) beam merge. Averaged over steps t=0..steps-1.
    """
    from navc_tpu.ops.beam_attend import pick_ltile

    d = cfg.dim_hidden
    v = cfg.vocab_size
    ffn = cfg.intermediate_size
    k = cfg.beam_size
    L = cfg.max_len
    steps = L - 1
    n = b * k

    tl = pick_ltile(L, d)
    # average number of l-tiles touched per step (prefix clamp in cache_map)
    tiles = [int(np.ceil((t + 1) / tl)) for t in range(steps)]
    avg_tiles = float(np.mean(tiles))

    bytes_cache = (n * avg_tiles * tl * d * 2    # k-cache block read
                   ) * 2 * 2                     # * (k,v) * (read+write)
    bytes_attend_io = n * d * (2 * 3 + 4)        # q/kt/vt bf16 in, att f32 out
    bytes_mask = n * (L // tl + 1) * 128 * 4     # repacked additive mask

    tn = min(512, n)
    row_tiles = int(np.ceil(n / tn))
    v_pad = int(np.ceil(v / 2048.0)) * 2048
    bytes_vocab_w = row_tiles * d * v_pad * 2    # W re-streamed per row tile
    bytes_vocab_h = n * d * 2
    bytes_dense_w = (4 + 2) * d * d * 2 + 2 * d * ffn * 2   # layer weights
    bytes_dense_act = n * d * 2 * 6              # qkv/o/ffn handoffs (approx)

    hbm_step = (bytes_cache + bytes_attend_io + bytes_mask
                + bytes_vocab_w + bytes_vocab_h
                + bytes_dense_w + bytes_dense_act)

    flops_step = n * (4 * 2 * d * d + 2 * 2 * d * d + 2 * 2 * d * ffn
                      + 2 * 2 * (L / 2) * d     # self-attn scores+apply, avg
                      + 2 * 2 * n_enc * d       # cross attn
                      + 2 * d * v)              # vocab projection
    return {
        "steps": steps,
        "avg_cache_tiles": avg_tiles,
        "l_tile": tl,
        "hbm_bytes_per_step": {
            "kv_cache_prefix_rw": bytes_cache,
            "attend_row_io": bytes_attend_io + bytes_mask,
            "vocab_w_restream": bytes_vocab_w,
            "vocab_h": bytes_vocab_h,
            "dense_weights": bytes_dense_w,
            "dense_activations": bytes_dense_act,
            "total": hbm_step,
        },
        "mxu_flops_per_step": flops_step,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--no-run", metavar="CAPTURE_DIR", default=None,
                    help="skip the live run; decompose an existing capture "
                         "(pairs with the freshest BENCH_LIVE_ARB.json)")
    ap.add_argument("--out", default=os.path.join(ROOT, "ARB_DECOMP.json"))
    ap.add_argument("--sweep", nargs="*", type=int, default=None,
                    metavar="B", help="also measure (unprofiled) decode "
                    "throughput at these batch sizes and record a "
                    "batch_sweep section (default when flag given bare: "
                    "4096 8192)")
    args = ap.parse_args()
    if args.sweep == []:
        args.sweep = [4096, 8192]

    import bench
    from trace_summary import find_trace, load_events, module_spans, self_times

    if args.no_run:
        with open(os.path.join(ROOT, "BENCH_LIVE_ARB.json")) as f:
            result = json.load(f)
        trace_dir = args.no_run
    else:
        if not bench._device_available():
            print(json.dumps({"error": "accelerator unreachable"}))
            return 1
        result = bench.measure_arb(batch_size=args.batch, profile=True,
                                   quiet=True)
        trace_dir = result["trace_dir"]

    # exclusive self-time from the 'XLA Ops' lane only: the parallel
    # 'XLA Modules' lane duplicates the whole timeline (one envelope event
    # per executed program) and within the op lane fusions nest
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
    # the trace covers warmup-free timed decodes only (trace starts after the
    # 3 warmup decodes) but includes BOTH timed loops of measure_arb — 10
    # sequential + 10 pipelined. Normalize by the module envelope count (one
    # per executed decode program), not the per-loop iteration constant: the
    # r5 pipelined loop doubled the traced decodes and an assumed 10 inflated
    # every per-step number 2x.
    iters = n_modules if n_modules else 10

    from navc_tpu.config import default_config
    cfg = default_config("ARB", dataset="MSRVTT", vocab_size=10048,
                         batch_size=args.batch, use_pallas=True)
    n_enc = 8 + (1 if cfg.with_category else 0)
    model = step_model(cfg, n_enc, args.batch)
    steps = model["steps"]

    per_step_us = total_op_us / iters / steps
    mxu_us = model["mxu_flops_per_step"] / (197e12 * 0.95) * 1e6
    hbm_us = model["hbm_bytes_per_step"]["total"] / (HBM_GBPS * 1e9) * 1e6
    overlap_bound = max(mxu_us, hbm_us)
    serial_bound = mxu_us + hbm_us

    lane_table = {
        lane: {
            "us_per_step": round(dur / iters / steps, 1),
            "pct": round(100.0 * dur / total_op_us, 1),
            "top_ops": {op: int(d // (iters * steps))
                        for op, d in lane_ops[lane].most_common(3)},
        }
        for lane, dur in lanes.most_common()
    }

    # --- per-lane floors + measured rejections (VERDICT r4 #2) -----------
    # Each kernel lane gets its own max(MXU, HBM) floor from the same
    # analytic model; the bookkeeping lanes get the measured rejection log
    # of what was already tried. Together these say WHY the whole-step
    # overlapped bound is unreachable: the bound assumes every lane hides
    # behind the largest one, but the while_loop serializes kernel launches
    # within a step (each op's output feeds the next), so the realistic
    # floor is closer to the serial sum of per-lane floors.
    d = cfg.dim_hidden
    v = cfg.vocab_size
    ffn = cfg.intermediate_size
    k = cfg.beam_size
    n = args.batch * k
    hb = model["hbm_bytes_per_step"]
    mxu_rate = 197e12 * 0.95
    bw = HBM_GBPS * 1e9

    def floor(mxu_flops, hbm_bytes):
        m = mxu_flops / mxu_rate * 1e6
        h_ = hbm_bytes / bw * 1e6
        return {"mxu_us": round(m, 1), "hbm_us": round(h_, 1),
                "floor_us": round(max(m, h_), 1)}

    le = 8 + (1 if cfg.with_category else 0)
    flops_attend = n * 2 * 2 * (cfg.max_len / 2) * d  # scores+apply, avg prefix
    flops_permute = n * k * model["avg_cache_tiles"] * model["l_tile"] * d * 2 * 2
    flops_vocab = n * 2 * d * v
    flops_cross = n * 2 * 2 * le * d
    flops_dense = n * (4 * 2 * d * d + 2 * 2 * d * d + 2 * 2 * d * ffn)

    def lane_meas(key):
        for lane, dur in lanes.items():
            if key in lane:
                return round(dur / iters / steps, 1)
        return None

    lane_bounds = {
        "beam_attend": dict(
            floor(flops_attend + flops_permute,
                  hb["kv_cache_prefix_rw"] + hb["attend_row_io"]),
            measured_us=lane_meas("beam_attend"),
            note=("floor = cache-prefix read+write (the in-kernel ancestry "
                  "permute makes the write intrinsic: a lazy-reorder design "
                  "that only READS with backpointer indirection would halve "
                  "cache traffic but needs per-row dynamic gathers along the "
                  "batch axis, which Mosaic lowers to scalar-core loops - "
                  "measured rejection: the standalone permute-kernel variant "
                  "paid ~2 ms/step in layout copies, see ops/beam_attend.py "
                  "module docstring)")),
        "vocab_topk": dict(
            floor(flops_vocab, d * v * 2 + n * d * 2),
            measured_us=lane_meas("vocab top-k"),
            note=("floor = projection MXU flops with W streamed once; the "
                  "gap is the k-extraction epilogue (k max/argmax/mask VPU "
                  "passes per vocab tile + 2k-merge across tiles). Measured "
                  "rejections: whole-V tiles (tv>=V, the NACF argmax win) "
                  "crash Mosaic for this kernel's k-wide scratch "
                  "(KERNEL_BENCH.json rejected: topk5 tn128_tv5120); "
                  "packed score+id single-pass extraction changes low-"
                  "mantissa tie order vs lax.top_k - breaks the token-exact "
                  "parity contract (CLAUDE.md)")),
        "cross_attend": dict(
            floor(flops_cross, 2 * n * le * d * 2),
            measured_us=lane_meas("cross_attend"),
            note=("floor = streaming the row-expanded enc K/V (pinned in HBM "
                  "once per decode, r5 optimization_barrier fix) every step; "
                  "per-step recompute-from-enc was the r4 formulation - "
                  "measured rejection: XLA sank the expansion into the loop, "
                  "975 us/step at B=1024")),
        "dense_matmuls": dict(
            floor(flops_dense,
                  hb["dense_weights"] + hb["dense_activations"]),
            measured_us=None,
            note=("qkv/o/cross-proj/ffn matmuls; land inside XLA fusions in "
                  "the trace so no isolated lane measurement")),
        "bookkeeping (fusions + plumbing + other)": dict(
            floor_us=0.0,
            measured_us=round(sum(
                dur for lane, dur in lanes.items()
                if ("fusions" in lane or "plumbing" in lane
                    or lane == "other" or "copies" in lane))
                / iters / steps, 1),
            note=("no analytic floor (top-k merge, EOS append, seq reorder, "
                  "while-loop sequencing). Measured rejections already "
                  "landed: scatter-free one-hot finished-append (-150 "
                  "us/step), carried-token refactor (-80 us/step), "
                  "loop-invariant enc-K/V pin (-975 us/step), scalar-core "
                  "bookkeeping cuts (r5 commits 2c1a1f3/27ca421)")),
    }
    serial_floor = round(sum(
        lb.get("floor_us", 0.0) for lb in lane_bounds.values()), 1)

    out = {
        "protocol": ("one profiled bench.measure_arb run (B=%d, beam=%d, "
                     "%d steps x %d iterations); device-lane op time "
                     "attributed by pallas kernel name + XLA op class; "
                     "analytic per-step MXU/HBM model at %.0f GB/s, "
                     "197 bf16 TFLOP/s (x0.95 achievable)"
                     % (args.batch, cfg.beam_size, steps, iters, HBM_GBPS)),
        "measured": {
            "captions_per_sec": result["value"],
            "mfu": result.get("mfu"),
            "per_step_device_us": round(per_step_us, 1),
            "wall_per_decode_ms": round(
                args.batch / result["value"] * 1e3, 2),
            # envelope accounting: ops vs the program span vs wall
            "module_span_ms_per_decode": round(module_us / n_modules / 1e3, 2)
            if n_modules else None,
            "in_module_gap_us_per_step": round(
                (module_us - total_op_us) / iters / steps, 1)
            if n_modules else None,
            "host_dispatch_ms_per_decode": round(
                args.batch / result["value"] * 1e3
                - module_us / max(n_modules, 1) / 1e3, 2)
            if n_modules else None,
        },
        "bounds_us_per_step": {
            "mxu": round(mxu_us, 1),
            "hbm": round(hbm_us, 1),
            "overlapped(max)": round(overlap_bound, 1),
            "serial(sum)": round(serial_bound, 1),
            "pct_of_overlapped_bound": round(
                100.0 * overlap_bound / per_step_us, 1),
            "pct_of_serial_bound": round(
                100.0 * serial_bound / per_step_us, 1),
        },
        "model_per_step": model,
        "device_lanes_us_per_step": lane_table,
        "lane_bounds_us_per_step": lane_bounds,
        "serial_sum_of_lane_floors_us": serial_floor,
        "trace_dir": trace_dir,
        "timestamp": result.get("timestamp"),
    }
    if args.sweep:
        # batch scaling (VERDICT r4 #6/weak-6): whether the canonical B=1024
        # point is dispatch/batch-starved or per-step-device bound
        sweep = {str(args.batch): {k: result.get(k) for k in
                                   ("value", "pipelined_value", "mfu")}}
        for bsz in args.sweep:
            r = bench.measure_arb(batch_size=bsz, quiet=True)
            sweep[str(bsz)] = {k: r.get(k) for k in
                               ("value", "pipelined_value", "mfu")}
            if bsz * 5 > 20480:
                sweep[str(bsz)]["note"] = ("fused top-k ineligible at "
                                           "N=%d (scoped-vmem OOM); XLA "
                                           "lax.top_k fallback" % (bsz * 5))
        out["batch_sweep"] = sweep
    elif args.no_run and os.path.exists(args.out):
        # a --no-run re-decompose must not silently drop the previous run's
        # live batch sweep — carry it over
        with open(args.out) as f:
            prev = json.load(f)
        if "batch_sweep" in prev:
            out["batch_sweep"] = prev["batch_sweep"]
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "captions_per_sec": result["value"],
        "per_step_device_us": out["measured"]["per_step_device_us"],
        "bounds": out["bounds_us_per_step"],
        "lanes": {k: v["us_per_step"] for k, v in lane_table.items()},
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
