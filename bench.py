"""Benchmark: NACF decode throughput (captions/sec/chip) on real hardware.

Protocol (mirrors the reference latency protocol, translate.py:149-151 +
misc/run.py:139-143: encode outside the timed region, time the translate
call): the flagship NACF configuration at reference scale — d=512, 1 decoder
layer, 8 heads, FFN 2048, vocab 10048, max_len 30 — with the default decode
cost: 5 mask-predict iterations x length-beam 6, +1 coarse-template pass,
+1 AR-teacher rescoring forward (BASELINE.md decode-cost table).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "captions/sec/chip", "vs_baseline": N,
     "tflops": N, "mfu": N, ...}
("value" keeps the reference's sequential per-batch protocol;
"pipelined_value" overlaps dispatch/transfer with compute like a serving
frontend. Weights are random-init — NAR decode cost is weight-independent
(same forwards/argmax work regardless of values); caption QUALITY parity is
evidenced separately by PARITY_TRAINING.json + the token-exact
cross-implementation tests.)

A live run writes its result (timestamped) to BENCH_LIVE.json. If the
accelerator is unreachable, the harness falls back to BENCH_LIVE.json ONLY if
it is younger than NAVC_BENCH_MAX_AGE_H (default 12h — one build round);
otherwise it reports value=null so a dead tunnel can never masquerade as a
perf number.

Flags:
    --profile   capture a jax.profiler trace of the timed region into
                profiles/ (one-shot; inspect with tensorboard or xprof)
    --batch N   override batch size (default 8192)
"""

import argparse
import datetime
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
LIVE_PATH = os.path.join(HERE, "BENCH_LIVE.json")
MAX_AGE_H = float(os.environ.get("NAVC_BENCH_MAX_AGE_H", "12"))

# bf16 peak matmul throughput per chip, by device_kind substring
PEAK_TFLOPS = {
    "v4": 275.0,
    "v5 lite": 197.0,  # v5e: 394 int8 / 197 bf16
    "v5e": 197.0,
    "v5p": 459.0,
    "v6 lite": 918.0,
    "v6e": 918.0,
}


def _device_available(timeout_s: float = None) -> bool:
    """Probe the accelerator in a SUBPROCESS — a dead tunnel hangs
    jax.devices() forever, which must not hang the benchmark harness.

    The probe runs a tiny matmul end-to-end, not just jax.devices():
    the axon tunnel can enumerate devices fine while its remote compile
    service is wedged, and a devices()-only probe would let the real
    benchmark hang forever at its first compile. A subprocess (not a
    daemon thread) because the axon plugin wedges when jax initializes
    off the main thread, and a stuck thread can't be killed — it turns
    into a C++ ``terminate`` at interpreter exit."""
    import subprocess
    import tempfile

    if timeout_s is None:
        timeout_s = float(os.environ.get("NAVC_DEVICE_PROBE_TIMEOUT", "180"))
    code = ("import jax, jax.numpy as jnp, numpy as np;"
            "jax.devices();"
            "x = jnp.ones((128, 128));"
            "print('PROBE_OK' if float(np.asarray(x @ x)[0, 0]) == 128.0"
            " else 'PROBE_BAD')")
    # DEVNULL stdin + file stdout + its own session: the axon tunnel client
    # wedges when it inherits a python parent's pipes/process group (measured
    # 2026-08-20 — the same probe hangs with capture_output=True and passes
    # with this setup)
    with tempfile.TemporaryFile() as out:
        try:
            subprocess.run(
                [sys.executable, "-c", code], stdin=subprocess.DEVNULL,
                stdout=out, stderr=subprocess.DEVNULL, timeout=timeout_s,
                start_new_session=True)
        except (subprocess.TimeoutExpired, OSError):
            return False
        out.seek(0)
        return b"PROBE_OK" in out.read()


def decode_flops_per_caption(cfg, n_enc_positions: int) -> float:
    """Algorithmic matmul FLOPs of one NACF caption at the benchmark settings.

    Counts the timed region only (decode; encode is outside, like the
    reference latency protocol): per length-beam row, (iterations + use_ct)
    student NAR forwards + 1 AR teacher rescoring forward
    (reference algorithms.py:242, 271-272), each = 1 BertLayer + vocab
    projection. With the sparse-query refinement path
    (ops.eligibility.fused_sparse_eligible), refinement step t only computes
    q_t = max(1, floor(L*(1 - t/T))) query positions — the Q-side matmuls,
    FFN, and vocab projection scale with q_t while K/V stay full-length.
    """
    import math

    d = cfg.dim_hidden
    L = cfg.max_len
    V = cfg.vocab_size
    ffn = cfg.intermediate_size
    Te = n_enc_positions

    def fwd(q):
        q_proj = 2 * q * d * d
        kv_self = 2 * 2 * L * d * d
        attn_self = 2 * 2 * q * L * d          # scores + apply
        out_proj = 2 * q * d * d
        q_cross = 2 * q * d * d
        attn_cross = 2 * 2 * q * Te * d
        cross_out = 2 * q * d * d
        ffn_flops = 2 * 2 * q * d * ffn
        vocab = 2 * q * d * V
        return (q_proj + kv_self + attn_self + out_proj + q_cross +
                attn_cross + cross_out + ffn_flops + vocab)

    from navc_tpu.ops.eligibility import fused_sparse_eligible
    T = cfg.iterations + (1 if cfg.use_ct else 0)
    widths = [L]                     # iteration 0 (CT pass or first predict)
    for c in range(1, T):
        if fused_sparse_eligible(cfg) and not (cfg.use_ct and c == 1):
            widths.append(max(1, int(math.floor(L * (1.0 - c / T)))))
        else:
            widths.append(L)         # dense step (CT completion or no sparse)
    widths.append(L)                 # AR teacher rescoring forward
    # cross-attention K/V are hoisted out of the refinement loop and
    # computed ONCE per video (student) + once for the teacher
    # (ops/fused_layer.py::hoist_cross_kv); they no longer scale with
    # forwards or length-beam rows
    kv_cross_once = 2 * 2 * 2 * Te * d * d
    return (sum(fwd(q) for q in widths) * cfg.length_beam_size
            + kv_cross_once)


def arb_flops_per_caption(cfg, n_enc_positions: int, cached: bool) -> float:
    """Algorithmic matmul FLOPs of one ARB beam-search caption.

    ``cached=True`` counts the KV-cached incremental decode this repo runs
    (decoding/beam.py: one new position per step, cross K/V once per decode);
    ``cached=False`` counts the reference's full-prefix recompute with the
    all-positions vocab projection every step (Translator.py:108) — the cost
    model behind the zero-overhead GPU bound.
    """
    d = cfg.dim_hidden
    V = cfg.vocab_size
    ffn = cfg.intermediate_size
    Te = n_enc_positions
    k = cfg.beam_size
    steps = cfg.max_len - 1   # t = 1 .. max_len-1 (BOS fixed at t=0)

    if cached:
        per_step = (4 * 2 * d * d          # self q/k/v/o of ONE position
                    + 2 * 2 * d * d        # cross q + out
                    + 2 * 2 * d * ffn      # FFN
                    + 2 * 2 * steps * d    # self attn scores+apply vs cache
                    + 2 * 2 * Te * d       # cross attn
                    + 2 * d * V)           # vocab projection of one position
        once = 2 * 2 * Te * d * d          # cross K/V, once per decode
        return k * (steps * per_step + once)

    total = 0.0
    for t in range(1, steps + 1):          # prefix length t each step
        total += (4 * 2 * t * d * d + 2 * 2 * t * d * d
                  + 2 * 2 * Te * d * d    # cross K/V recomputed per forward
                  + 2 * 2 * t * t * d + 2 * 2 * t * Te * d
                  + 2 * 2 * t * d * ffn
                  + 2 * t * d * V)        # projects EVERY position each step
    return k * total


def train_flops_per_caption(cfg, n_enc_positions: int) -> float:
    """Algorithmic matmul FLOPs of one caption's NACF training step.

    Forward = encoder streams + fusion + length head + TWO decoder passes
    (visual-word generation, reference seq2seq 2-pass wiring) each with a
    full-width vocab projection; backward doubles the matmul work
    (dgrad + wgrad), so total = 3x forward.
    """
    d = cfg.dim_hidden
    L = cfg.max_len
    V = cfg.vocab_size
    ffn = cfg.intermediate_size
    Tf = cfg.n_frames
    Te = n_enc_positions

    enc = sum(2 * Tf * (dim * d + 2 * d * d) for dim in cfg.modality_dims)
    length_head = 2 * d * L

    def decoder_pass():
        q_proj = 2 * L * d * d
        kv_self = 2 * 2 * L * d * d
        attn_self = 2 * 2 * L * L * d
        out_proj = 2 * L * d * d
        q_cross = 2 * L * d * d
        kv_cross = 2 * 2 * Te * d * d
        attn_cross = 2 * 2 * L * Te * d
        cross_out = 2 * L * d * d
        ffn_flops = 2 * 2 * L * d * ffn
        vocab = 2 * L * d * V
        return (q_proj + kv_self + attn_self + out_proj + q_cross + kv_cross
                + attn_cross + cross_out + ffn_flops + vocab)

    n_passes = 2 if cfg.visual_word_generation else 1
    forward = enc + length_head + n_passes * decoder_pass()
    return 3.0 * forward


def _mfu_fields(captions_per_sec: float, flops_caption: float) -> dict:
    import jax
    tflops = captions_per_sec * flops_caption / 1e12
    kind = jax.devices()[0].device_kind.lower()
    peak = float(os.environ.get("NAVC_TPU_PEAK_TFLOPS", 0)) or next(
        (v for k, v in PEAK_TFLOPS.items() if k in kind), None)
    return {
        "tflops": round(tflops, 2),
        "mfu": round(tflops / peak, 4) if peak else None,
        "gflop_per_caption": round(flops_caption / 1e9, 2),
        "device_kind": jax.devices()[0].device_kind,
    }


def _maybe_start_trace(profile: bool):
    if not profile:
        return None
    import jax
    trace_dir = os.path.join(HERE, "profiles",
                             datetime.datetime.now().strftime("%Y%m%d_%H%M%S"))
    jax.profiler.start_trace(trace_dir)
    return trace_dir


def _maybe_stop_trace(trace_dir, result: dict):
    if trace_dir is None:
        return
    import jax
    jax.profiler.stop_trace()
    result["trace_dir"] = trace_dir


def _record_arb_live(result: dict, batch_size: int, probe: bool,
                     path: str = None):
    """Record an ARB measurement into the canonical live artifact.

    Probe runs (token dumps / non-default precision A/Bs) never touch the
    artifact. The canonical protocol batch (1024) replaces it; larger
    batches — which amortize the 29 sequential per-step kernel launches
    over more rows — attach as a ``large_batch`` secondary inside the
    canonical entry instead of replacing it.
    """
    path = path or os.path.join(HERE, "BENCH_LIVE_ARB.json")
    if probe:
        return
    if batch_size == 1024:
        result.pop("large_batch", None)
        _write_json(path, result)
    elif batch_size > 1024 and os.path.exists(path):
        with open(path) as f:
            live = json.load(f)
        live["large_batch"] = {k: result[k] for k in
                               ("metric", "value", "mfu", "timestamp")}
        _write_json(path, live)


def measure_arb(batch_size: int = 1024, profile: bool = False,
                save_tokens: str = None, quiet: bool = False):
    """ARB beam-5 decode throughput with FLOP/MFU accounting (VERDICT r2 #5).

    Protocol mirrors the reference latency protocol (translate.py:149-151):
    encode outside the timed region, time the translate call.
    Writes BENCH_LIVE_ARB.json.

    ``save_tokens`` dumps the decoded token matrix to an .npz so two runs can
    be diffed — e.g. an NAVC_ATTEND_PREC=highest vs =default A/B (the fused
    beam-attend kernel's matmul-precision knob, ops/beam_attend.py; the env
    var is read at import time, so the A/B needs two subprocesses).
    """
    import jax
    import jax.numpy as jnp

    from navc_tpu.runtime.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from navc_tpu.config import default_config
    from navc_tpu.decoding import make_ar_generator
    from navc_tpu.models import build_model, init_params
    from navc_tpu.runtime.train_step import make_encode_fn

    cfg = default_config("ARB", dataset="MSRVTT",
                         vocab_size=10048, batch_size=batch_size,
                         use_pallas=True)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    gen = make_ar_generator(cfg, model)
    rng = np.random.RandomState(0)
    b = batch_size
    feats = [jnp.asarray(rng.randn(b, cfg.n_frames, d).astype(np.float32))
             for d in cfg.modality_dims]
    category = jnp.asarray(rng.randint(0, cfg.num_category, (b, 1)), np.int32)
    encode = make_encode_fn(cfg, model)
    enc = encode(variables["params"], variables.get("batch_stats", {}), feats)

    for _ in range(3):
        np.asarray(gen(variables, enc, category)[0])
    n_iters = 10
    trace_dir = _maybe_start_trace(profile)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        hyp, _ = gen(variables, enc, category)
        np.asarray(hyp)
    dt = time.perf_counter() - t0
    cps = b * n_iters / dt

    # pipelined: dispatch every decode before syncing any output — the
    # serving posture (runtime/serving.py overlaps host round-trips with
    # device compute); mirrors the NACF/train benches' pipelined entries so
    # the three workloads are comparable. Over the axon tunnel the
    # sequential loop pays ~30 ms of host RTT per decode that this amortizes.
    t0 = time.perf_counter()
    hyps = [gen(variables, enc, category)[0] for _ in range(n_iters)]
    np.asarray(hyps[-1])
    dt_pipe = time.perf_counter() - t0
    cps_pipe = b * n_iters / dt_pipe

    n_enc = int(enc["enc_output"].shape[1])
    fl = arb_flops_per_caption(cfg, n_enc, cached=True)
    gpu_bound = 13.45e12 / arb_flops_per_caption(cfg, n_enc, cached=False)
    result = {
        "metric": ("ARB MSR-VTT-scale beam-%d decode throughput "
                   "(d=512,vocab=10048,B=%d,KV-cached)" % (cfg.beam_size, b)),
        "value": round(cps, 2),
        "pipelined_value": round(cps_pipe, 2),
        "pipelined_mfu": _mfu_fields(cps_pipe, fl)["mfu"],
        "unit": "captions/sec/chip",
        "vs_gpu_roofline": round(cps / gpu_bound, 2),
        "timestamp": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        **_mfu_fields(cps, fl),
    }
    prec = os.environ.get("NAVC_ATTEND_PREC")
    if prec:
        result["attend_prec"] = prec
    if save_tokens:
        np.savez(save_tokens, tokens=np.asarray(hyp))
        result["tokens_out"] = save_tokens
    _maybe_stop_trace(trace_dir, result)
    _record_arb_live(result, batch_size,
                     probe=bool(save_tokens or (prec and prec != "highest")
                                or os.environ.get("NAVC_SEG_PASSES")
                                not in (None, "2")
                                or os.environ.get("NAVC_BEAM_GROUP")
                                not in (None, "16")
                                or os.environ.get("NAVC_CROSS_RTILE")
                                not in (None, "256")))
    print(json.dumps(result), file=sys.stderr if quiet else sys.stdout)
    return result


def measure_train(batch_size: int = 2048, profile: bool = False,
                  quiet: bool = False):
    """NACF train-step throughput with FLOP/MFU accounting (VERDICT r2 #5).

    Times the full jitted step (2-pass forward, losses, backward, clip,
    Adam, BN stats) on synthetic batches. Writes BENCH_LIVE_TRAIN.json.
    """
    import jax
    import jax.numpy as jnp

    from navc_tpu.runtime.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from navc_tpu import constants as NC
    from navc_tpu.config import default_config
    from navc_tpu.models import build_model, init_params
    from navc_tpu.runtime.train_step import create_train_state, make_train_step

    b = batch_size
    cfg = default_config("NACF", dataset="MSRVTT", vocab_size=10048,
                         batch_size=b, use_pallas=True)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(cfg, model, variables)
    step = make_train_step(cfg, model, tx)

    rng = np.random.RandomState(0)
    lengths = rng.randint(5, cfg.max_len - 1, size=b)
    tokens = np.full((b, cfg.max_len), NC.PAD, np.int32)
    labels = np.full((b, cfg.max_len), NC.PAD, np.int32)
    for i in range(b):
        l = lengths[i]
        tokens[i, :l] = rng.randint(6, cfg.vocab_size, size=l)
        tokens[i, : l // 2] = NC.MASK
        labels[i, : l // 2] = rng.randint(6, cfg.vocab_size, size=l // 2)
    lt = rng.rand(b, cfg.max_len).astype(np.float32)
    lt /= lt.sum(-1, keepdims=True)
    batch = {
        "tokens": jnp.asarray(tokens), "labels": jnp.asarray(labels),
        "tokens_1": jnp.full((b, cfg.max_len), NC.VIS, jnp.int32),
        "labels_1": jnp.asarray(np.where(rng.rand(b, cfg.max_len) < 0.3,
                                         NC.MASK, labels).astype(np.int32)),
        "length_target": jnp.asarray(lt),
        "category": jnp.asarray(rng.randint(0, cfg.num_category, (b, 1)).astype(np.int32)),
        "valid_mask": jnp.ones(b, jnp.float32),
    }
    for ch in cfg.modality.lower():
        batch["feats_%s" % ch] = jnp.asarray(
            rng.randn(b, cfg.n_frames, getattr(cfg, "dim_%s" % ch)).astype(np.float32))

    key = jax.random.PRNGKey(1)
    state, m = step(state, batch, key)
    float(m["total_loss"])
    n_iters = 10
    trace_dir = _maybe_start_trace(profile)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, batch, key)
        loss = float(m["total_loss"])  # host sync each step
    dt = (time.perf_counter() - t0) / n_iters
    cps = b / dt

    # pipelined: dispatch every step before syncing any metric — how the
    # training loop actually runs (runtime/loop.py defers metric reads to
    # epoch end), so per-step host round-trips overlap device compute
    t0 = time.perf_counter()
    ms = []
    for _ in range(n_iters):
        state, m = step(state, batch, key)
        ms.append(m)
    loss = float(ms[-1]["total_loss"])
    dt_pipe = (time.perf_counter() - t0) / n_iters
    cps_pipe = b / dt_pipe

    fl = train_flops_per_caption(cfg, cfg.n_frames)
    result = {
        "metric": ("NACF MSR-VTT-scale train-step throughput "
                   "(d=512,vocab=10048,2-pass,B=%d)" % b),
        "value": round(cps, 2),
        "pipelined_value": round(cps_pipe, 2),
        "pipelined_mfu": _mfu_fields(cps_pipe, fl)["mfu"],
        "unit": "captions/sec/chip",
        "loss": round(loss, 3),
        "timestamp": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        **_mfu_fields(cps, fl),
    }
    _maybe_stop_trace(trace_dir, result)
    _write_json(os.path.join(HERE, "BENCH_LIVE_TRAIN.json"), result)
    print(json.dumps(result), file=sys.stderr if quiet else sys.stdout)
    return result


def _write_json(path: str, obj: dict):
    """Write a JSON artifact with a trailing newline (advisor r3)."""
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)
        f.write("\n")


def read_prev_round() -> dict:
    """Previous-round committed bench values {workload: captions/sec} from the
    newest BENCH_r*.json the driver recorded — the regression-tripwire
    reference (VERDICT r3 #5)."""
    import glob
    import re

    files = sorted(glob.glob(os.path.join(HERE, "BENCH_r*.json")),
                   key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    for p in reversed(files):
        try:
            with open(p) as f:
                parsed = json.load(f).get("parsed") or {}
            out = {}
            if isinstance(parsed.get("value"), (int, float)):
                out["nacf"] = float(parsed["value"])
            for k in ("arb", "train"):
                v = (parsed.get(k) or {}).get("value")
                if isinstance(v, (int, float)):
                    out[k] = float(v)
            if out:
                out["_source"] = os.path.basename(p)
                return out
        except Exception:
            continue
    return {}


def check_regression(out: dict, tol: float = 0.05) -> dict:
    """Flag any workload whose fresh value dropped >tol below the committed
    previous-round value. Flags (never hides the artifact): the driver records
    the printed line either way, and a missing line would be worse evidence
    than a flagged one."""
    prev = read_prev_round()
    if not prev:
        return out
    regressions = {}
    pairs = [("nacf", out.get("value"))]
    for k in ("arb", "train"):
        pairs.append((k, (out.get(k) or {}).get("value")))
    for key, val in pairs:
        ref = prev.get(key)
        if ref and isinstance(val, (int, float)) and val < (1.0 - tol) * ref:
            regressions[key] = {"value": round(val, 2), "prev": round(ref, 2),
                                "drop_pct": round(100 * (1 - val / ref), 1)}
    if regressions:
        out["regression"] = {"vs": prev["_source"], **regressions}
        print("bench REGRESSION vs %s: %s" % (prev["_source"],
                                              json.dumps(regressions)),
              file=sys.stderr)
    return out


def _attach_secondary(out: dict):
    """Attach the freshest ARB/train live entries (age-marked) so all three
    workloads are visible in the driver-captured bench line."""
    for key, fname in (("arb", "BENCH_LIVE_ARB.json"),
                       ("train", "BENCH_LIVE_TRAIN.json")):
        p = os.path.join(HERE, fname)
        if not os.path.exists(p):
            continue
        try:
            with open(p) as f:
                live = json.load(f)
            ts = datetime.datetime.fromisoformat(live["timestamp"])
            live["age_h"] = round(
                (datetime.datetime.now(datetime.timezone.utc) - ts
                 ).total_seconds() / 3600.0, 1)
            out[key] = live
        except Exception:
            pass
    return out


def build_flagship(batch_size: int, ckpt: str = None, tckpt: str = None):
    import jax

    from navc_tpu.runtime.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from navc_tpu.config import default_config
    from navc_tpu.decoding import make_nar_generator
    from navc_tpu.models import build_model, init_params

    over = dict(vocab_size=10048, batch_size=batch_size, use_pallas=True)
    if ckpt:
        # trained weights (e.g. from scripts/flagship_e2e.py) — attaches a
        # real-quality checkpoint to the perf number; decode cost itself is
        # weight-independent
        from navc_tpu.runtime.checkpoint import load_model_and_config
        model, variables, cfg, _ = load_model_and_config(ckpt)
        cfg = cfg.replace(batch_size=batch_size, use_pallas=True)
        model = build_model(cfg)
    else:
        cfg = default_config("NACF", dataset="MSRVTT", **over)
        model = build_model(cfg)
        variables = init_params(model, jax.random.PRNGKey(0), cfg)

    if tckpt:
        from navc_tpu.runtime.checkpoint import load_model_and_config
        teacher, tvars, tcfg, _ = load_model_and_config(tckpt)
        tcfg = tcfg.replace(batch_size=batch_size)
        teacher = build_model(tcfg)
    else:
        tcfg = default_config("ARB", dataset="MSRVTT", **over)
        teacher = build_model(tcfg)
        tvars = init_params(teacher, jax.random.PRNGKey(1), tcfg)

    gen = make_nar_generator(cfg, model, teacher)
    return cfg, model, variables, teacher, tvars, gen


def metric_name(batch_size: int, suffix: str = "") -> str:
    return ("NACF MSR-VTT-scale decode throughput "
            "(d=512,vocab=10048,T=5,lbs=6,CT,teacher-rescore,B=%d,pallas)%s"
            % (batch_size, suffix))


def read_baseline():
    p = os.path.join(HERE, "BASELINE_MEASURED.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f).get("captions_per_sec")
    return None


def main(batch_size: int = 8192, profile: bool = False,
         ckpt: str = None, tckpt: str = None):
    import jax
    import jax.numpy as jnp

    cfg, model, variables, teacher, tvars, gen = build_flagship(
        batch_size, ckpt=ckpt, tckpt=tckpt)
    b = cfg.batch_size
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(b, cfg.n_frames, d).astype(np.float32))
             for d in cfg.modality_dims]
    category = jnp.asarray(rng.randint(0, cfg.num_category, size=(b, 1)), np.int32)

    from navc_tpu.runtime.train_step import make_encode_fn
    encode = make_encode_fn(cfg, model)
    tencode = make_encode_fn(cfg, teacher)
    enc = jax.block_until_ready(
        encode(variables["params"], variables.get("batch_stats", {}), feats))
    tenc = jax.block_until_ready(
        tencode(tvars["params"], tvars.get("batch_stats", {}), feats))

    # compile + warmup; np.asarray forces a host round-trip — the experimental
    # axon tunnel's block_until_ready does not reliably wait for execution
    for _ in range(3):
        np.asarray(gen(variables, enc, category, tvars, tenc, None))

    trace_dir = None
    if profile:
        trace_dir = os.path.join(HERE, "profiles",
                                 datetime.datetime.now().strftime("%Y%m%d_%H%M%S"))
        os.makedirs(trace_dir, exist_ok=True)
        jax.profiler.start_trace(trace_dir)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = np.asarray(gen(variables, enc, category, tvars, tenc, None))
    dt = time.perf_counter() - t0
    if profile:
        jax.profiler.stop_trace()
    captions_per_sec = b * n_iters / dt

    # secondary: pipelined serving throughput — issue every batch before
    # syncing any result, so dispatch/transfer overlap device compute (a
    # serving frontend runs this way; the primary metric keeps the
    # reference's sequential per-batch protocol)
    t0 = time.perf_counter()
    outs = [gen(variables, enc, category, tvars, tenc, None)
            for _ in range(n_iters)]
    for o in outs:
        np.asarray(o)
    dt_pipe = time.perf_counter() - t0
    pipelined_cps = b * n_iters / dt_pipe

    # FLOP accounting / MFU -------------------------------------------------
    n_enc = int(enc["enc_output"].shape[1])
    flops_caption = decode_flops_per_caption(cfg, n_enc)
    tflops = captions_per_sec * flops_caption / 1e12
    kind = jax.devices()[0].device_kind.lower()
    peak = float(os.environ.get("NAVC_TPU_PEAK_TFLOPS", 0)) or next(
        (v for k, v in PEAK_TFLOPS.items() if k in kind), None)
    mfu = round(tflops / peak, 4) if peak else None

    baseline = read_baseline()
    # zero-overhead fp32 compute bound for the reference on its published
    # GPU class (2080Ti, 13.45 TFLOP/s; derivation in BASELINE.md) — the
    # eager host-loop reference cannot actually reach this
    gpu_bound = 13.45e12 / decode_flops_per_caption(
        cfg.replace(use_pallas=False), n_enc)
    result = {
        "metric": metric_name(b, " [trained ckpt]" if ckpt else ""),
        "value": round(captions_per_sec, 2),
        "unit": "captions/sec/chip",
        "vs_baseline": round(captions_per_sec / baseline, 2) if baseline else None,
        "vs_gpu_roofline": round(captions_per_sec / gpu_bound, 2),
        "pipelined_value": round(pipelined_cps, 2),
        "tflops": round(tflops, 2),
        "mfu": mfu,
        "gflop_per_caption": round(flops_caption / 1e9, 2),
        "device_kind": jax.devices()[0].device_kind,
        "timestamp": datetime.datetime.now(datetime.timezone.utc).isoformat(),
    }
    if trace_dir:
        result["trace_dir"] = trace_dir
    _write_json(LIVE_PATH, result)
    _attach_secondary(result)
    check_regression(result)
    print(json.dumps(result))
    return result


def report_fallback(batch_size: int = 8192):
    """Accelerator unreachable: report the last LIVE value only if fresh."""
    baseline = read_baseline()
    out = {
        "metric": metric_name(
            batch_size, " [STALE: accelerator unreachable at bench time]"),
        "value": None,
        "unit": "captions/sec/chip",
        "vs_baseline": None,
        "error": "accelerator unreachable and no fresh BENCH_LIVE.json",
    }
    if os.path.exists(LIVE_PATH):
        with open(LIVE_PATH) as f:
            live = json.load(f)
        try:
            ts = datetime.datetime.fromisoformat(live["timestamp"])
            age_h = (datetime.datetime.now(datetime.timezone.utc) - ts
                     ).total_seconds() / 3600.0
        except Exception:
            age_h = float("inf")
        if age_h <= MAX_AGE_H:
            out = dict(live)
            out["metric"] = (live.get("metric", metric_name(batch_size)) +
                             " [STALE: accelerator unreachable; live value "
                             "%.1fh old]" % age_h)
            out["vs_baseline"] = (round(live["value"] / baseline, 2)
                                  if baseline and live.get("value") else None)
        else:
            out["error"] = ("accelerator unreachable; BENCH_LIVE.json is "
                            "%.1fh old (max %.0fh) — refusing to report it"
                            % (age_h, MAX_AGE_H))
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--ckpt", default=None,
                    help="trained NACF checkpoint (flagship_e2e.py output)")
    ap.add_argument("--tckpt", default=None,
                    help="trained ARB teacher checkpoint")
    ap.add_argument("--save-tokens", default=None, metavar="NPZ",
                    help="(arb) dump decoded tokens for a precision A/B diff")
    ap.add_argument("--workload", choices=["nacf", "arb", "train", "all"],
                    default="all",
                    help="all (default): measure every workload live so the "
                         "round's closing bench carries three FRESH "
                         "timestamps (VERDICT r3 #5); nacf: primary decode "
                         "bench only (attaches the freshest arb/train live "
                         "entries, age-marked); arb/train: that workload")
    args = ap.parse_args()
    if not _device_available():
        report_fallback(batch_size=args.batch)
    elif args.workload == "arb":
        measure_arb(batch_size=args.batch if args.batch != 8192 else 1024,
                    profile=args.profile, save_tokens=args.save_tokens)
    elif args.workload == "train":
        measure_train(batch_size=args.batch if args.batch != 8192 else 2048,
                      profile=args.profile)
    elif args.workload == "all":
        # sub-benches write their LIVE artifacts and log to stderr; the final
        # combined NACF line (which attaches them, fresh) is the ONE stdout
        # JSON line the driver records
        measure_arb(quiet=True)
        measure_train(quiet=True)
        main(batch_size=args.batch, profile=args.profile,
             ckpt=args.ckpt, tckpt=args.tckpt)
    else:
        main(batch_size=args.batch, profile=args.profile,
             ckpt=args.ckpt, tckpt=args.tckpt)
