"""Vocab-projection bound decomposition on the live TPU.

Decides whether an int8 serving path for `fused_project_argmax` is worth
building: the kernel is VPU-epilogue + MXU bound (docs/DESIGN.md §6), and
int8 only pays if the matmul — not the online-softmax epilogue — is the
binding resource. Measures, at flagship shapes (N rows x d=512 x V=10048):

  1. fused_project_argmax        (the production kernel)
  2. raw bf16 jnp.dot            (matmul-only bound at the same shape)
  3. raw int8 jnp.dot -> int32   (what the MXU could do at 2x rate)
  4. XLA projection + log_softmax + argmax (the unfused comparison)

Prints one JSON line per measurement. Uses bench.py's device watchdog —
refuses to run if the tunnel probe fails (never hangs a dead tunnel).

Run:  python scripts/kernel_bench.py [--rows 49152] [--iters 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, iters):
    """Time fn; sync on a 1-element slice of the last output.

    The trailing sync must NOT fetch the full output: over the axon tunnel
    (~10 MB/s) np.asarray of a (49152, 10048) f32 logits buffer measures
    ~200 s of transfer, not compute — the round-4 artifact's raw_dot_bf16
    '2964 ms' was exactly this. A 1-element slice still orders after the
    producer (in-order execution), so the wall time covers all iterations.
    """
    import jax

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:1])

    sync(fn())  # compile + warm
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=49152,
                    help="token rows N (default: B=8192 * lbs=6)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--sweep", action="store_true",
                    help="also sweep (tn, tv) tiles for argmax and the "
                         "beam top-k kernel at its production row count")
    ap.add_argument("--out", default=None,
                    help="artifact path (default KERNEL_BENCH.json; pass "
                         "e.g. KERNEL_BENCH_PRODN.json for the "
                         "production-row-count sweep)")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke test: interpret-mode kernel, tiny shapes")
    args = ap.parse_args()

    if args.interpret:
        import jax
        jax.config.update("jax_platforms", "cpu")
        args.rows = min(args.rows, 64)  # smoke the code path, not the FLOPs
        args.iters = min(args.iters, 2)
    import bench
    if not args.interpret and not bench._device_available():
        print(json.dumps({"error": "accelerator unreachable"}))
        return 1

    import jax
    import jax.numpy as jnp

    from navc_tpu.runtime.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from navc_tpu.ops.vocab_fused import fused_project_argmax

    n, d, v = args.rows, 512, 10048
    # generate ON DEVICE: at production row counts (the dense NACF argmax
    # call runs N = 49152 * 32 = 1.57M rows) host-side generation would ship
    # ~3 GB through the ~10 MB/s tunnel
    key = jax.random.PRNGKey(0)
    kh, kw, kb, kt = jax.random.split(key, 4)
    h = jax.random.normal(kh, (n, d), jnp.float32) * 0.05
    w = jax.random.normal(kw, (d, v), jnp.float32) * 0.05
    b = jax.random.normal(kb, (v,), jnp.float32) * 0.01
    hb = h.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    h8 = jnp.clip(jnp.round(h * 256), -127, 127).astype(jnp.int8)
    w8 = jnp.clip(jnp.round(w * 256), -127, 127).astype(jnp.int8)

    flops = 2.0 * n * d * v
    results = {}

    f_fused = jax.jit(lambda x: fused_project_argmax(
        x, w, bias=b, interpret=args.interpret))
    dt = timeit(lambda: f_fused(h)[1], args.iters)
    results["fused_project_argmax"] = {
        "ms": round(dt * 1e3, 3), "tflops": round(flops / dt / 1e12, 1)}

    f_bf16 = jax.jit(lambda x, y: jnp.dot(x, y,
                                          preferred_element_type=jnp.float32))
    dt = timeit(lambda: f_bf16(hb, wb), args.iters)
    results["raw_dot_bf16"] = {
        "ms": round(dt * 1e3, 3), "tflops": round(flops / dt / 1e12, 1)}

    f_i8 = jax.jit(lambda x, y: jax.lax.dot(x, y,
                                            preferred_element_type=jnp.int32))
    try:
        dt = timeit(lambda: f_i8(h8, w8), args.iters)
        results["raw_dot_int8"] = {
            "ms": round(dt * 1e3, 3), "tflops": round(flops / dt / 1e12, 1)}
    except Exception as e:  # int8 dot unsupported on this backend/version
        results["raw_dot_int8"] = {"error": str(e)[:200]}

    def xla_path(x):
        logits = jnp.dot(x.astype(jnp.bfloat16), wb,
                         preferred_element_type=jnp.float32) + b
        lp = jax.nn.log_softmax(logits, axis=-1)
        idx = jnp.argmax(lp, axis=-1)
        return jnp.take_along_axis(lp, idx[:, None], axis=1)[:, 0], idx
    f_xla = jax.jit(xla_path)
    dt = timeit(lambda: f_xla(h)[1], args.iters)
    results["xla_project_argmax"] = {
        "ms": round(dt * 1e3, 3), "tflops": round(flops / dt / 1e12, 1)}

    if args.sweep:
        # argmax tile sweep + the beam top-k kernel at its production shape
        # (N = B*beam rows at B=1024): picks the production (tn, tv)
        from navc_tpu.ops.vocab_fused import fused_project_topk
        # beyond the round-4 winner (256, 2560): wider vocab tiles amortize
        # the VPU epilogue further, and a whole-V tile (tv=10240 >= V) makes
        # the grid 1-D over rows so the W block index is constant — Mosaic's
        # revisiting-block optimization then streams W from HBM only once
        for tn, tv in ((512, 2048), (512, 2560), (256, 2560), (512, 1024),
                       (1024, 2048), (256, 5120), (128, 5120), (128, 2560),
                       (256, 10240), (128, 10240), (64, 10240)):
            f = jax.jit(lambda x, tn=tn, tv=tv: fused_project_argmax(
                x, w, bias=b, tn=tn, tv=tv, interpret=args.interpret))
            try:
                dt = timeit(lambda: f(h)[1], args.iters)
                results["argmax_tn%d_tv%d" % (tn, tv)] = {
                    "ms": round(dt * 1e3, 3),
                    "tflops": round(flops / dt / 1e12, 1)}
            except Exception as e:
                results["argmax_tn%d_tv%d" % (tn, tv)] = {"error": str(e)[:160]}
        # teacher-rescoring gather kernel: same dense shape class as argmax
        # (every canvas position of the rescoring forward), never swept —
        # production default is (512, 2048)
        from navc_tpu.ops.vocab_fused import fused_project_gather_prob
        tgt = jax.random.randint(kt, (n,), 0, v, jnp.int32)
        for tn, tv in ((512, 2048), (256, 2560), (128, 5120), (128, 10240),
                       (64, 10240)):
            f = jax.jit(lambda x, t, tn=tn, tv=tv: fused_project_gather_prob(
                x, w, t, bias=b, tn=tn, tv=tv, interpret=args.interpret))
            try:
                dt = timeit(lambda: f(h, tgt), args.iters)
                results["gatherp_tn%d_tv%d" % (tn, tv)] = {
                    "ms": round(dt * 1e3, 3),
                    "tflops": round(flops / dt / 1e12, 1)}
            except Exception as e:
                results["gatherp_tn%d_tv%d" % (tn, tv)] = {
                    "error": str(e)[:160]}
        # fused train CE (ops/vocab_ce): fwd + full VJP at the train shape
        # (B=2048 x L=30 rows). Whole-V only by design; sweep row tiles.
        from navc_tpu.ops.vocab_ce import vocab_ce_train
        n_ce = 640 if args.interpret else 61440
        h_ce = jax.random.normal(kh, (n_ce, d), jnp.float32) * 0.05
        lab_ce = jax.random.randint(kt, (n_ce,), 0, v, jnp.int32)
        fl_ce = 2.0 * n_ce * d * v
        for tn in (128, 256, 512):
            f = jax.jit(lambda x, tn=tn: vocab_ce_train(
                x, w, b, lab_ce, tn=tn, interpret=args.interpret)[0])
            fg = jax.jit(jax.grad(lambda x, tn=tn: vocab_ce_train(
                x, w, b, lab_ce, tn=tn, interpret=args.interpret)[0].sum()))
            for name, fn, mult in (("fwd", lambda f=f: f(h_ce), 1.0),
                                   ("vjp", lambda fg=fg: fg(h_ce), 4.0)):
                try:
                    dt = timeit(fn, args.iters)
                    results["ce_%s_tn%d" % (name, tn)] = {
                        "ms": round(dt * 1e3, 3),
                        "tflops": round(mult * fl_ce / dt / 1e12, 1)}
                except Exception as e:
                    results["ce_%s_tn%d" % (name, tn)] = {
                        "error": str(e)[:160]}
        n5 = min(5120, n)
        h5 = h[:n5]
        fl5 = 2.0 * n5 * d * v
        for tn, tv in ((512, 2048), (512, 1024), (512, 512), (256, 2048),
                       (256, 2560), (128, 2560), (128, 5120)):
            f = jax.jit(lambda x, tn=tn, tv=tv: fused_project_topk(
                x, w, 5, bias=b, tn=tn, tv=tv, interpret=args.interpret))
            try:
                dt = timeit(lambda: f(h5)[1], args.iters)
                results["topk5_n%d_tn%d_tv%d" % (n5, tn, tv)] = {
                    "ms": round(dt * 1e3, 3),
                    "tflops": round(fl5 / dt / 1e12, 1)}
            except Exception as e:
                results["topk5_n%d_tn%d_tv%d" % (n5, tn, tv)] = {
                    "error": str(e)[:160]}

    # artifact hygiene (VERDICT r4 #7): failed configs move to a `rejected`
    # section with one-line reasons so a standalone reader never mistakes a
    # crash dump for a measurement, and the production-selected tiles are
    # marked explicitly.
    rejected = {}
    for name in [k for k, r in results.items() if "error" in r]:
        err = results.pop(name)["error"]
        if "vmem" in err.lower():
            reason = "Mosaic vmem OOM at this tile"
        elif "HTTP 500" in err or "remote_compile" in err:
            reason = "remote-compile crash (tile exceeds Mosaic limits)"
        else:
            reason = err.splitlines()[0][:120]
        rejected[name] = reason
    out = {"rows": n, "d": d, "v": v,
           "device": jax.devices()[0].device_kind,
           "selected_tiles": {"argmax": "tn128_tv10240 whole-V (production "
                                        "default, ops/vocab_fused.py:79)",
                              "topk5": "tn512_tv2048 (production default, "
                                       "ops/vocab_fused.py:316)",
                              "gather_prob": "tn128_tv10240 whole-V "
                                             "(production default, "
                                             "ops/vocab_fused.py:193)",
                              "ce": "tn256 whole-V (production default, "
                                    "ops/vocab_ce.py)"},
           **results}
    if rejected:
        out["rejected"] = rejected
    print(json.dumps(out))
    if not args.interpret:  # CPU smoke numbers must not shadow a live capture
        path = args.out or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "KERNEL_BENCH.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
            f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
