"""Latency + throughput sweep reproducing the reference protocol.

Reference: ``translate.py -latency`` forces batch_size=1 and reports the mean
wall-clock of translate_batch per sample (translate.py:149-151,
misc/run.py:139-143, 212-214). This script measures the flagship NACF decode
at B=1 (latency) and a batch sweep (throughput), printing a JSON summary.

    python scripts/latency.py [--batches 1 64 256 512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", nargs="+", type=int, default=[1, 64, 256, 512])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--vocab", type=int, default=10048)
    args = ap.parse_args()

    import jax

    from navc_tpu.runtime.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from navc_tpu.config import default_config
    from navc_tpu.decoding import make_nar_generator
    from navc_tpu.models import build_model, init_params
    from navc_tpu.runtime.train_step import make_encode_fn

    results = {}
    for b in args.batches:
        cfg = default_config("NACF", dataset="MSRVTT", vocab_size=args.vocab,
                             batch_size=b, use_pallas=True)
        model = build_model(cfg)
        variables = init_params(model, jax.random.PRNGKey(0), cfg)
        tcfg = default_config("ARB", dataset="MSRVTT", vocab_size=args.vocab,
                              batch_size=b)
        teacher = build_model(tcfg)
        tvars = init_params(teacher, jax.random.PRNGKey(1), tcfg)
        gen = make_nar_generator(cfg, model, teacher)

        rng = np.random.RandomState(0)
        feats = [jnp.asarray(rng.randn(b, cfg.n_frames, d).astype(np.float32))
                 for d in cfg.modality_dims]
        category = jnp.asarray(rng.randint(0, cfg.num_category, (b, 1)), np.int32)
        encode = make_encode_fn(cfg, model)
        tencode = make_encode_fn(cfg, teacher)
        enc = encode(variables["params"], variables.get("batch_stats", {}), feats)
        tenc = tencode(tvars["params"], tvars.get("batch_stats", {}), feats)

        for _ in range(3):
            np.asarray(gen(variables, enc, category, tvars, tenc, None))

        # (a) sequential wall latency — the reference protocol: dispatch,
        # execute, sync the result, repeat. Includes one full host<->device
        # round-trip per call (the tunnel's RTT + result transfer).
        t0 = time.perf_counter()
        for _ in range(args.iters):
            np.asarray(gen(variables, enc, category, tvars, tenc, None))
        wall = (time.perf_counter() - t0) / args.iters

        # (b) amortized device latency — dispatch all iters before syncing
        # any result, so per-call transport overlaps device compute and the
        # mean approaches pure device execution time.
        t0 = time.perf_counter()
        outs = [gen(variables, enc, category, tvars, tenc, None)
                for _ in range(args.iters)]
        np.asarray(outs[-1])
        device = (time.perf_counter() - t0) / args.iters

        # (c) transport round-trip: dispatch + sync a fresh trivial op each
        # iteration (an already-synced array re-reads a host-cached copy and
        # measures nothing) — host<->device turnaround with ~zero compute
        tiny = jnp.zeros((8,), jnp.float32)
        np.asarray(tiny + 0)
        t0 = time.perf_counter()
        for i in range(args.iters):
            np.asarray(tiny + (i + 1))
        rtt = (time.perf_counter() - t0) / args.iters

        results["B=%d" % b] = {
            "wall_latency_ms": round(wall * 1000, 2),
            "device_latency_ms": round(device * 1000, 2),
            "transport_rtt_ms": round(rtt * 1000, 2),
            "captions_per_sec": round(b / wall, 1),
        }

        # (d) streamed serving: the host-pipelined B=1 request path
        # (runtime/serving.py) — encode + decode dispatched per request with
        # `depth` requests in flight, so transport overlaps device compute.
        # The sequential protocol above is the depth=0 degenerate case.
        if b == 1:
            from navc_tpu.runtime.serving import StreamingCaptioner
            cap = StreamingCaptioner(cfg, model, variables,
                                     (tcfg, teacher, tvars), depth=4)
            reqs = [([np.asarray(f) for f in feats], np.asarray(category))
                    for _ in range(max(args.iters, 20))]
            list(cap.map_stream(reqs[:4]))  # warm the serving pipeline
            _, per_req = cap.timed_stream(reqs)
            results["B=1"]["streamed_ms_per_request"] = round(per_req * 1e3, 2)
            results["B=1"]["streamed_requests_per_sec"] = round(1.0 / per_req, 1)

        print("B=%4d: wall %8.2f ms  device %8.2f ms  rtt %6.2f ms  %10.1f captions/s"
              % (b, wall * 1000, device * 1000, rtt * 1000, b / wall),
              file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
