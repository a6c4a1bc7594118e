"""Training-step throughput at flagship scale (captions/sec/chip).

Times the full jitted NACF train step (two-pass visual-word forward + losses
+ backward + clip + Adam + BN stats) on synthetic batches.

    python scripts/train_bench.py [--batch 256] [--iters 10]
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--vocab", type=int, default=10048)
    args = ap.parse_args()

    import jax

    from navc_tpu.runtime.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from navc_tpu import constants as C
    from navc_tpu.config import default_config
    from navc_tpu.models import build_model, init_params
    from navc_tpu.runtime.train_step import create_train_state, make_train_step

    b = args.batch
    cfg = default_config("NACF", dataset="MSRVTT", vocab_size=args.vocab,
                         batch_size=b)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(cfg, model, variables)
    step = make_train_step(cfg, model, tx)

    rng = np.random.RandomState(0)
    lengths = rng.randint(5, cfg.max_len - 1, size=b)
    tokens = np.full((b, cfg.max_len), C.PAD, np.int32)
    labels = np.full((b, cfg.max_len), C.PAD, np.int32)
    for i in range(b):
        l = lengths[i]
        tokens[i, :l] = rng.randint(6, cfg.vocab_size, size=l)
        tokens[i, : l // 2] = C.MASK
        labels[i, : l // 2] = rng.randint(6, cfg.vocab_size, size=l // 2)
    lt = rng.rand(b, cfg.max_len).astype(np.float32)
    lt /= lt.sum(-1, keepdims=True)
    batch = {
        "tokens": jnp.asarray(tokens), "labels": jnp.asarray(labels),
        "tokens_1": jnp.full((b, cfg.max_len), C.VIS, jnp.int32),
        "labels_1": jnp.asarray(np.where(rng.rand(b, cfg.max_len) < 0.3,
                                         C.MASK, labels).astype(np.int32)),
        "length_target": jnp.asarray(lt),
        "category": jnp.asarray(rng.randint(0, 20, (b, 1)).astype(np.int32)),
        "valid_mask": jnp.ones(b, jnp.float32),
    }
    for ch in cfg.modality.lower():
        batch["feats_%s" % ch] = jnp.asarray(
            rng.randn(b, cfg.n_frames, getattr(cfg, "dim_%s" % ch)).astype(np.float32))

    key = jax.random.PRNGKey(1)
    state, m = step(state, batch, key)
    float(m["total_loss"])  # force
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, batch, key)
        loss = float(m["total_loss"])  # host sync each step
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "train_step_ms": round(dt * 1000, 2),
        "captions_per_sec": round(b / dt, 1),
        "batch": b, "loss": round(loss, 3),
    }))


if __name__ == "__main__":
    main()
