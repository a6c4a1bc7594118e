"""Worker process for the 2-process CPU-cluster test (test_distributed.py).

Each process owns 2 virtual CPU devices; together they form a 4-device
'data' mesh with gloo cross-process collectives. Loads a host-sharded slice
of the synthetic corpus, assembles global batches, and runs jitted SPMD
train steps — the multi-host path the single-GPU reference lacks
(SURVEY.md §5 distributed backend row).

Usage: python distributed_worker.py <process_id> <num_processes> <port>
Prints one JSON line: {"process": i, "losses": [...], "shard_vids": [...]}
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax
    jax.config.update("jax_platforms", "cpu")

    from navc_tpu.parallel import initialize
    initialize("127.0.0.1:%s" % port, nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc

    import numpy as np

    from navc_tpu.config import default_config
    from navc_tpu.data.loader import BatchLoader
    from navc_tpu.data.dataset import VideoDataset
    from navc_tpu.data.synthetic import make_synthetic_corpus, make_synthetic_feats
    from navc_tpu.models import build_model, init_params
    from navc_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from navc_tpu.runtime.train_step import (TrainState, create_train_state,
                                             make_train_step)

    cfg = default_config(
        "ARB", dataset="MSVD",
        vocab_size=40, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, n_total_frames=10,
        dim_i=12, dim_m=10, modality="mi", max_len=8, batch_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        encoder_dropout=0.0, compute_dtype="float32")

    corpus, _ = make_synthetic_corpus(cfg, n_videos=10, n_caps=2, vocab_size=40)
    feats = make_synthetic_feats(cfg, n_videos=10, n_total_frames=10)
    ds = VideoDataset(cfg, "train", info_corpus=corpus, in_memory_feats=feats)
    loader = BatchLoader(ds, batch_size=2, shuffle=False,
                         num_shards=nproc, shard_id=pid)

    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)

    mesh = make_mesh({"data": 2 * nproc, "model": 1})
    sharded_params = shard_params(variables["params"], mesh)
    sharded_stats = (shard_params(variables["batch_stats"], mesh)
                     if variables.get("batch_stats") else {})
    state, tx = create_train_state(
        cfg, model, {"params": sharded_params, "batch_stats": sharded_stats})
    train_step = make_train_step(cfg, model, tx)

    losses, shard_vids = [], []
    for i, batch in enumerate(loader):
        if i >= 3:
            break
        shard_vids.append(
            ["%s:%s" % (v, c) for v, c in
             zip(batch.get("video_ids", []), batch.get("caption_ids", []))
             if v is not None])
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        device_batch = shard_batch(arrays, mesh)
        state, metrics = train_step(state, device_batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["total_loss"]))

    print(json.dumps({"process": pid, "losses": losses,
                      "shard_vids": shard_vids,
                      "n_global_devices": len(jax.devices())}))


if __name__ == "__main__":
    main()
