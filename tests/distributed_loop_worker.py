"""Worker for the multi-host TRAINING-LOOP test (test_distributed.py).

Runs train_network_all_multihost on the learnable synthetic corpus over a
2-process CPU cluster: SPMD epochs on all hosts, eval/checkpoint/k-best on
process 0 only.

Usage: python distributed_loop_worker.py <pid> <nproc> <port> <workdir>
Prints one JSON line: {"process": i, "train_losses": [...], "n_eval": N}
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    method = sys.argv[5] if len(sys.argv) > 5 else "ARB"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from navc_tpu.parallel import initialize
    initialize("127.0.0.1:%s" % port, nproc, pid)

    from navc_tpu.config import default_config
    from navc_tpu.data.synthetic import make_learnable_synthetic
    from navc_tpu.runtime.distributed_loop import train_network_all_multihost

    over = dict(
        vocab_size=40, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, n_total_frames=10,
        dim_i=12, dim_m=10, modality="mi", max_len=8, batch_size=8,
        epochs=2, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        encoder_dropout=0.0, compute_dtype="float32", beam_size=2,
        save_checkpoint_every=1, no_test=True,
        base_checkpoint_path=workdir)
    tp = method.endswith("_TP")
    if tp:
        method = method[:-3]
        # data=2 x model=2 over 4 global devices: TP params are sharded on
        # devices this host cannot address, so the eval-time param gather
        # must run as a collective on every host
        over["mesh_shape"] = {"data": 2, "model": 2}
    cfg = default_config(method, dataset="MSVD", **over)
    corpus, refs, feats = make_learnable_synthetic(cfg, n_videos=16, n_classes=4)

    if method == "NACF":
        # flagship mode: each host trains an identical ARB teacher locally
        # (same seed -> same weights), then the multihost NACF run exercises
        # teacher warm start + teacher-rescored primary eval
        from navc_tpu.runtime.loop import train_network_all
        tcfg = default_config("ARB", dataset="MSVD", **dict(over, epochs=1))
        tdir = os.path.join(workdir, "teacher_p%d" % pid)
        train_network_all(tcfg, workdir=tdir, info_corpus=corpus,
                          references=refs, in_memory_feats=feats,
                          verbose=False)
        cfg = cfg.replace(teacher_path=os.path.join(tdir, "best.ckpt"),
                          load_teacher_weights=True, with_teacher=True,
                          length_beam_size=2, iterations=2)

    out = train_network_all_multihost(
        cfg, workdir=os.path.join(workdir, "run_%s" % method),
        info_corpus=corpus, references=refs, in_memory_feats=feats,
        verbose=False)
    print(json.dumps({
        "process": pid,
        "train_curve": out["train_curve"],
        "n_eval": len(out["history"]),
        "ciders": [float(h["CIDEr"]) for h in out["history"]],
    }))


if __name__ == "__main__":
    main()
