"""Multi-host training: 2-process CPU cluster with gloo collectives.

The reference is single-process only (SURVEY.md §5); this validates the
TPU-native multi-host path end-to-end: jax.distributed.initialize, per-host
data sharding in the loader, global-array batch assembly, and SPMD train
steps whose numerics match a single-process run on the concatenated batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def worker_results():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, "worker failed:\n%s\n%s" % (out, err)
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return sorted(outs, key=lambda o: o["process"])


def test_two_process_cluster_runs(worker_results):
    r0, r1 = worker_results
    assert r0["n_global_devices"] == 4 and r1["n_global_devices"] == 4
    assert len(r0["losses"]) == 3
    assert all(np.isfinite(l) for l in r0["losses"])


def test_losses_identical_across_processes(worker_results):
    # SPMD: every host computes the same global loss
    r0, r1 = worker_results
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)


def test_host_shards_are_disjoint(worker_results):
    # 12 train items / 2 shards: strided split covers everything exactly once
    r0, r1 = worker_results
    v0 = [v for b in r0["shard_vids"] for v in b]
    v1 = [v for b in r1["shard_vids"] for v in b]
    assert len(v0) == len(v1) == 6
    assert set(v0).isdisjoint(set(v1))


def test_matches_single_process_numerics(worker_results):
    """The 2-process global batch == single-process concat(host0, host1)."""
    import jax

    from navc_tpu.config import default_config
    from navc_tpu.data.dataset import VideoDataset
    from navc_tpu.data.loader import BatchLoader
    from navc_tpu.data.synthetic import make_synthetic_corpus, make_synthetic_feats
    from navc_tpu.models import build_model, init_params
    from navc_tpu.runtime.train_step import create_train_state, make_train_step

    cfg = default_config(
        "ARB", dataset="MSVD",
        vocab_size=40, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, n_total_frames=10,
        dim_i=12, dim_m=10, modality="mi", max_len=8, batch_size=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        encoder_dropout=0.0, compute_dtype="float32")
    corpus, _ = make_synthetic_corpus(cfg, n_videos=10, n_caps=2, vocab_size=40)
    feats = make_synthetic_feats(cfg, n_videos=10, n_total_frames=10)

    # rebuild each global batch exactly as make_array_from_process_local_data
    # lays it out: host0 rows then host1 rows. Each shard gets its OWN
    # dataset instance — per-item randomness (frame sampling) must consume a
    # per-process RNG stream exactly as in the worker processes.
    shard_loaders = [
        BatchLoader(
            VideoDataset(cfg, "train", info_corpus=corpus, in_memory_feats=feats),
            batch_size=2, shuffle=False, num_shards=2, shard_id=i)
        for i in range(2)]
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(cfg, model, variables)
    train_step = make_train_step(cfg, model, tx)

    losses = []
    for step, (b0, b1) in enumerate(zip(*shard_loaders)):
        if step >= 3:
            break
        batch = {k: np.concatenate([b0[k], b1[k]])
                 for k in b0 if isinstance(b0[k], np.ndarray)}
        state, metrics = train_step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["total_loss"]))

    r0 = worker_results[0]
    np.testing.assert_allclose(losses, r0["losses"], rtol=2e-4)


def test_multihost_training_loop():
    """train_network_all_multihost over a real 2-process cluster: SPMD
    epochs in lockstep (identical global train losses on both hosts),
    eval/checkpoint/k-best on process 0 only."""
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix="navc_mhloop_")
    try:
        port = _free_port()
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        procs = [subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_loop_worker.py"),
             str(i), "2", str(port), workdir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
            for i in range(2)]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, "worker failed:\n%s\n%s" % (out, err)
            outs.append(json.loads(out.strip().splitlines()[-1]))
        outs.sort(key=lambda o: o["process"])
        r0, r1 = outs
        np.testing.assert_allclose(r0["train_curve"], r1["train_curve"],
                                   rtol=1e-6)
        assert len(r0["train_curve"]) == 2
        assert r0["n_eval"] == 2 and r1["n_eval"] == 0  # primary-only eval
        run = os.path.join(workdir, "run_ARB")
        assert os.path.exists(os.path.join(run, "best.ckpt"))
        assert os.path.exists(os.path.join(run, "trainning_record.csv"))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_multihost_nacf_with_teacher():
    """Flagship NACF over 2 hosts: teacher warm start + teacher-rescored
    primary-only eval (the single-host loop's semantics, reference
    run.py:273-291) — the collective param gather must run on every host."""
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix="navc_mhnacf_")
    try:
        port = _free_port()
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        procs = [subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_loop_worker.py"),
             str(i), "2", str(port), workdir, "NACF"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
            for i in range(2)]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=900)
            assert p.returncode == 0, "worker failed:\n%s\n%s" % (out, err)
            outs.append(json.loads(out.strip().splitlines()[-1]))
        outs.sort(key=lambda o: o["process"])
        r0, r1 = outs
        np.testing.assert_allclose(r0["train_curve"], r1["train_curve"],
                                   rtol=1e-6)
        assert r0["n_eval"] == 2 and r1["n_eval"] == 0
        assert all(np.isfinite(c) for c in r0["ciders"])
        run = os.path.join(workdir, "run_NACF")
        assert os.path.exists(os.path.join(run, "best.ckpt"))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_epoch_permutations_stay_lockstep_across_hosts():
    """Per-item draws consume dataset.random host-differently; epoch-2
    permutations must still be identical on every host (structure RNG)."""
    from navc_tpu.config import default_config
    from navc_tpu.data.dataset import VideoDataset
    from navc_tpu.data.loader import BatchLoader
    from navc_tpu.data.synthetic import make_synthetic_corpus, make_synthetic_feats

    cfg = default_config(
        "NAB", dataset="MSVD",  # NAR: MLM masking draws per item
        vocab_size=40, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, n_total_frames=10,
        dim_i=12, dim_m=10, modality="mi", max_len=8, batch_size=2)
    cfg = cfg.replace(teacher_path="", load_teacher_weights=False,
                      with_teacher=False)
    corpus, _ = make_synthetic_corpus(cfg, n_videos=10, n_caps=3, vocab_size=40)
    feats = make_synthetic_feats(cfg, n_videos=10, n_total_frames=10)

    # one dataset instance per simulated host
    loaders = []
    for shard in range(2):
        ds = VideoDataset(cfg, "train", info_corpus=corpus,
                          in_memory_feats=feats)
        ds.host_lockstep = True
        loaders.append(BatchLoader(ds, batch_size=2, shuffle=True,
                                   num_shards=2, shard_id=shard))

    # epoch 1: each host consumes ONLY its shard (different per-item draw
    # counts advance ds.random differently)
    for ld in loaders:
        for _ in ld:
            pass
    for ld in loaders:
        ld.dataset.shuffle()

    # epoch 2: both hosts must derive the same permutation -> the strided
    # shards still partition one epoch disjointly
    o0, o1 = loaders[0]._order(), loaders[1]._order()
    assert set(o0.tolist()).isdisjoint(set(o1.tolist()))
    assert sorted(np.concatenate([o0, o1]).tolist()) == \
        list(range(len(loaders[0].dataset)))


def test_multihost_tensor_parallel_eval_gather():
    """data=2 x model=2 mesh: TP-sharded params are not fully addressable on
    any single host, so the eval-time gather must run as a collective on
    every process (regression for the primary-only deadlock)."""
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix="navc_mhtp_")
    try:
        port = _free_port()
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        procs = [subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_loop_worker.py"),
             str(i), "2", str(port), workdir, "ARB_TP"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
            for i in range(2)]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, "worker failed:\n%s\n%s" % (out, err)
            outs.append(json.loads(out.strip().splitlines()[-1]))
        outs.sort(key=lambda o: o["process"])
        r0, r1 = outs
        np.testing.assert_allclose(r0["train_curve"], r1["train_curve"],
                                   rtol=1e-6)
        assert r0["n_eval"] == 2 and all(np.isfinite(c) for c in r0["ciders"])
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
