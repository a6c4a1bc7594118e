"""Training entry point (reference train.py).

Usage (mirrors README.md:150-162 of the reference):
    python -m navc_tpu.cli.train --default --dataset MSRVTT --method NACF \
        --base_data_path /path/to/VC_data --base_checkpoint_path ./experiments
"""

from __future__ import annotations

import json
import os
import pickle
import random

from ..config import resolve_data_paths, where_to_save_model
from ..runtime.loop import train_network_all
from .opts import parse_config


def main(argv=None):
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    # --distributed: join/form a jax.distributed cluster (multi-host pods use
    # auto-detection; explicit clusters via NAVC_COORDINATOR/NAVC_NUM_PROCESSES/
    # NAVC_PROCESS_ID). Must run before any other JAX API.
    distributed = "--distributed" in argv
    if distributed:
        argv.remove("--distributed")
        from ..parallel import initialize
        initialize()
    # --resume: restore params/optimizer/lr/k-best state from the rolling
    # checkpoint.ckpt in the run directory (capability beyond the reference,
    # which saves no optimizer state — misc/run.py:315-318)
    resume = "--resume" in argv
    if resume:
        argv.remove("--resume")

    from ..runtime.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    cfg = parse_config(argv)
    if cfg.seed == -1:
        cfg = cfg.replace(seed=random.randint(1, 65534))

    cfg = resolve_data_paths(cfg)
    workdir = where_to_save_model(cfg)
    os.makedirs(workdir, exist_ok=True)
    cfg = cfg.replace(checkpoint_path=workdir)

    # vocab size from the corpus, before model construction (train.py:73)
    with open(cfg.info_corpus, "rb") as f:
        info_corpus = pickle.load(f)
    cfg = cfg.replace(vocab_size=len(info_corpus["info"]["itow"]))

    with open(os.path.join(workdir, "opt_info.json"), "w") as f:
        json.dump(cfg.to_dict(), f)
    print("save opt details to %s" % os.path.join(workdir, "opt_info.json"))
    print("| method %s | vocab_size %d | modality %s | max_len %d | seed %d"
          % (cfg.method, cfg.vocab_size, cfg.modality, cfg.max_len, cfg.seed))

    # warm start from a full pretrained checkpoint (reference train.py:85-87)
    # is handled inside train_network_all via cfg.pretrained_path
    loop_fn = train_network_all
    loop_kw = dict(workdir=workdir, info_corpus=info_corpus)
    if distributed:
        import jax
        if jax.process_count() > 1:
            from ..runtime.distributed_loop import train_network_all_multihost
            loop_fn = train_network_all_multihost
    if loop_fn is train_network_all:
        loop_kw["resume"] = resume
    elif resume:
        raise NotImplementedError(
            "--resume is single-host only (the multi-host rolling checkpoint "
            "stores no optimizer state)")
    out = loop_fn(cfg, **loop_kw)
    if "test_res" in out:
        print({k: v for k, v in out["test_res"].items()})
    return out


if __name__ == "__main__":
    main()
