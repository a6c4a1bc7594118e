"""Multi-host training orchestration.

``train_network_all_multihost`` is the jax.distributed counterpart of
``loop.train_network_all`` (reference misc/run.py:272-359 has no distributed
mode at all — SURVEY.md §5): every host runs the same SPMD program over a
global ('data', 'model') mesh; each host loads only its shard of every epoch
(wrap-padded strided split, so step counts stay in lockstep); evaluation,
checkpointing, CSV logging, and the k-best queue run on process 0 only, with
the early-stop decision broadcast so all hosts leave the epoch loop together.

Call ``navc_tpu.parallel.initialize(...)`` (or let a TPU pod auto-detect)
before any other JAX API, then call this exactly like train_network_all.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.experimental import multihost_utils

from ..config import Config
from ..data.loader import get_loader
from ..models import build_model, init_params
from ..parallel import distributed as dist
from ..parallel.mesh import make_mesh, shard_batch, shard_params
from .checkpoint import save_checkpoint
from .evaluate import Evaluator, run_eval
from .logger import CsvLogger, KBestQueue
from .loop import METRIC_FIELDS, run_train_epoch
from .optim import LrSchedule
from .train_step import TrainState, create_train_state, make_train_step


def _host_local_params(params):
    """Materialize global param arrays on this host (replicated arrays are
    already addressable; TP-sharded leaves gather across processes)."""
    def pull(x):
        if getattr(x, "is_fully_addressable", True):
            return np.asarray(jax.device_get(x))
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return jax.tree_util.tree_map(pull, params)


def train_network_all_multihost(cfg: Config, workdir: Optional[str] = None,
                                info_corpus=None, references=None,
                                in_memory_feats=None,
                                verbose: bool = True) -> Dict[str, Any]:
    """Multi-host end-to-end training. Returns the same dict as
    train_network_all on process 0; worker processes return
    {'state': ..., 'history': []}."""
    nproc = jax.process_count()
    primary = dist.is_primary()
    workdir = workdir or cfg.checkpoint_path or "./experiments/run"
    if primary:
        os.makedirs(workdir, exist_ok=True)
    cfg = cfg.replace(checkpoint_path=workdir)

    assert cfg.batch_size % nproc == 0, \
        "global batch %d must divide across %d hosts" % (cfg.batch_size, nproc)
    mesh_shape = dict(cfg.mesh_shape) if cfg.mesh_shape else \
        {"data": len(jax.devices()), "model": 1}
    mesh = make_mesh(mesh_shape)

    model = build_model(cfg)
    # identical seed on every host -> identical initial params
    variables = init_params(model, jax.random.PRNGKey(cfg.seed), cfg)

    # warm starts, exactly as the single-host loop (loop.py / reference
    # run.py:274-291): full pretrained load, then teacher-weight init with
    # the decoder.bert. key remap. Host-side numpy on every host -> the
    # sharded trees stay identical across processes.
    if cfg.pretrained_path and os.path.exists(cfg.pretrained_path):
        from .checkpoint import load_checkpoint
        pre = load_checkpoint(cfg.pretrained_path)
        variables = {"params": pre["params"]}
        if pre.get("batch_stats"):
            variables["batch_stats"] = pre["batch_stats"]
    teacher_model, teacher_variables, teacher_cfg = None, None, None
    if cfg.load_teacher_weights and cfg.teacher_path:
        if not os.path.exists(cfg.teacher_path):
            raise FileNotFoundError(
                "teacher_path not found: %s" % cfg.teacher_path)
        from .checkpoint import load_satisfied_weights
        variables = load_satisfied_weights(variables, cfg.teacher_path,
                                           verbose=verbose and primary)
    if cfg.with_teacher and cfg.method in ("NAB", "NACF") and cfg.teacher_path:
        if not os.path.exists(cfg.teacher_path):
            raise FileNotFoundError(
                "teacher_path not found: %s" % cfg.teacher_path)
        from .checkpoint import load_model_and_config
        teacher_model, teacher_variables, teacher_cfg, _ = \
            load_model_and_config(cfg.teacher_path)

    sharded = {"params": shard_params(variables["params"], mesh)}
    if variables.get("batch_stats"):
        sharded["batch_stats"] = shard_params(variables["batch_stats"], mesh)
    state, tx = create_train_state(cfg, model, sharded)
    train_step = make_train_step(cfg, model, tx)
    lr_schedule = LrSchedule.from_config(cfg)

    loader_kw = dict(info_corpus=info_corpus, in_memory_feats=in_memory_feats)
    train_loader = get_loader(cfg, "train", host_shard=True,
                              batch_size=cfg.batch_size // nproc, **loader_kw)
    # evaluation runs on process 0 only, over the FULL split on its local
    # devices — no collectives, so the other hosts just wait at the barrier
    vali_loader = get_loader(cfg, "validate", **loader_kw) if primary else None
    if primary and references is not None:
        vali_loader.dataset.set_references(references)
    vocab = (vali_loader.dataset.get_vocab() if primary else None)

    logger = CsvLogger(filepath=workdir, filename="trainning_record.csv",
                       fieldsnames=["epoch", "train_loss"] + METRIC_FIELDS) \
        if primary else None
    best_model = KBestQueue(k_best_model=cfg.k_best_model,
                            folder_path=os.path.join(workdir, "tmp_models"),
                            standard=cfg.standard) if primary else None
    evaluator = Evaluator(cfg, model, teacher_cfg, teacher_model) \
        if primary else None

    rng_key = jax.random.PRNGKey(cfg.seed + 1)
    put_fn = lambda batch: shard_batch(batch, mesh)  # noqa: E731

    history = []
    train_curve = []  # per-epoch global train loss — identical on every host
    for epoch in range(cfg.epochs):
        train_loader.dataset.shuffle()  # same dataset RNG on every host
        state, train_info, rng_key = run_train_epoch(
            cfg, train_step, state, train_loader, lr_schedule, rng_key,
            logger if (primary and verbose) else None, epoch, put_fn=put_fn)
        lr_schedule.epoch_update()
        train_curve.append(float(train_info.get("total_loss", 0.0)))

        keep = True
        if (epoch + 1) > cfg.start_eval_epoch and \
                (epoch + 1) % cfg.save_checkpoint_every == 0:
            # _host_local_params may allgather TP-sharded leaves — that is a
            # COLLECTIVE, so every host must execute it, not just process 0
            local_params = _host_local_params(state.params)
            local_stats = (_host_local_params(state.batch_stats)
                           if state.batch_stats else {})
            if primary:
                # device_put once: numpy trees fed to a jitted decode
                # re-upload the full parameter set EVERY batch (measured
                # 4.4x decode slowdown, checkpoint.py:53-57)
                eval_vars = jax.device_put(
                    {"params": local_params, "batch_stats": local_stats})
                res = run_eval(cfg, evaluator, eval_vars, vali_loader, vocab,
                               teacher_variables=teacher_variables,
                               analyze=True)
                res["train_loss"] = train_info.get("total_loss", 0.0)
                res["epoch"] = epoch
                history.append(res)
                logger.write(res)
                ckpt = {
                    "epoch": epoch + 1,
                    "params": local_params,
                    "batch_stats": local_stats,
                    "opt_state": None,
                    "lr_schedule": {"learning_rate": lr_schedule.get_lr(),
                                    "n_current_steps": lr_schedule.n_current_steps},
                    "validate_result": res,
                    "settings": cfg,
                }
                save_checkpoint(ckpt, workdir, "checkpoint.ckpt")

                def _save_best(dst, _ckpt=ckpt):
                    save_checkpoint(_ckpt, os.path.dirname(dst),
                                    os.path.basename(dst))

                keep, info = best_model.check(res, workdir, cfg.tolerence,
                                              _save_best)
                if verbose:
                    logger.write_text(str(info))
            # every host must take the same branch out of the epoch loop
            keep = bool(multihost_utils.broadcast_one_to_all(
                np.asarray(keep, np.int32)))
            if not keep:
                break
        multihost_utils.sync_global_devices("navc_epoch_%d" % epoch)

    out: Dict[str, Any] = {"state": state, "history": history,
                           "train_curve": train_curve}
    if primary and history:
        out["best_res"] = best_model.best_res

    if not cfg.no_test:
        # final test evaluation (reference run.py:349-356); collective
        # gather first, then primary-local decode like the epoch evals
        local_params = _host_local_params(state.params)
        local_stats = (_host_local_params(state.batch_stats)
                       if state.batch_stats else {})
        if primary:
            from .checkpoint import load_model_and_config
            test_loader = get_loader(cfg, "test", **loader_kw)
            if references is not None:
                test_loader.dataset.set_references(references)
            best_path = os.path.join(workdir, "best.ckpt")
            if not os.path.exists(best_path) and cfg.k_best_model > 1:
                # k>1 keeps models under tmp_models/ and never writes
                # best.ckpt (see loop.py final-test note)
                best_path = best_model.best_entry_path() or best_path
            if best_path and os.path.exists(best_path):
                bmodel, bvars, bcfg, _ = load_model_and_config(best_path)
                bevaluator = Evaluator(bcfg, bmodel, teacher_cfg, teacher_model)
            else:
                bvars = jax.device_put(
                    {"params": local_params, "batch_stats": local_stats})
                bevaluator = evaluator
            out["test_res"] = run_eval(cfg, bevaluator, bvars, test_loader,
                                       vocab, teacher_variables=teacher_variables,
                                       analyze=True)
        multihost_utils.sync_global_devices("navc_final_test")
    return out
