"""NAB convergence-gap bisection (round-2 verdict item #3).

PARITY_TRAINING.json shows NAB's 30-epoch CIDEr best_mean at 8.14 (navc) vs
9.41 (reference) while ARB/NACF track closely. This experiment removes the
two uncontrolled variables — initialization and the batch/masking stream —
by training BOTH stacks from the SAME initial weights on the SAME captured
batches, recording the per-step training loss:

  * phase A: build the learnable synthetic fixture, construct the reference
    NAB model (torch seed), capture E epochs of batches from the reference
    dataloader (its beta-mask RNG stream included);
  * phase B: drive the reference's own step semantics (crit.get_loss ->
    backward -> clip_grad_value_ -> ScheduledOptim step) on those batches;
  * phase C: convert the initial weights (runtime.torch_convert) and train
    navc's jitted train_step on the converted batches with the mirrored
    LrSchedule;
  * phase D: report max/mean per-step |loss delta|.

If the trajectories track, the residual NAB gap is attributable to the
stacks' *independent random streams* (init + mask sampling) at toy scale,
not to a loss/optimizer/model defect. If they diverge, the first diverging
step localizes the defect.

    python scripts/nab_bisect.py [--epochs 5] [--out NAB_BISECT.json]
"""

import argparse
import json
import os
import random
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
REFERENCE = "/root/reference"
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

from parity_training import build_cfg, dump_reference_files, opt_from_cfg  # noqa: E402


def capture_reference(cfg, paths, epochs):
    """Build the reference model + capture its batches; then train its own
    loop on exactly those batches, recording per-step losses AND, after each
    epoch, the reference stack's own NAR decode of the validate split
    (v2: metric trajectory, not just loss trajectory)."""
    cwd = os.getcwd()
    os.chdir(REFERENCE)
    sys.path.insert(0, REFERENCE)
    try:
        import torch
        from torch.nn.utils import clip_grad_value_
        from decoding import generate as ref_generate
        from misc.crit import get_criterion
        from misc.optim import get_optimizer
        from misc.run import get_forword_results, get_loader
        from models import get_model

        opt = opt_from_cfg(cfg, paths)
        torch.manual_seed(cfg.seed)
        np.random.seed(cfg.seed)
        random.seed(cfg.seed)

        model = get_model(opt)
        init_state = {k: v.detach().clone() for k, v in model.state_dict().items()}
        crit = get_criterion(opt)
        optimizer = get_optimizer(opt, model)
        loader = get_loader(opt, "train")
        vocab = loader.dataset.get_vocab()
        val_loader = get_loader(opt, "validate")

        # capture the batch stream (the loader's beta-mask RNG included)
        all_batches = []
        for _ in range(epochs):
            loader.dataset.shuffle()
            epoch_batches = []
            for data in loader:
                epoch_batches.append({
                    k: (v.numpy().copy() if hasattr(v, "numpy") else v)
                    for k, v in data.items()})
            all_batches.append(epoch_batches)

        def to_torch(b):
            return {k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
                    for k, v in b.items()}

        from navc_tpu.runtime.sentence import to_sentence

        def decode_validate():
            """The reference stack's own mask-predict decode (teacher-free
            protocol: both stacks decode with masking/candidate decisions
            off so the trajectory isolates model+optimizer+decode)."""
            model.eval()
            hyps = {}
            with torch.no_grad():
                for data in val_loader:
                    enc, category, _ = get_forword_results(
                        opt, model, data, device="cpu", only_data=True,
                        vocab=vocab)
                    hyp, _ = ref_generate(
                        opt=opt, model=model, teacher_model=None,
                        encoder_outputs=enc, teacher_encoder_outputs=None,
                        category=category,
                        tgt_tokens=torch.zeros(
                            category.shape[0], opt["max_len"],
                            dtype=torch.long),
                        tgt_vocab=vocab, dict_mapping={}, length_bias=0)
                    vids = np.array(data["video_ids"]).reshape(-1)
                    for k, row in enumerate(hyp.numpy()):
                        hyps[vids[k]] = to_sentence(row.tolist(), vocab)
            model.train()
            return hyps

        model.train()
        crit.reset_loss_recorder()  # run_train does this; required state init
        losses = []
        epoch_hyps = []
        for epoch_batches in all_batches:
            for data in epoch_batches:
                optimizer.zero_grad()
                results = get_forword_results(
                    opt, model, to_torch(data), device="cpu", only_data=False,
                    vocab=vocab)
                loss = crit.get_loss(results)
                losses.append(float(loss.detach()))
                loss.backward()
                clip_grad_value_(model.parameters(), opt["grad_clip"])
                optimizer.step()
            optimizer.epoch_update_learning_rate()
            epoch_hyps.append(decode_validate())
        return init_state, all_batches, losses, epoch_hyps
    finally:
        os.chdir(cwd)


def train_navc(cfg, init_state, all_batches, corpus, refs, feats):
    """navc train_step on the converted init weights + captured batches,
    with the same per-epoch validate decode as the reference run (v2)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from navc_tpu.data.loader import get_loader
    from navc_tpu.models import build_model
    from navc_tpu.runtime.evaluate import Evaluator
    from navc_tpu.runtime.optim import LrSchedule
    from navc_tpu.runtime.sentence import to_sentence
    from navc_tpu.runtime.torch_convert import convert_state_dict
    from navc_tpu.runtime.train_step import create_train_state, make_train_step

    model = build_model(cfg)
    variables = convert_state_dict(init_state, tie_weights=cfg.tie_weights)
    state, tx = create_train_state(cfg, model, variables)
    step = make_train_step(cfg, model, tx)
    sched = LrSchedule.from_config(cfg)

    val_loader = get_loader(cfg, mode="validate", info_corpus=corpus,
                            in_memory_feats=feats)
    vocab = val_loader.dataset.get_vocab()
    evaluator = Evaluator(cfg, model, None, None, None)

    def decode_validate(st):
        variables = {"params": st.params, "batch_stats": st.batch_stats}
        hyps = {}
        for batch in val_loader:
            hyp, _, _, _, _ = evaluator.decode_batch(variables, batch, None)
            for k, row in enumerate(np.asarray(hyp)):
                hyps[batch["video_ids"][k]] = to_sentence(row.tolist(), vocab)
        return hyps

    needed = ["tokens", "labels", "length_target", "category"]
    if cfg.visual_word_generation:
        needed += ["tokens_1", "labels_1"]

    losses = []
    epoch_hyps = []
    key = jax.random.PRNGKey(0)  # dropout is 0 in this protocol
    for epoch_batches in all_batches:
        for data in epoch_batches:
            batch = {k: np.asarray(data[k]) for k in needed if k in data}
            for ch in cfg.modality.lower():
                batch["feats_%s" % ch] = np.asarray(data["feats_%s" % ch],
                                                    np.float32)
            batch["valid_mask"] = np.ones(batch["tokens"].shape[0], np.float32)
            state.opt_state.hyperparams["learning_rate"] = sched.step_lr()
            state, metrics = step(state, batch, key)
            losses.append(float(metrics["total_loss"]))
        sched.epoch_update()
        epoch_hyps.append(decode_validate(state))
    return losses, epoch_hyps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(ROOT, "NAB_BISECT.json"))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import tempfile
    workdir = tempfile.mkdtemp(prefix="nab_bisect_")
    cfg = build_cfg("NAB", args.epochs, workdir).replace(seed=args.seed)

    from navc_tpu.data.synthetic import make_learnable_synthetic
    corpus, refs, feats = make_learnable_synthetic(cfg, seed=123)
    paths = dump_reference_files(cfg, corpus, refs, feats,
                                 os.path.join(workdir, "data"))

    init_state, all_batches, ref_losses, ref_hyps = capture_reference(
        cfg, paths, args.epochs)
    navc_losses, navc_hyps = train_navc(cfg, init_state, all_batches,
                                        corpus, refs, feats)

    # v2: per-epoch METRIC tracks — each stack's own validate decode from
    # the shared trajectory, scored with ONE scorer (ours) against the same
    # references, so the tracks isolate model+optimizer+decode
    from navc_tpu.metrics.scorer import COCOScorer
    scorer = COCOScorer(verbose=False) if "verbose" in \
        COCOScorer.__init__.__code__.co_varnames else COCOScorer()
    val_vids = sorted(ref_hyps[0])
    gts = {v: refs[v] for v in val_vids}

    def score_track(epoch_hyps):
        track = []
        for hyps in epoch_hyps:
            res = {v: [{"image_id": v, "caption": hyps[v]}] for v in val_vids}
            summary, _ = scorer.score(gts, res, val_vids)
            track.append({k: float(summary[k])
                          for k in ("Bleu_4", "METEOR", "ROUGE_L", "CIDEr")})
        return track

    ref_track = score_track(ref_hyps)
    navc_track = score_track(navc_hyps)
    cider_deltas = [abs(a["CIDEr"] - b["CIDEr"])
                    for a, b in zip(ref_track, navc_track)]
    token_agree = [float(np.mean([ref_hyps[e][v] == navc_hyps[e][v]
                                  for v in val_vids]))
                   for e in range(len(ref_hyps))]

    assert len(ref_losses) == len(navc_losses)
    deltas = [abs(a - b) for a, b in zip(ref_losses, navc_losses)]
    rel = [d / max(abs(a), 1e-6) for d, a in zip(deltas, ref_losses)]
    report = {
        "protocol": ("identical initial weights (reference torch init, "
                     "converted leaf-by-leaf) + identical batches (captured "
                     "from the reference dataloader incl. its beta-mask RNG); "
                     "per-step train loss AND per-epoch validate decode + "
                     "metrics in both stacks (teacher-free NAR decode, one "
                     "shared scorer)"),
        "epochs": args.epochs,
        "steps": len(ref_losses),
        "max_abs_delta": max(deltas),
        "mean_abs_delta": sum(deltas) / len(deltas),
        "max_rel_delta": max(rel),
        "first_step_loss": {"reference": ref_losses[0], "navc": navc_losses[0]},
        "last_step_loss": {"reference": ref_losses[-1], "navc": navc_losses[-1]},
        "metric_track": {
            "reference": ref_track,
            "navc": navc_track,
            "max_cider_delta": max(cider_deltas),
            "per_epoch_caption_agreement": token_agree,
        },
        "reference_losses": [round(x, 6) for x in ref_losses],
        "navc_losses": [round(x, 6) for x in navc_losses],
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    summary = {k: report[k] for k in
               ("steps", "max_abs_delta", "mean_abs_delta",
                "max_rel_delta", "first_step_loss", "last_step_loss")}
    summary["max_cider_delta"] = report["metric_track"]["max_cider_delta"]
    summary["caption_agreement"] = \
        report["metric_track"]["per_epoch_caption_agreement"]
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
