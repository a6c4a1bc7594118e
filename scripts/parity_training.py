"""Training-trajectory parity: reference torch stack vs navc_tpu.

No MSVD/MSR-VTT features exist in this environment, so this is the strongest
available end-to-end quality check (VERDICT round-1 item 5): train BOTH
stacks on the SAME learnable synthetic corpus — the reference through its own
dataloader/criterion/optimizer/run_train/run_eval (misc/run.py:99-246,
249-269) reading byte-compatible info_corpus.pkl/refs.pkl/HDF5 files, ours
through train_network_all — and compare per-epoch CIDEr/BLEU-4 measured by
the SAME scorer (navc_tpu.metrics.COCOScorer, drop-in for the reference
run_eval ``scorer=`` parameter).

    python scripts/parity_training.py [--epochs 12] [--method ARB]

Writes PARITY_TRAINING.json at the repo root.
"""

import argparse
import json
import os
import random
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)


def build_cfg(method: str, epochs: int, workdir: str,
              navc_teacher_path: str = ""):
    from navc_tpu.config import default_config

    cfg = default_config(
        method, dataset="MSVD",
        vocab_size=40, dim_hidden=32, num_attention_heads=2,
        intermediate_size=64, n_frames=4, n_total_frames=10,
        dim_i=12, dim_m=10, modality="mi", max_len=10, batch_size=8,
        epochs=epochs, hidden_dropout_prob=0.0, encoder_dropout=0.0,
        attention_probs_dropout_prob=0.0,
        compute_dtype="float32", beam_size=2, save_checkpoint_every=1,
        learning_rate=2e-3, minimum_learning_rate=5e-4,
        base_checkpoint_path=workdir, no_test=True, tolerence=1000)
    if method in ("NAB", "NACF"):
        if navc_teacher_path:
            # flagship pipeline: teacher warm start + rescoring
            # (reference misc/run.py:273-291)
            cfg = cfg.replace(teacher_path=navc_teacher_path,
                              load_teacher_weights=True, with_teacher=True,
                              length_beam_size=3, iterations=3)
        else:
            cfg = cfg.replace(teacher_path="", load_teacher_weights=False,
                              with_teacher=False, length_beam_size=3,
                              iterations=3)
    return cfg


def dump_reference_files(cfg, corpus, refs, feats, outdir: str):
    """Write the synthetic fixture in the reference's on-disk formats
    (info_corpus.pkl / refs.pkl per prepare_corpora.py:53-65; one HDF5 per
    modality keyed by vid, as pretreatment/extract_*.py produce)."""
    import pickle

    import h5py

    os.makedirs(outdir, exist_ok=True)
    paths = {}
    paths["info_corpus"] = os.path.join(outdir, "info_corpus.pkl")
    with open(paths["info_corpus"], "wb") as f:
        pickle.dump(corpus, f)
    paths["reference"] = os.path.join(outdir, "refs.pkl")
    with open(paths["reference"], "wb") as f:
        pickle.dump(refs, f)
    for key, table in feats.items():  # e.g. "feats_m" -> {vid: (T, D)}
        p = os.path.join(outdir, key + ".hdf5")
        with h5py.File(p, "w") as h5:
            for vid, arr in table.items():
                h5[vid] = np.asarray(arr, np.float32)
        paths[key] = [p]
    return paths


def opt_from_cfg(cfg, paths):
    """Reference opt dict mirroring cfg exactly (same hyperparams/arch)."""
    opt = cfg.to_dict()
    opt.update(paths)
    opt["crit_key"] = cfg.crit_key
    opt["dataset"] = "Youtube2Text"
    opt["collect_best_candidate_iterative_results"] = False
    opt["algorithm_print_sent"] = False
    opt["duplicate"] = False
    return opt


def train_reference(cfg, paths, epochs: int, torch_teacher_path: str = "",
                    save_ckpt_path: str = ""):
    """Drive the ACTUAL reference training loop on CPU.

    ``torch_teacher_path``: .pth.tar of a trained reference ARB model —
    enables the NAB/NACF teacher warm start + rescoring exactly as
    misc/run.py:273-291. ``save_ckpt_path``: save the trained model in the
    reference checkpoint format (utils.py:195-202) for use as a teacher.
    """
    sys.path.insert(0, REFERENCE)
    cwd = os.getcwd()
    os.chdir(REFERENCE)  # config/methods.yaml etc. use relative paths
    try:
        import torch
        torch.set_num_threads(os.cpu_count() or 8)
        from misc.crit import get_criterion
        from misc.optim import get_optimizer
        from misc.run import get_loader, run_eval, run_train
        from models import get_model
        import models.Translator as _TR

        # run_eval constructs Translator() without a device, whose default is
        # torch.device('cuda') (models/Translator.py:15) — rebind to cpu
        _defaults = list(_TR.Translator.__init__.__defaults__)
        _defaults[0] = torch.device("cpu")
        _TR.Translator.__init__.__defaults__ = tuple(_defaults)

        from navc_tpu.metrics.scorer import COCOScorer

        opt = opt_from_cfg(cfg, paths)
        if torch_teacher_path:
            opt["teacher_path"] = torch_teacher_path
        torch.manual_seed(cfg.seed)
        np.random.seed(cfg.seed)
        random.seed(cfg.seed)

        model = get_model(opt)
        teacher_model = None
        if torch_teacher_path:
            from misc.utils import load_model_and_opt, load_satisfied_weights
            if opt.get("load_teacher_weights"):
                # teacher warm start with key remap (misc/run.py:273-279)
                model = load_satisfied_weights(
                    model=model, checkpoint_path=torch_teacher_path,
                    str_mapping={"decoder.bert.": "decoder."})
            if opt.get("with_teacher") and opt["method"] in ("NAB", "NACF"):
                teacher_model, _ = load_model_and_opt(torch_teacher_path, "cpu")
                teacher_model.eval()
        crit = get_criterion(opt)
        optimizer = get_optimizer(opt, model)
        train_loader = get_loader(opt, "train")
        vali_loader = get_loader(opt, "validate")
        vocab = train_loader.dataset.get_vocab()
        scorer = COCOScorer()

        history = []
        for epoch in range(epochs):
            train_loader.dataset.shuffle()
            t0 = time.time()
            train_loss = run_train(opt, model, crit, optimizer, train_loader,
                                   "cpu", epoch=epoch)
            optimizer.epoch_update_learning_rate()
            res = run_eval(opt, model, None, vali_loader, vocab, "cpu",
                           scorer=scorer, teacher_model=teacher_model)
            res = {k: float(v) for k, v in res.items()
                   if isinstance(v, (int, float))}
            res["train_loss"] = float(train_loss)
            res["epoch"] = epoch
            res["wall_s"] = round(time.time() - t0, 1)
            history.append(res)
            print("[reference] epoch %2d loss=%.3f CIDEr=%.3f Bleu_4=%.3f"
                  % (epoch, res["train_loss"], res["CIDEr"], res["Bleu_4"]),
                  file=sys.stderr)
        if save_ckpt_path:
            torch.save({"state_dict": model.state_dict(), "settings": opt},
                       save_ckpt_path)
        return history
    finally:
        os.chdir(cwd)


def train_navc(cfg, corpus, refs, feats, workdir: str):
    import jax
    jax.config.update("jax_platforms", "cpu")

    from navc_tpu.runtime.loop import train_network_all

    out = train_network_all(cfg, workdir=workdir, info_corpus=corpus,
                            references=refs, in_memory_feats=feats,
                            verbose=False)
    history = []
    for h in out["history"]:
        res = {k: float(v) for k, v in h.items()
               if isinstance(v, (int, float))}
        history.append(res)
        print("[navc_tpu ] epoch %2d loss=%.3f CIDEr=%.3f Bleu_4=%.3f"
              % (res["epoch"], res["train_loss"], res["CIDEr"], res["Bleu_4"]),
              file=sys.stderr)
    return history


def summarize(ref_hists, navc_hists):
    """Aggregate over seeds: per-stack mean/min/max of best and last-3-mean."""
    def tail_mean(hist, key, n=3):
        vals = [h[key] for h in hist[-n:]]
        return sum(vals) / len(vals)

    def agg(hists, key):
        bests = [max(h[key] for h in hist) for hist in hists]
        tails = [tail_mean(hist, key) for hist in hists]
        return {
            "best_mean": round(sum(bests) / len(bests), 4),
            "best_range": [round(min(bests), 4), round(max(bests), 4)],
            "last3_mean": round(sum(tails) / len(tails), 4),
            "last3_range": [round(min(tails), 4), round(max(tails), 4)],
        }

    out = {}
    for key in ("CIDEr", "Bleu_4"):
        r, n = agg(ref_hists, key), agg(navc_hists, key)
        out[key] = {
            "reference": r, "navc": n,
            "best_mean_abs_diff": round(abs(r["best_mean"] - n["best_mean"]), 4),
            "ranges_overlap": not (r["best_range"][1] < n["best_range"][0] or
                                   n["best_range"][1] < r["best_range"][0]),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--videos", type=int, default=48)
    ap.add_argument("--seeds", nargs="+", type=int, default=[0])
    ap.add_argument("--method", default="ARB", choices=["ARB", "NAB", "NACF"])
    ap.add_argument("--workdir", default="/tmp/parity_training")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from navc_tpu.data.synthetic import make_learnable_synthetic

    navc_hists, ref_hists = [], []
    for seed in args.seeds:
        navc_teacher, torch_teacher = "", ""
        if args.method == "NACF":
            # flagship pipeline: train the ARB teacher in each stack first
            # (reference README.md:150-162 two-stage recipe)
            tcfg = build_cfg("ARB", args.epochs, args.workdir).replace(seed=seed)
            corpus, refs, feats = make_learnable_synthetic(
                tcfg, n_videos=args.videos, n_classes=4)
            paths = dump_reference_files(tcfg, corpus, refs, feats,
                                         os.path.join(args.workdir, "refdata"))
            tdir = os.path.join(args.workdir, "navc_arb_s%d" % seed)
            train_navc(tcfg, corpus, refs, feats, tdir)
            navc_teacher = os.path.join(tdir, "best.ckpt")
            torch_teacher = os.path.join(args.workdir,
                                         "ref_arb_s%d.pth.tar" % seed)
            train_reference(tcfg, paths, args.epochs,
                            save_ckpt_path=torch_teacher)

        cfg = build_cfg(args.method, args.epochs, args.workdir,
                        navc_teacher_path=navc_teacher).replace(seed=seed)
        corpus, refs, feats = make_learnable_synthetic(
            cfg, n_videos=args.videos, n_classes=4)
        paths = dump_reference_files(cfg, corpus, refs, feats,
                                     os.path.join(args.workdir, "refdata"))
        navc_hists.append(train_navc(
            cfg, corpus, refs, feats,
            os.path.join(args.workdir, "navc_s%d" % seed)))
        ref_hists.append(train_reference(cfg, paths, args.epochs,
                                         torch_teacher_path=torch_teacher))

    result = {
        "protocol": "same learnable synthetic corpus (%d videos, 4 latent "
                    "classes), same arch/hyperparams (d=32, lr 2e-3, adam, "
                    "no dropout), same scorer (navc_tpu COCOScorer) for both "
                    "stacks; reference trained via its own misc/run.py loop; "
                    "seeds %s" % (args.videos, args.seeds),
        "method": args.method,
        "epochs": args.epochs,
        "seeds": args.seeds,
        "summary": summarize(ref_hists, navc_hists),
        "reference_history": (ref_hists[0] if len(ref_hists) == 1 else ref_hists),
        "navc_history": (navc_hists[0] if len(navc_hists) == 1 else navc_hists),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
    }
    out_path = os.path.join(REPO, "PARITY_TRAINING.json")
    existing = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                existing = json.load(f)
        except Exception:
            existing = {}
    if "method" in existing:  # migrate old single-method layout
        existing = {existing["method"]: existing}
    existing[args.method] = result
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps({"summary": result["summary"]}, indent=2))


if __name__ == "__main__":
    main()
