"""Regression-sensitive flagship quality campaign (VERDICT r3 #1).

Round 3's flagship corpus saturated (CIDEr ~9.9/10 for every method), so a
silent quality bug in CT gating or teacher rescoring would pass. This
campaign runs the reference's full two-stage protocol (README.md:150-181) on
the HARD synthetic corpus (data/synthetic.py::make_hard_synthetic —
paraphrase-multimodal references, compositional confusable features, Zipf
modifier noise, distractor captions) at flagship scale (d=512, vocab 10048,
MSRVTT --default presets), trains ALL FOUR methods, and evaluates the decode
ablations the method family is designed around
(reference decoding/algorithms.py:136-141, 175-204, 271-272):

  * NACF vs NAB            (visual words + CT should win)
  * use_ct on/off          (coarse-grained templates)
  * final teacher rescoring on/off   (no_candidate_decision)
  * intermediate teacher gating on   (masking_decision)

plus oracle / majority-baseline calibration scores so every number has an
interpretable ceiling and floor. Writes FLAGSHIP_E2E.json (v2 schema with
an "ablations" table and "ordering" booleans).

    python scripts/flagship_quality.py [--epochs 20] [--videos 768]

Afterwards: python bench.py --ckpt <student> --tckpt <teacher> re-attaches
the trained-checkpoint perf number.
"""

import argparse
import json
import os
import pickle
import sys
import time
from collections import Counter, defaultdict

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def write_dataset(cfg, corpus, refs, feats, base: str):
    from navc_tpu.data.synthetic import write_hdf5_feats
    ddir = os.path.join(base, "MSRVTT")
    os.makedirs(os.path.join(ddir, "feats"), exist_ok=True)
    with open(os.path.join(ddir, "info_corpus.pkl"), "wb") as f:
        pickle.dump(corpus, f)
    with open(os.path.join(ddir, "refs.pkl"), "wb") as f:
        pickle.dump(refs, f)
    for ch in cfg.modality.lower():
        name = getattr(cfg, "feats_%s_name" % ch)[0]
        write_hdf5_feats(os.path.join(ddir, "feats", name),
                         feats["feats_%s" % ch])


def calibration_scores(corpus, refs, n_videos, n_classes):
    """Oracle (perfect class, mode-seeking decode) and majority-caption
    baselines on the test split — the ceiling/floor that make the trained
    numbers interpretable."""
    from navc_tpu.metrics.scorer import COCOScorer

    info = corpus["info"]
    itow, caps = info["itow"], corpus["captions"]
    video_class = {v: v % n_classes for v in range(n_videos)}
    class_caps = defaultdict(Counter)
    for v in info["split"]["train"]:
        for c in caps["video%d" % v]:
            class_caps[video_class[v]][tuple(c[1:-1])] += 1
    overall = Counter()
    for cc in class_caps.values():
        overall.update(cc)
    glob = list(overall.most_common(1)[0][0])

    def to_str(ws):
        return " ".join(itow[w] for w in ws)

    test = info["split"]["test"]
    gts = {"video%d" % v: refs["video%d" % v] for v in test}
    res_o, res_m = {}, {}
    for v in test:
        cc = class_caps[video_class[v]]
        best = list(cc.most_common(1)[0][0]) if cc else glob
        res_o["video%d" % v] = [{"image_id": "video%d" % v,
                                 "caption": to_str(best)}]
        res_m["video%d" % v] = [{"image_id": "video%d" % v,
                                 "caption": to_str(glob)}]
    sc = COCOScorer()
    ids = list(gts)
    oracle, _ = sc.score(gts, res_o, ids)
    majority, _ = sc.score(gts, res_m, ids)
    return ({k: float(v) for k, v in oracle.items()},
            {k: float(v) for k, v in majority.items()})


def clean(res):
    return {k: float(v) for k, v in (res or {}).items()
            if isinstance(v, (int, float))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--videos", type=int, default=768)
    ap.add_argument("--classes", type=int, default=128)
    ap.add_argument("--caps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--methods", nargs="+",
                    default=["ARB", "ARB2", "NAB", "NACF"])
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse existing checkpoints; rerun ablations only")
    ap.add_argument("--seed-sweep", nargs="+", type=int, default=None,
                    help="train NACF+NAB at these extra seeds (same corpus, "
                         "same seed-0 ARB teacher), decode the default "
                         "ablation for each, and append a seed_sweep section "
                         "with per-seed CIDEr and the by-mean ordering to an "
                         "existing FLAGSHIP_E2E.json")
    ap.add_argument("--small", action="store_true",
                    help="toy dims + small corpus: CPU smoke of the whole "
                         "campaign (script validation, not evidence)")
    ap.add_argument("--workdir", default="/tmp/flagship_quality")
    ap.add_argument("--out", default=os.path.join(ROOT, "FLAGSHIP_E2E.json"))
    args = ap.parse_args()

    vocab = 10048
    dim_args = []
    gen_kw = {}
    if args.small:
        import jax
        jax.config.update("jax_platforms", "cpu")
        vocab = 700
        args.videos, args.classes, args.caps = 80, 12, 3
        args.epochs, args.batch = 3, 16
        gen_kw = dict(adj_pool=80, adv_pool=40)
        dim_args = ["--dim_hidden", "64", "--num_attention_heads", "4",
                    "--intermediate_size", "128"]

    from navc_tpu.runtime.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from navc_tpu.cli.train import main as train_main
    from navc_tpu.cli.translate import main as translate_main
    from navc_tpu.config import default_config
    from navc_tpu.data.synthetic import make_hard_synthetic

    gen_cfg = default_config("NACF", dataset="MSRVTT", vocab_size=vocab,
                             n_frames=8, n_total_frames=16)
    corpus, refs, feats = make_hard_synthetic(
        gen_cfg, n_videos=args.videos, n_classes=args.classes,
        vocab_size=vocab, n_caps=args.caps, n_total_frames=16, **gen_kw)
    data_dir = os.path.join(args.workdir, "data")
    write_dataset(gen_cfg, corpus, refs, feats, data_dir)
    oracle, majority = calibration_scores(corpus, refs, args.videos,
                                          args.classes)
    print("[quality] oracle  test:", {k: round(v, 3) for k, v in oracle.items()
                                      if k in ("Bleu_4", "CIDEr", "METEOR")},
          file=sys.stderr)
    print("[quality] majority test:", {k: round(v, 3) for k, v in majority.items()
                                       if k in ("Bleu_4", "CIDEr", "METEOR")},
          file=sys.stderr)

    ckpt_root = os.path.join(args.workdir, "experiments")
    common = [
        "--dataset", "MSRVTT", "--default", "--scope", "flagship",
        "--base_data_path", data_dir,
        "--base_checkpoint_path", ckpt_root,
        "--batch_size", str(args.batch),
        "--epochs", str(args.epochs),
        "--n_frames", "8", "--n_total_frames", "16",
        "--save_checkpoint_every", "1",
        "--tolerence", "1000",
    ] + dim_args

    report = {
        "protocol": ("reference two-stage pipeline (README.md:150-181) at "
                     "flagship scale on the HARD synthetic corpus "
                     "(%d videos, %d latent (s,v,o) classes, %d paraphrase "
                     "captions/video, Zipf modifiers, 12%% distractors): "
                     "d=512, vocab=10048, MSRVTT --default presets; all four "
                     "methods trained via cli/train.py, decode ablations via "
                     "cli/translate.py (reference algorithms.py:136-141, "
                     "175-204, 271-272)"
                     % (args.videos, args.classes, args.caps)),
        "epochs": args.epochs,
        "batch_size": args.batch,
        "calibration": {"oracle_test": oracle, "majority_test": majority},
        "methods": {},
    }

    if args.seed_sweep:
        # ---- ordering-by-mean over seeds (VERDICT r3 #1 follow-up) --------
        # The single-seed default-decode NACF/NAB gap (~1%) is within seed
        # noise; this trains the two students at extra seeds against the
        # FIXED seed-0 ARB teacher and reports per-seed default-decode CIDEr.
        with open(args.out) as f:
            report = json.load(f)
        teacher = os.path.join(ckpt_root, "MSRVTT", "ARB", "flagship",
                               "best.ckpt")
        nar_common = ["--dataset", "MSRVTT", "--evaluation_mode", "test",
                      "--batch_size", str(args.batch),
                      "--beam_alpha", "1.35", "--iterations", "5",
                      "--length_beam_size", "6", "--paradigm", "mp",
                      "--teacher_path", teacher]
        sweep = report.setdefault("seed_sweep", {
            "protocol": ("NACF/NAB retrained at extra seeds on the same "
                         "corpus vs the fixed seed-0 ARB teacher; default "
                         "decode (CT for NACF, final rescoring on)"),
            "default_CIDEr": {
                "NACF": {"0": report["ablations"]["NACF_default"]["CIDEr"]},
                "NAB": {"0": report["ablations"]["NAB_default"]["CIDEr"]},
            },
        })
        for seed in args.seed_sweep:
            for student in ("NACF", "NAB"):
                scope = "flagship_s%d" % seed
                ck = os.path.join(ckpt_root, "MSRVTT", student, scope,
                                  "best.ckpt")
                if not os.path.exists(ck):
                    # --default force-derives teacher_path from the scope
                    # (parity with reference opts.py:201-207), so expose the
                    # FIXED seed-0 ARB teacher at the derived per-seed path —
                    # the sweep varies only the student
                    tdir = os.path.join(ckpt_root, "MSRVTT", "ARB", scope)
                    os.makedirs(tdir, exist_ok=True)
                    tlink = os.path.join(tdir, "best.ckpt")
                    if not os.path.exists(tlink):
                        os.symlink(teacher, tlink)
                    print("[quality] seed %d training %s ..." % (seed, student),
                          file=sys.stderr)
                    train_main([a if a != "flagship" else scope
                                for a in common]
                               + ["--method", student, "--seed", str(seed)])
                ct = ["--use_ct"] if student == "NACF" else []
                res = translate_main(["--model_path", ck] + nar_common + ct)
                sweep["default_CIDEr"][student][str(seed)] = float(
                    res["test"]["CIDEr"])
                with open(args.out, "w") as f:
                    json.dump(report, f, indent=1)
                    f.write("\n")
        means = {m: float(np.mean(list(v.values())))
                 for m, v in sweep["default_CIDEr"].items()}
        sweep["mean_CIDEr"] = {m: round(v, 4) for m, v in means.items()}
        sweep["nacf_ge_nab_by_mean"] = bool(means["NACF"] >= means["NAB"])
        report["ordering"]["nacf_ge_nab_by_seed_mean"] = \
            sweep["nacf_ge_nab_by_mean"]
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")
        print(json.dumps(sweep, indent=1))
        return

    for method in args.methods:
        if args.skip_train:
            break
        t0 = time.time()
        print("[quality] training %s ..." % method, file=sys.stderr)
        out = train_main(common + ["--method", method])
        report["methods"][method] = {
            "history": [{k: float(v) for k, v in h.items()
                         if isinstance(v, (int, float))} for h in out["history"]],
            "test_res": clean(out.get("test_res")),
            "wall_s": round(time.time() - t0, 1),
        }
        with open(args.out + ".partial", "w") as f:
            json.dump(report, f, indent=1)

    # ---- decode ablations on the trained checkpoints ---------------------
    def ckpt(method):
        return os.path.join(ckpt_root, "MSRVTT", method, "flagship", "best.ckpt")

    teacher = ckpt("ARB")
    nar_common = ["--dataset", "MSRVTT", "--evaluation_mode", "test",
                  "--batch_size", str(args.batch),
                  "--beam_alpha", "1.35", "--iterations", "5",
                  "--length_beam_size", "6", "--paradigm", "mp",
                  "--teacher_path", teacher]
    ablations = {}
    specs = []
    for student in ("NACF", "NAB"):
        if not os.path.exists(ckpt(student)):
            continue
        base = ["--model_path", ckpt(student)] + nar_common
        ct = ["--use_ct"] if student == "NACF" else []
        # default decode: CT (NACF only) + final teacher rescoring
        specs.append(("%s_default" % student, base + ct))
        if student == "NACF":
            specs.append(("NACF_no_ct", base))                     # CT off
        specs.append(("%s_no_rescore" % student,
                      base + ct + ["--no_candidate_decision"]))    # final off
        specs.append(("%s_mask_decision" % student,
                      base + ct + ["--masking_decision"]))         # interm. on
    for name, argv in specs:
        t0 = time.time()
        print("[quality] ablation %s ..." % name, file=sys.stderr)
        res = translate_main(argv)
        ablations[name] = clean(res["test"])
        ablations[name]["wall_s"] = round(time.time() - t0, 1)
        with open(args.out + ".partial", "w") as f:
            json.dump(dict(report, ablations=ablations), f, indent=1)
    report["ablations"] = ablations

    def cider(name):
        return ablations.get(name, {}).get("CIDEr", float("nan"))

    report["ordering"] = {
        "nacf_ge_nab": bool(cider("NACF_default") >= cider("NAB_default")),
        "ct_helps": bool(cider("NACF_default") >= cider("NACF_no_ct")),
        "rescoring_helps_nacf": bool(
            cider("NACF_default") >= cider("NACF_no_rescore")),
        "rescoring_helps_nab": bool(
            cider("NAB_default") >= cider("NAB_no_rescore")),
    }
    report["checkpoints"] = {
        "teacher": teacher,
        "student": ckpt("NACF"),
    }
    report["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S%z")
    import jax
    report["device"] = str(jax.devices()[0].device_kind)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    if os.path.exists(args.out + ".partial"):
        os.remove(args.out + ".partial")
    print(json.dumps({
        "oracle_CIDEr": round(oracle["CIDEr"], 3),
        "majority_CIDEr": round(majority["CIDEr"], 3),
        "test_CIDEr": {m: round(r["test_res"].get("CIDEr", float("nan")), 3)
                       for m, r in report["methods"].items()},
        "ablations_CIDEr": {k: round(v.get("CIDEr", float("nan")), 3)
                            for k, v in ablations.items()},
        "ordering": report["ordering"],
    }, indent=1))


if __name__ == "__main__":
    main()
