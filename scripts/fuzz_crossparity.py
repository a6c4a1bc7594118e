"""Randomized decode-parity fuzz against the actual torch reference.

The fixed cross-parity tests (tests/test_reference_crossparity.py) pin a
handful of decode configurations; this fuzzer samples the configuration
space — method, paradigm, refinement schedule, length-beam width, teacher
gates (masking_decision / no_candidate_decision, algorithms.py:43-44),
dict_mapping KD remap (algorithms.py:169-173), beam size/alpha
(Translator.py:94-161) — and asserts token-identical captions between the
reference and navc_tpu for every sampled case, reusing the weight-conversion
harness from the fixed tests.

Usage:
    python scripts/fuzz_crossparity.py --n 12 --seed 0

Every case is deterministic in (seed, index): a failure reproduces with
``--seed S --only K``.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def load_harness():
    """Import tests/test_reference_crossparity.py as a module."""
    path = os.path.join(REPO, "tests", "test_reference_crossparity.py")
    spec = importlib.util.spec_from_file_location("xparity_harness", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["xparity_harness"] = mod
    spec.loader.exec_module(mod)
    return mod


def sample_case(rng: np.random.RandomState) -> dict:
    """One decode configuration, valid in BOTH stacks by construction.

    Invalid-space combos are excluded the same way the reference CLI does:
    use_ct needs visual-word generation (NACF), q/q_iterations only steer
    l2r/ef, teacher gates only exist when a teacher is passed.
    """
    if rng.rand() < 0.3:
        return {
            "kind": "ARB",
            "kw": {
                "beam_size": int(rng.choice([2, 3, 5, 7])),
                "beam_alpha": float(rng.choice([0.8, 1.0, 1.35, 2.0])),
            },
            "weight_seed": int(rng.randint(100)),
            "input_seed": int(rng.randint(100)),
        }
    method = str(rng.choice(["NAB", "NACF"]))
    kw = {"length_beam_size": int(rng.choice([1, 2, 3, 4]))}
    paradigm = str(rng.choice(["mp", "l2r", "ef"]))
    kw["paradigm"] = paradigm
    if paradigm in ("l2r", "ef"):
        kw["q"] = int(rng.choice([1, 2]))
        kw["q_iterations"] = int(rng.choice([0, 1]))
    else:
        kw["iterations"] = int(rng.choice([1, 2, 3, 4]))
    if method == "NACF" and rng.rand() < 0.3:
        kw["use_ct"] = False
    case = {
        "kind": method,
        "kw": kw,
        "weight_seed": int(rng.randint(100)),
        "input_seed": int(rng.randint(100)),
        "teacher": bool(rng.rand() < 0.7),
        "dict_mapping": False,
    }
    if case["teacher"]:
        kw["masking_decision"] = bool(rng.rand() < 0.5)
        kw["no_candidate_decision"] = bool(rng.rand() < 0.5)
        case["dict_mapping"] = bool(rng.rand() < 0.3)
        case["teacher_seed"] = int(rng.randint(100))
    return case


def run_case(h, case: dict) -> None:
    """Build both stacks and assert parity; raises on any mismatch."""
    import jax.numpy as jnp

    if case["kind"] == "ARB":
        opt, tmodel, cfg, jmodel, variables = h.build_pair(
            "ARB", seed=case["weight_seed"], **case["kw"])
        b = 5
        feats, category = h.make_inputs(opt, b=b, seed=case["input_seed"])
        tenc, jenc = h.encode_both(opt, tmodel, jmodel, variables, feats)
        translator = h.RefTranslator(
            tmodel, opt, device=h.torch.device("cpu"))
        vocab = {i: "w%d" % i for i in range(opt["vocab_size"])}
        batch_hyp, batch_scores = translator.translate_batch(
            tenc, h.torch.from_numpy(category), tgt_tokens=None,
            tgt_vocab=vocab)
        gen = h.make_ar_generator(cfg, jmodel, jit=True)
        seqs = np.asarray(gen(variables, jenc,
                              jnp.asarray(category, jnp.int32))[0])
        for i in range(b):
            hyp = batch_hyp[i][0]
            assert list(seqs[i][: len(hyp)]) == hyp, (
                "instance %d: ref %s vs tpu %s" % (i, hyp, seqs[i].tolist()))
            assert (seqs[i][len(hyp):] == h.C.PAD).all()
        return

    teacher = (h.build_pair("ARB", seed=case["teacher_seed"])
               if case["teacher"] else None)
    pair = h.build_pair(case["kind"], seed=case["weight_seed"], **case["kw"])
    mapping = None
    if case["dict_mapping"]:
        rng = np.random.RandomState(case["weight_seed"] + 1)
        v = pair[0]["vocab_size"]
        perm = np.arange(v)
        tail = perm[6:].copy()
        rng.shuffle(tail)
        perm[6:] = tail
        mapping = {i: int(perm[i]) for i in range(v)}
    h.run_nar_both(pair[0], pair[1], pair[2], pair[3], pair[4],
                   seed=case["input_seed"], teacher=teacher,
                   dict_mapping=mapping)


def main(n: int, seed: int, only: int = None) -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    h = load_harness()
    rng = np.random.RandomState(seed)
    cases = [sample_case(rng) for _ in range(n)]
    failures = 0
    for i, case in enumerate(cases):
        if only is not None and i != only:
            continue
        t0 = time.time()
        try:
            run_case(h, case)
            print("case %02d OK   %5.1fs  %s" % (i, time.time() - t0, case))
        except AssertionError as e:
            failures += 1
            print("case %02d FAIL %5.1fs  %s\n  %s"
                  % (i, time.time() - t0, case, e))
    print("fuzz: %d/%d passed (seed=%d)"
          % ((1 if only is not None else n) - failures,
             1 if only is not None else n, seed))
    return failures


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--only", type=int, default=None,
                    help="run only case K (reproduce a failure)")
    args = ap.parse_args()
    sys.exit(1 if main(args.n, args.seed, args.only) else 0)
