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
        beam = int(rng.choice([2, 3, 5, 7]))
        return {
            "kind": str(rng.choice(["ARB", "ARB2"])),
            "kw": {
                "beam_size": beam,
                "beam_alpha": float(rng.choice([0.8, 1.0, 1.35, 2.0])),
                "topk": min(beam, int(rng.choice([1, 1, 2, 3]))),
                # watch > 0 (band causal mask, Decoder.py:23-29) routes the
                # beam through the full-prefix path (kv_cached_beam_eligible
                # excludes it) — both paths must match the reference
                "watch": int(rng.choice([0, 0, 0, 1, 2])),
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


def sample_model_case(rng: np.random.RandomState) -> dict:
    """One model-ARCHITECTURE configuration for forward-parity fuzzing.

    Covers the build knobs the fixed tests pin only pointwise: enhance_input
    (Decoder.py:132-139), watch-band causal masks (Decoder.py:23-29),
    pos_attention (bert.py:255-276), with_layernorm (bert.py:189,237),
    norm_type/no_encoder_bn (joint_representation.py), fusion variants,
    modality subsets, tie_weights (seq2seq), hidden_act.
    """
    method = str(rng.choice(["ARB", "ARB2", "NAB", "NACF"]))
    kw = {
        "enhance_input": int(rng.choice([0, 1, 2])),
        "pos_attention": bool(rng.rand() < 0.3),
        "with_layernorm": bool(rng.rand() < 0.3),
        "norm_type": str(rng.choice(["bn", "ln"])),
        "no_encoder_bn": bool(rng.rand() < 0.2),
        "fusion": str(rng.choice(["temporal_concat", "addition"])),
        "tie_weights": bool(rng.rand() < 0.3),
        "hidden_act": str(rng.choice(["gelu_new", "relu"])),
    }
    modality = str(rng.choice(["mi", "i", "m"]))
    if modality != "mi":
        kw["modality"] = modality
    if method in ("ARB", "ARB2"):
        kw["watch"] = int(rng.choice([0, 1, 2]))
    else:
        # enhance_input=1 (resampling) is NOT oracle-testable: the
        # reference's resampling() does ``1 - pad_mask`` on a bool tensor
        # (Decoder.py:43), which this torch version rejects; navc's
        # implementation is covered by in-repo tests instead.
        if kw["enhance_input"] == 1:
            kw["enhance_input"] = int(rng.choice([0, 2]))
    if kw["fusion"] == "addition":
        # The reference's addition+norm path is broken upstream for any
        # batch > 1: ``len(encoder_outputs)`` after the stack().mean(0) is
        # the BATCH size compared against len(norm_list)==1
        # (joint_representation.py:38-41), so the only functional upstream
        # combination is no_encoder_bn=True. navc's intent-preserving
        # extension (one norm over the averaged stream, models/fusion.py)
        # is covered by in-repo tests.
        kw["no_encoder_bn"] = True
    return {
        "kind": "forward:" + method,
        "method": method,
        "kw": kw,
        "weight_seed": int(rng.randint(100)),
        "input_seed": int(rng.randint(100)),
    }


def run_model_case(h, case: dict) -> None:
    """Forward log-prob / length-head / enc-output parity for one sampled
    architecture (mirrors test_forward_logprob_parity with random knobs)."""
    import jax.numpy as jnp

    opt, tmodel, cfg, jmodel, variables = h.build_pair(
        case["method"], seed=case["weight_seed"], **case["kw"])
    b = 4
    feats, category = h.make_inputs(opt, b=b, seed=case["input_seed"])
    rng = np.random.RandomState(case["input_seed"] + 1)

    tokens = rng.randint(6, opt["vocab_size"], size=(b, opt["max_len"]))
    lens = rng.randint(4, opt["max_len"], size=(b,))
    for i in range(b):
        tokens[i, lens[i]:] = h.C.PAD
        if opt["decoding_type"] == "NARFormer":
            m = rng.rand(lens[i]) < 0.4
            tokens[i, :lens[i]][m] = h.C.MASK
    tokens = tokens.astype(np.int64)

    if opt["visual_word_generation"]:
        tokens_1 = np.where(tokens != h.C.PAD, h.C.VIS, h.C.PAD).astype(np.int64)
        t_tgt = [h.torch.from_numpy(tokens_1), h.torch.from_numpy(tokens)]
        j_tgt = (jnp.asarray(tokens_1, jnp.int32),
                 jnp.asarray(tokens, jnp.int32))
    else:
        t_tgt = h.torch.from_numpy(tokens)
        j_tgt = jnp.asarray(tokens, jnp.int32)

    with h.torch.no_grad():
        tres = tmodel(feats=[h.torch.from_numpy(f) for f in feats],
                      tgt_tokens=t_tgt,
                      category=h.torch.from_numpy(category))
    jres = jmodel.apply(variables, [jnp.asarray(f) for f in feats], j_tgt,
                        jnp.asarray(category, jnp.int32), deterministic=True)

    t_lp = tres["tgt_word_logprobs"]
    j_lp = jres["tgt_word_logprobs"]
    assert len(t_lp) == len(j_lp)
    for t, j in zip(t_lp, j_lp):
        np.testing.assert_allclose(np.asarray(j), t.numpy(),
                                   atol=2e-4, rtol=2e-4)
    if "length" in opt["crit"]:
        np.testing.assert_allclose(np.asarray(jres["pred_length"]),
                                   tres["pred_length"].numpy(),
                                   atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(jres["enc_output"]),
                               tres["enc_output"].numpy(),
                               atol=1e-4, rtol=1e-4)


def run_case(h, case: dict) -> None:
    """Build both stacks and assert parity; raises on any mismatch."""
    import jax.numpy as jnp

    if case["kind"] in ("ARB", "ARB2"):
        opt, tmodel, cfg, jmodel, variables = h.build_pair(
            case["kind"], seed=case["weight_seed"], **case["kw"])
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
        seqs, scores = gen(variables, jenc, jnp.asarray(category, jnp.int32))
        seqs, scores = np.asarray(seqs), np.asarray(scores)
        topk = cfg.topk
        if topk <= 1:
            seqs, scores = seqs[:, None, :], scores[:, None]
        clamped = False
        for i in range(b):
            # Known upstream bug (NOT replicated): collect_hypothesis_and_
            # scores reassigns ``n_best = min(n_best, len(scores))`` INSIDE
            # the per-instance loop (Translator.py:87), so one instance with
            # few finished hypotheses clamps every LATER instance's n-best —
            # batch-order-dependent truncation. navc returns the true top-k
            # per instance. So: the reference's returned prefix must match
            # exactly, and the -inf-padding check only applies while no
            # earlier instance has clamped the count.
            for j, hyp in enumerate(batch_hyp[i][:topk]):
                assert list(seqs[i, j][: len(hyp)]) == hyp, (
                    "instance %d best-%d: ref %s vs tpu %s"
                    % (i, j, hyp, seqs[i, j].tolist()))
                assert (seqs[i, j][len(hyp):] == h.C.PAD).all()
                np.testing.assert_allclose(scores[i, j], batch_scores[i][j],
                                           atol=1e-4)
            if not clamped:
                for j in range(len(batch_hyp[i][:topk]), topk):
                    assert np.isneginf(scores[i, j])
            if len(batch_hyp[i]) < topk:
                clamped = True
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


def main(n: int, seed: int, only: int = None, kind: str = "decode") -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    h = load_harness()
    rng = np.random.RandomState(seed)
    if kind == "decode":
        cases = [(sample_case(rng), run_case) for _ in range(n)]
    elif kind == "model":
        cases = [(sample_model_case(rng), run_model_case) for _ in range(n)]
    else:  # both: alternate samplers from one stream
        cases = [((sample_case(rng), run_case) if i % 2 == 0 else
                  (sample_model_case(rng), run_model_case))
                 for i in range(n)]
    failures = 0
    for i, (case, runner) in enumerate(cases):
        if only is not None and i != only:
            continue
        t0 = time.time()
        try:
            runner(h, case)
            print("case %02d OK   %5.1fs  %s" % (i, time.time() - t0, case))
        except Exception as e:  # noqa: BLE001 — keep sweeping, report all
            failures += 1
            print("case %02d FAIL %5.1fs  %s\n  %s: %s"
                  % (i, time.time() - t0, case, type(e).__name__, e))
    print("fuzz: %d/%d passed (seed=%d, kind=%s)"
          % ((1 if only is not None else n) - failures,
             1 if only is not None else n, seed, kind))
    return failures


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--only", type=int, default=None,
                    help="run only case K (reproduce a failure)")
    ap.add_argument("--kind", choices=["decode", "model", "both"],
                    default="decode")
    args = ap.parse_args()
    sys.exit(1 if main(args.n, args.seed, args.only, args.kind) else 0)
