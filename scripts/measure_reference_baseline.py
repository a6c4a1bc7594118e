"""Measure the reference implementation's NACF decode throughput.

Runs the ACTUAL reference code (mounted read-only at /root/reference) with
synthetic weights at the same scale and decode configuration as bench.py
(d=512, vocab 10048, B=64, T=5, lbs=6, CT, teacher rescoring) and records
captions/sec to BASELINE_MEASURED.json.

The environment has no CUDA, so this measures the torch *CPU* backend — the
reference was published against a single CUDA GPU (README.md:43-47). The
output file documents the hardware so the bench.py vs_baseline ratio can be
interpreted correctly.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE = "/root/reference"


def build_opt(batch_size=64):
    return {
        "modality": "mi", "dim_i": 2048, "dim_m": 2048, "dim_a": 1, "dim_o": 1,
        "encoder": "Encoder_HighWay", "decoder": "BertDecoderDisentangled",
        "fusion": "temporal_concat", "crit": ["lang", "length"],
        "dim_hidden": 512, "num_hidden_layers_decoder": 1,
        "num_attention_heads": 8, "intermediate_size": 2048,
        "hidden_act": "gelu_new", "hidden_dropout_prob": 0.5,
        "attention_probs_dropout_prob": 0.0, "max_len": 30,
        "layer_norm_eps": 1e-5, "watch": 0, "pos_attention": False,
        "enhance_input": 2, "with_layernorm": False, "with_category": True,
        "num_category": 20, "encoder_dropout": 0.5, "no_encoder_bn": False,
        "norm_type": "bn", "vocab_size": 10048, "tie_weights": False,
        "decoding_type": "NARFormer", "visual_word_generation": True,
        "demand": ["VERB", "NOUN"], "batch_size": batch_size,
        "paradigm": "mp", "length_beam_size": 6, "iterations": 5,
        "use_ct": True, "beam_alpha": 1.35, "masking_decision": False,
        "no_candidate_decision": False, "algorithm_print_sent": False,
        "collect_best_candidate_iterative_results": False,
        "method": "NACF", "n_frames": 8,
    }


def main():
    sys.path.insert(0, REFERENCE)
    os.chdir(REFERENCE)  # config/methods.yaml relative paths
    import torch
    torch.set_num_threads(os.cpu_count() or 8)
    from models import get_model
    from decoding import generate

    opt = build_opt()
    b = opt["batch_size"]
    teacher_opt = dict(opt)
    teacher_opt.update(decoding_type="ARFormer", decoder="BertDecoder",
                       crit=["lang"], visual_word_generation=False,
                       method="ARB")

    torch.manual_seed(0)
    model = get_model(opt).eval()
    teacher = get_model(teacher_opt).eval()

    rng = np.random.RandomState(0)
    feats = [torch.from_numpy(rng.randn(b, 8, 2048).astype(np.float32))
             for _ in range(2)]
    category = torch.zeros(b, 1, dtype=torch.long)
    vocab = {i: "w%d" % i for i in range(opt["vocab_size"])}

    with torch.no_grad():
        enc = model.encode(feats)
        tenc = teacher.encode(feats)

        def run_once():
            return generate(
                opt=opt, model=model, teacher_model=teacher,
                encoder_outputs=enc, teacher_encoder_outputs=tenc,
                category=category, tgt_tokens=torch.zeros(b, 30, dtype=torch.long),
                tgt_vocab=vocab, dict_mapping={}, length_bias=0)

        run_once()  # warmup
        n_iters = 3
        t0 = time.perf_counter()
        for _ in range(n_iters):
            run_once()
        dt = time.perf_counter() - t0

    cps = b * n_iters / dt
    out = {
        "captions_per_sec": round(cps, 3),
        "batch_size": b,
        "config": "NACF d=512 vocab=10048 T=5 lbs=6 CT teacher-rescore",
        "hardware": "torch %s CPU (%d threads) — no CUDA in this environment; "
                    "the reference was published against a single CUDA GPU"
                    % (torch.__version__, torch.get_num_threads()),
        "protocol": "encode outside timed region; time decoding.generate per "
                    "batch (reference misc/run.py:139-143 latency protocol)",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
