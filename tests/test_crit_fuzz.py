"""Randomized loss-criterion parity fuzz vs the reference misc/crit.py.

Drives the ACTUAL reference Criterion (LanguageGeneration + KLDivLoss length
head, reference crit.py) and navc's compute_losses with identical random
batches — dual-stream visual-word weighting [0.8, 1.0], PAD masking, MASK
exclusion in stream-0 word accuracy, crit scales, batch-mean denominators,
word-accuracy and perplexity statistics.
"""

import math
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from misc.crit import get_criterion  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from navc_tpu import constants as C  # noqa: E402
from navc_tpu.config import Config  # noqa: E402
from navc_tpu.runtime.crit import compute_losses  # noqa: E402


def _random_batch(rng, b, l, v, vwg):
    def stream(mask_some):
        logits = rng.randn(b, l, v).astype(np.float32)
        lp = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
        labels = rng.randint(C.NUM_SPECIAL_TOKENS, v, size=(b, l))
        for i in range(b):
            labels[i, rng.randint(2, l):] = C.PAD
            if mask_some:
                m = rng.rand(l) < 0.4
                labels[i, m & (labels[i] != C.PAD)] = C.MASK
        return lp, labels.astype(np.int64)

    if vwg:
        lp0, lab0 = stream(mask_some=True)
        lp1, lab1 = stream(mask_some=False)
        lps, labs = [lp0, lp1], [lab0, lab1]
    else:
        lp, lab = stream(mask_some=False)
        lps, labs = [lp], [lab]

    pl = rng.randn(b, l).astype(np.float32)
    pred_length = torch.log_softmax(torch.from_numpy(pl), dim=-1).numpy()
    tl = rng.rand(b, l).astype(np.float32)
    tgt_length = tl / tl.sum(-1, keepdims=True)
    return lps, labs, pred_length, tgt_length


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_criterion_parity_fuzz(seed):
    from config import Constants as RefC  # reference token ids must agree

    assert RefC.PAD == C.PAD and RefC.MASK == C.MASK

    rng = np.random.RandomState(seed)
    for _ in range(4):
        b, l = int(rng.randint(2, 6)), int(rng.randint(3, 10))
        v = int(rng.randint(10, 30))
        vwg = bool(rng.rand() < 0.5)
        with_length = bool(rng.rand() < 0.7)
        crit = ["lang"] + (["length"] if with_length else [])
        scales = [float(rng.choice([0.5, 1.0, 2.0])) for _ in crit]

        lps, labs, pred_length, tgt_length = _random_batch(rng, b, l, v, vwg)

        # ---- reference ----
        from config.Constants import mapping
        opt = {"crit": crit,
               "crit_key": [mapping[c] for c in crit],
               "crit_name": ["Cap Loss"] + (["Length Loss"] if with_length else []),
               "crit_scale": scales,
               "visual_word_generation": vwg,
               "nv_weights": [0.8, 1.0]}
        criterion = get_criterion(opt)
        criterion.reset_loss_recorder()
        results_t = {
            "tgt_word_logprobs": [torch.from_numpy(x) for x in lps]
            if vwg else torch.from_numpy(lps[0]),
            "tgt_word_labels": [torch.from_numpy(x) for x in labs]
            if vwg else torch.from_numpy(labs[0]),
            "pred_length": torch.from_numpy(pred_length),
            "tgt_length": torch.from_numpy(tgt_length),
        }
        ref_total = float(criterion.get_loss(results_t))
        names, info = criterion.get_loss_info()
        ref_info = dict(zip(names, info))

        # ---- navc ----
        cfg = Config(dataset="MSRVTT", method="NACF" if vwg else "NAB",
                     crit=crit, crit_scale=scales,
                     visual_word_generation=vwg, nv_weights=[0.8, 1.0],
                     vocab_size=v, max_len=l, batch_size=b)
        results_j = {
            "tgt_word_logprobs": [jnp.asarray(x) for x in lps],
            "tgt_word_labels": [jnp.asarray(x.astype(np.int32)) for x in labs],
            "pred_length": jnp.asarray(pred_length),
            "tgt_length": jnp.asarray(tgt_length),
        }
        total, metrics = compute_losses(cfg, results_j)

        np.testing.assert_allclose(float(total), ref_total,
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(float(metrics["lang_loss"]),
                                   ref_info["Cap Loss"], rtol=2e-5, atol=2e-6)
        if with_length:
            np.testing.assert_allclose(float(metrics["length_loss"]),
                                       ref_info["Length Loss"],
                                       rtol=2e-5, atol=2e-6)
        for i in range(2 if vwg else 1):
            acc = (float(metrics["word_acc%d_correct" % i])
                   / max(1.0, float(metrics["word_acc%d_count" % i])))
            np.testing.assert_allclose(acc, ref_info["Word Acc%d" % i],
                                       rtol=1e-6, atol=1e-8)
        ppl = math.exp(float(metrics["ppl_sum"]) / float(metrics["ppl_count"]))
        np.testing.assert_allclose(ppl, ref_info["Perplexity"],
                                    rtol=2e-5, atol=2e-6)
