"""Randomized-corpus parity fuzz: C++ metric backend vs pure-Python.

The fixed parity tests (test_native_metrics.py) compare one small corpus;
these sweep random corpora — variable caption/reference counts and lengths,
heavy n-gram overlap from a tiny vocabulary (stresses CIDEr tf-idf and BLEU
clipping), single-word and repeated-word captions (ROUGE/METEOR edge
alignments) — and random punctuation strings for the PTB tokenizer.
"""

import numpy as np
import pytest

from navc_tpu.metrics import (corpus_bleu, corpus_cider, corpus_meteor,
                              corpus_rouge_l, ptb_tokenize)
from navc_tpu.native import lib as native

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library unavailable")

VOCAB = ("a the man woman dog cat is are runs jumps playing cooking guitar "
         "ball park kitchen field stage fast red small two on in with and "
         "outdoors loudly").split()


def random_corpus(rng: np.random.RandomState, n_vids: int):
    def caption():
        n = rng.randint(1, 12)
        return " ".join(rng.choice(VOCAB) for _ in range(n))

    gts = {"v%d" % i: [caption() for _ in range(rng.randint(1, 5))]
           for i in range(n_vids)}
    res = {"v%d" % i: [caption()] for i in range(n_vids)}
    # edge shapes: duplicated hypothesis tokens, single-word rows
    res["v0"] = [" ".join(["the"] * rng.randint(1, 6))]
    res["v1"] = [str(rng.choice(VOCAB))]
    return gts, res


@needs_native
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_scorer_parity_random_corpora(seed):
    rng = np.random.RandomState(seed)
    for _ in range(3):
        gts, res = random_corpus(rng, n_vids=int(rng.randint(3, 9)))

        py_bleu, _ = corpus_bleu(res, gts)
        np.testing.assert_allclose(native.bleu_corpus(res, gts), py_bleu,
                                   rtol=1e-10, atol=1e-12)

        py_cider, py_per = corpus_cider(res, gts)
        c_cider, c_per = native.cider_corpus(res, gts)
        assert abs(c_cider - py_cider) < 1e-10
        np.testing.assert_allclose(c_per, py_per, rtol=1e-10, atol=1e-12)

        py_rouge, py_per = corpus_rouge_l(res, gts)
        c_rouge, c_per = native.rouge_corpus(res, gts)
        assert abs(c_rouge - py_rouge) < 1e-10
        np.testing.assert_allclose(c_per, py_per, rtol=1e-10, atol=1e-12)

        py_met, py_per = corpus_meteor(res, gts)
        c_met, c_per = native.meteor_corpus(res, gts)
        assert abs(c_met - py_met) < 1e-10
        np.testing.assert_allclose(c_per, py_per, rtol=1e-10, atol=1e-12)


@needs_native
@pytest.mark.parametrize("seed", [7, 8, 9])
def test_native_tokenizer_parity_random_text(seed):
    """Adversarial text pieces exercise every sequential-rewrite quirk the
    C++ pipeline must reproduce: acronym periods ("u.s.a." splits only at
    line end), comma/colon kept before digits, contractions left whole when
    punctuation follows ("don't," stays one token), word-final quotes,
    gonna/cannot-class splits, quote runs."""
    rng = np.random.RandomState(seed)
    pieces = (VOCAB + list(",.!?;:'\"-()[]{}")
              + ["--", "...", "don't", "it's", "10:30", "3.14", "U.S.A.",
                 "10,000", "dogs'", "''", "can't", "we're", "I'll",
                 "they've", "he'd", "I'm", "gonna", "wanna", "cannot",
                 "gimme"])
    for _ in range(120):
        n = rng.randint(1, 15)
        sep = [" ", "", "  "][rng.randint(3)]
        text = sep.join(str(rng.choice(pieces)) for _ in range(n))
        assert native.tokenize(text) == ptb_tokenize(text), repr(text)
