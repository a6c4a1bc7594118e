"""C++ metric backend parity vs the pure-Python implementations."""

import numpy as np
import pytest

from navc_tpu.metrics import corpus_bleu, corpus_cider, ptb_tokenize
from navc_tpu.native import lib as native

from test_metrics import GTS, RES

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library unavailable")


@needs_native
def test_native_tokenizer_matches_python():
    cases = [
        "A man, playing guitar!",
        "the dog's ball",
        "don't stop",
        "Hello... world",
        "a cat -- a black one -- sleeps.",
        "someone said \"hello there\" loudly",
        "it's 10:30 already",
    ]
    for text in cases:
        assert native.tokenize(text) == ptb_tokenize(text), text


@needs_native
def test_native_bleu_matches_python():
    py_scores, _ = corpus_bleu(RES, GTS)
    c_scores = native.bleu_corpus(RES, GTS)
    np.testing.assert_allclose(c_scores, py_scores, rtol=1e-10)


@needs_native
def test_native_cider_matches_python():
    py_score, py_per = corpus_cider(RES, GTS)
    c_score, c_per = native.cider_corpus(RES, GTS)
    assert abs(c_score - py_score) < 1e-10
    np.testing.assert_allclose(c_per, py_per, rtol=1e-10)
