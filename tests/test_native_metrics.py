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


@needs_native
def test_native_porter_matches_nltk_original():
    from nltk.stem.porter import PorterStemmer
    s = PorterStemmer(mode="ORIGINAL_ALGORITHM")
    words = ("running flies died agreed plastered motoring sing conflated "
             "troubled sized hopping tanned falling hissing fizzed failing "
             "filing happy sky relational conditional rational valenci "
             "hesitanci digitizer conformabli radicalli differentli vileli "
             "analogousli vietnamization predication operator feudalism "
             "decisiveness hopefulness callousness formaliti sensitiviti "
             "sensibiliti triplicate formative formalize electriciti "
             "electrical hopeful goodness revival allowance inference "
             "airliner gyroscopic adjustable defensible irritant replacement "
             "adjustment dependent adoption communism activate angulariti "
             "homologous effective bowdlerize probate rate cease roll "
             "a man is walking dogs cats playing jumped").split()
    mismatches = [(w, native.porter_stem(w), s.stem(w))
                  for w in words if native.porter_stem(w) != s.stem(w)]
    assert not mismatches, mismatches


@needs_native
def test_native_rouge_matches_python():
    from navc_tpu.metrics import corpus_rouge_l
    py_score, py_per = corpus_rouge_l(RES, GTS)
    c_score, c_per = native.rouge_corpus(RES, GTS)
    assert abs(c_score - py_score) < 1e-10
    np.testing.assert_allclose(c_per, py_per, rtol=1e-10)


@needs_native
def test_native_meteor_matches_python():
    from navc_tpu.metrics import corpus_meteor
    py_score, py_per = corpus_meteor(RES, GTS)
    c_score, c_per = native.meteor_corpus(RES, GTS)
    assert abs(c_score - py_score) < 1e-10
    np.testing.assert_allclose(c_per, py_per, rtol=1e-10)


def test_native_control_bytes_and_nonascii_safe():
    """Tokens containing \\x1f must not corrupt n-gram order bookkeeping
    (it segfaulted via out-of-bounds writes before), and non-ASCII corpora
    must route to the Python scorers so scores never depend on whether the
    native library happens to be built."""
    from navc_tpu.metrics.bleu import corpus_bleu
    from navc_tpu.metrics.rouge import corpus_rouge_l
    from navc_tpu.native import lib as native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    # \x1f is str.split() whitespace in python AND a separator in C++ now
    hyps = {"v0": ["a\x1fdog runs a\x1fdog runs a\x1fdog runs"]}
    refs = {"v0": ["a dog runs fast", "the dog is running"]}
    want, _ = corpus_bleu(hyps, refs)
    got = native.bleu_corpus(hyps, refs)
    assert all(abs(a - b) < 1e-9 for a, b in zip(want, got))

    # non-ASCII: native wrappers fall back to the python implementations
    hyps2 = {"v0": ["a café near the beach"], "v1": ["a dog runs"]}
    refs2 = {"v0": ["the café by the sea"], "v1": ["a dog runs"]}
    want_r = corpus_rouge_l(hyps2, refs2)
    got_r = native.rouge_corpus(hyps2, refs2)
    assert abs(want_r[0] - got_r[0]) < 1e-9
    assert native.tokenize("A CAFÉ near the beach")[1] == "café"
