"""Metric-stack tests.

Golden values for BLEU/ROUGE-L/CIDEr were produced once by running the
official pycocoevalcap implementations (the same code the reference's
COCOScorer calls, misc/cocoeval.py:69-75) on the corpus below; our
from-scratch implementations must reproduce them.
"""

import math

import numpy as np
import pytest

from navc_tpu.metrics import (
    COCOScorer, corpus_bleu, corpus_cider, corpus_meteor, corpus_rouge_l,
    ptb_tokenize, tokenize_corpus)
from navc_tpu.metrics.rouge import lcs_length

GTS = {
    "v1": ["a man is playing a guitar on stage", "a person plays guitar",
           "the man plays an instrument"],
    "v2": ["a dog runs in the park", "the dog is running outside",
           "a brown dog running on grass"],
    "v3": ["someone is cooking food in a kitchen", "a woman cooks a meal",
           "a person is preparing food"],
    "v4": ["kids are playing soccer", "children kick a ball on a field",
           "boys play football outdoors"],
}
RES = {
    "v1": ["a man plays a guitar"],
    "v2": ["a dog is running in the grass"],
    "v3": ["a woman is cooking in a kitchen"],
    "v4": ["children are playing soccer on a field"],
}

# produced by pycocoevalcap Bleu(4)/Rouge()/Cider() on (GTS, RES)
GOLDEN_BLEU = [1.0, 0.8257228238, 0.5331122821, 5.73564e-05]
GOLDEN_ROUGE = 0.6932232149
GOLDEN_ROUGE_PER = [0.7697160883, 0.6240409207, 0.7142857143, 0.6648501362]
GOLDEN_CIDER = 1.9494289844
GOLDEN_CIDER_PER = [2.0506277669, 2.3561440434, 1.5156190943, 1.8753250331]


def test_bleu_matches_official():
    scores, per_img = corpus_bleu(RES, GTS)
    np.testing.assert_allclose(scores, GOLDEN_BLEU, rtol=1e-6)


def test_rouge_matches_official():
    score, per_img = corpus_rouge_l(RES, GTS)
    assert abs(score - GOLDEN_ROUGE) < 1e-7
    np.testing.assert_allclose(per_img, GOLDEN_ROUGE_PER, rtol=1e-6)


def test_cider_matches_official():
    score, per_img = corpus_cider(RES, GTS)
    assert abs(score - GOLDEN_CIDER) < 1e-7
    np.testing.assert_allclose(per_img, GOLDEN_CIDER_PER, rtol=1e-6)


def test_lcs():
    assert lcs_length("a b c d".split(), "a x c d".split()) == 3
    assert lcs_length([], ["a"]) == 0


def test_meteor_sanity():
    """METEOR-equivalent: identity scores highest, disjoint scores zero,
    stem matches count."""
    perfect = corpus_meteor({"v": ["a man is running"]},
                            {"v": ["a man is running"]})[0]
    partial = corpus_meteor({"v": ["a man is walking"]},
                            {"v": ["a man is running"]})[0]
    disjoint = corpus_meteor({"v": ["blue sky above"]},
                             {"v": ["a man is running"]})[0]
    assert perfect > partial > disjoint == 0.0
    assert abs(perfect - 0.5) > 0.3  # identity ~ 1 - gamma*(1/m)^beta ~ 0.99+
    # stemming: 'running' ~ 'runs' should beat completely different word
    stemmed = corpus_meteor({"v": ["the dog running"]}, {"v": ["the dog runs"]})[0]
    unstemmed = corpus_meteor({"v": ["the dog sleeping"]}, {"v": ["the dog runs"]})[0]
    assert stemmed > unstemmed


def test_ptb_tokenizer():
    assert ptb_tokenize("A man, playing guitar!") == ["a", "man", "playing", "guitar"]
    assert ptb_tokenize("the dog's ball") == ["the", "dog", "'s", "ball"]
    assert ptb_tokenize("don't stop") == ["do", "n't", "stop"]
    assert ptb_tokenize("Hello... world") == ["hello", "world"]
    out = tokenize_corpus({"v": [{"caption": "A Man runs."}]})
    assert out == {"v": ["a man runs"]}


def test_cocoscorer_end_to_end():
    gt = {v: [{"image_id": v, "cap_id": i, "caption": c} for i, c in enumerate(caps)]
          for v, caps in GTS.items()}
    pred = {v: [{"image_id": v, "caption": caps[0]}] for v, caps in RES.items()}
    scorer = COCOScorer()
    summary, detail = scorer.score(gt, pred, pred.keys())
    for k in ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"]:
        assert k in summary
    assert abs(summary["Bleu_1"] - GOLDEN_BLEU[0]) < 1e-6
    assert abs(summary["CIDEr"] - GOLDEN_CIDER) < 1e-6
    assert abs(summary["ROUGE_L"] - GOLDEN_ROUGE) < 1e-6
    assert "v1" in detail and "CIDEr" in detail["v1"]
