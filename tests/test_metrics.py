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


# ---------------------------------------------------------------------------
# METEOR 1.5 goldens (hand-computed from the published scoring model:
# alpha=0.85, beta=0.2, gamma=0.6, delta=0.75, weights 1.0/0.6/0.8/0.6)
# ---------------------------------------------------------------------------

from navc_tpu.metrics.meteor15 import Meteor15


def m15(**kw):
    return Meteor15(synonyms=kw.pop("synonyms", None), **kw)


def test_meteor15_identity_scores_one():
    s = m15()
    assert s.sentence("a man is playing a guitar",
                      ["a man is playing a guitar"]) == 1.0


def test_meteor15_golden_partial_match():
    # hyp "the cat sat" vs ref "the cat jumped":
    # matches the(fw) + cat(content) at weight 1.0, one chunk of 2, m=2
    # P = R = (0.75*1 + 0.25*1) / (0.75*2 + 0.25*1) = 1/1.75
    # Fmean = P; frag = 0.5; pen = 0.6 * 0.5**0.2
    # score = (1/1.75) * (1 - 0.6 * 0.5**0.2) = 0.272954
    s = m15()
    assert abs(s.sentence("the cat sat", ["the cat jumped"]) - 0.272954) < 1e-4


def test_meteor15_stem_stage_and_identity_rule():
    # "dogs running" vs "dog runs": both stem-match (w=0.6), the single
    # 2-word chunk spans both strings entirely -> zero chunks, no penalty
    # P = R = 0.75*1.2 / 0.75*2 = 0.6; score = 0.6
    s = m15()
    assert abs(s.sentence("dogs running", ["dog runs"]) - 0.6) < 1e-6


def test_meteor15_synonym_stage_golden():
    syn = {"man": {"c1"}, "guy": {"c1"}, "buys": {"c2"}, "purchases": {"c2"}}
    with_syn = m15(synonyms=syn)
    without = m15()
    hyp, ref = "a man buys food", ["a guy purchases food"]
    # with synonyms: all 4 matched (1.0, 0.8, 0.8, 1.0), full-cover chunk
    # P = R = (0.75*2.6 + 0.25*1) / (0.75*3 + 0.25*1) = 2.2/2.5 = 0.88
    assert abs(with_syn.sentence(hyp, ref) - 0.88) < 1e-6
    # without: only 'a' and 'food' match -> 2 chunks, frag=1
    # P = R = 1/2.5 = 0.4; score = 0.4 * (1 - 0.6) = 0.16
    assert abs(without.sentence(hyp, ref) - 0.16) < 1e-6


def test_meteor15_min_chunk_alignment_golden():
    # "on the mat sat the cat" vs "the cat sat on the mat": all 6 words
    # match; the optimal alignment has exactly 3 chunks (on-the-mat /
    # sat / the-cat), so P = R = 1, frag = 0.5,
    # score = 1 - 0.6 * 0.5**0.2 = 0.477670. A greedy first-match aligner
    # would produce more chunks and a lower score.
    s = m15()
    got = s.sentence("on the mat sat the cat", ["the cat sat on the mat"])
    assert abs(got - 0.477670) < 1e-4


def test_meteor15_corpus_micro_aggregation_golden():
    # segment stats: ("the cat sat" vs "the cat jumped") m=2 ch=1 num=1.0
    # den=1.75; ("dogs running" vs "dog runs") m=2 ch=0 num=0.9 den=1.5
    # aggregate: P = R = 1.9/3.25; frag = 1/4
    # score = (1.9/3.25) * (1 - 0.6 * 0.25**0.2) = 0.318786  (micro != macro)
    s = m15()
    hyps = {"v1": ["the cat sat"], "v2": ["dogs running"]}
    refs = {"v1": ["the cat jumped"], "v2": ["dog runs"]}
    corpus, per = s.corpus(hyps, refs)
    assert abs(corpus - 0.318786) < 1e-4
    assert abs(per[0] - 0.272954) < 1e-4 and abs(per[1] - 0.6) < 1e-6
    macro = sum(per) / 2
    assert abs(corpus - macro) > 0.05  # micro-aggregation is not the mean


def test_meteor15_multi_reference_best_wins():
    s = m15()
    one = s.sentence("a dog runs", ["a dog runs"])
    multi = s.sentence("a dog runs", ["cats sleeping", "a dog runs"])
    assert one == multi == 1.0


def test_meteor15_empty_hypothesis():
    s = m15()
    assert s.sentence("", ["a dog"]) == 0.0
