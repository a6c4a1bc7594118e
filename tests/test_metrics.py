"""Metric-stack tests.

Golden values for BLEU/ROUGE-L/CIDEr were produced once by running the
official pycocoevalcap implementations (the same code the reference's
COCOScorer calls, misc/cocoeval.py:69-75) on the corpus below; our
from-scratch implementations must reproduce them.
"""

import math
import os

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


def test_meteor15_phrase_paraphrase_golden():
    # phrase table: "soccer" <-> "association football" (1 <-> 2 words).
    # hyp  "the players play soccer outside" (5 words)
    # ref  "the players play association football outside" (6 words)
    # word matches the/players/play/outside at w=1.0; phrase match covers
    # soccer <-> association+football at w=0.6, counting (1+2)/2 = 1.5
    # matches. All spans align in order -> ONE chunk; m = 5.5, frag = 1/5.5.
    # P: wc = 1+1+0.6+1 = 3.6, wf = 1 (the); num = .75*3.6+.25 = 2.95,
    #    den = .75*4+.25 = 3.25 -> P = 0.907692
    # R: wc = 1+1+0.6+0.6+1 = 4.2, wf = 1; num = 3.4, den = 4.0 -> R = 0.85
    # Fmean = PR/(.85P+.15R) = 0.858181; pen = 0.6*(1/5.5)**0.2 = 0.426659
    # score = 0.858181 * 0.573341 = 0.492032
    from navc_tpu.metrics.meteor15 import load_paraphrases_tsv
    import tempfile, os as _os
    with tempfile.NamedTemporaryFile("w", suffix=".tsv", delete=False) as f:
        f.write("soccer\tassociation football\n")
        path = f.name
    try:
        table = load_paraphrases_tsv(path)
    finally:
        _os.unlink(path)
    s = m15(paraphrases=table)
    got = s.sentence("the players play soccer outside",
                     ["the players play association football outside"])
    assert abs(got - 0.492032) < 1e-4, got
    # without the table the phrase words cannot match: 4 matches, 2 chunks
    plain = m15()
    assert plain.sentence("the players play soccer outside",
                          ["the players play association football outside"]) < got


def test_meteor15_phrase_one_to_one_coverage():
    # a ref span consumed by a phrase match cannot be re-matched: table maps
    # "big" <-> "large huge"; ref has ONE "large huge" span but hyp says
    # "big big" -> only one phrase match may apply (one-to-one at the word
    # level, meteor-1.5 aligner rule)
    table = {("big",): {("large", "huge")}, ("large", "huge"): {("big",)}}
    s = m15(paraphrases=table)
    m, chunks, _, pairs = s._align("big big".split(), "large huge".split())
    assert len(pairs) == 1
    assert m == 1.5


def test_meteor15_against_nltk_external_oracle():
    """External validation: nltk's independently-implemented METEOR
    (Banerjee & Lavie 2005 scoring: alpha=0.9, beta=3, gamma=0.5, uniform
    stage weights, no content/function weighting) must agree with this
    aligner+scorer parameterized to that model. delta=0.5 makes the
    content/function split a no-op; identity_rule off (nltk penalizes even
    exact matches); examples use within-sentence-unique words so any
    correct aligner produces the identical match set and chunk count."""
    import pytest as _pytest
    try:
        from nltk.stem.snowball import SnowballStemmer
        from nltk.translate.meteor_score import single_meteor_score
    except Exception:
        _pytest.skip("nltk unavailable")

    class _NoWordnet:
        @staticmethod
        def synsets(word):
            return []

    nav = Meteor15(synonyms=None, paraphrases=None, function_words=set(),
                   alpha=0.9, beta=3.0, gamma=0.5, delta=0.5,
                   weights=(1.0, 1.0, 1.0, 1.0), identity_rule=False)
    # both sides use the Snowball English stemmer (the one the meteor-1.5
    # jar embeds); nltk's meteor_score remains an independent oracle for
    # the ALIGNMENT and SCORING model (match set, chunks, fmean, penalty)
    stem = SnowballStemmer("english")
    cases = [
        ("the cat sat on a mat", "a cat was sitting on the mat"),
        ("a quick brown fox jumped over lazy dogs",
         "a fast brown fox leaps over the lazy dog"),
        ("the dogs jumped over fences", "a dog jumps over the fence"),
        ("a man slicing some bread", "a woman slices the bread"),
        ("completely different words here", "nothing matches at all"),
    ]
    for hyp, ref in cases:
        want = single_meteor_score(ref.split(), hyp.split(),
                                   stemmer=stem, wordnet=_NoWordnet)
        got = nav.sentence(hyp, [ref])
        assert abs(got - want) < 1e-9, (hyp, got, want)


# ---------------------------------------------------------------------------
# Live default_scorer path: vendored tables make all FOUR stages and the
# content/function weighting active in production eval (VERDICT r3 #4).
# Goldens hand-derived from the published METEOR 1.5 scoring model
# (Denkowski & Lavie, "Meteor Universal", WACL 2014: alpha=.85, beta=.2,
# gamma=.6, delta=.75, stage weights 1.0/0.6/0.8/0.6).
# ---------------------------------------------------------------------------


def _live_scorer():
    import navc_tpu.metrics.meteor15 as m
    # fresh instance with the vendored tables regardless of singleton state
    saved, m._DEFAULT = m._DEFAULT, None
    try:
        s = m.default_scorer()
    finally:
        m._DEFAULT = saved
    return s


def test_default_scorer_ships_all_tables():
    s = _live_scorer()
    assert s.synonyms and len(s.synonyms) > 100       # synonym stage armed
    assert s.para_phrases and len(s.para_phrases) > 100   # paraphrase stage
    assert s.max_phrase_len >= 3                       # multi-word spans
    assert len(s.function_words) > 100                 # content/function split
    assert "the" in s.function_words and "cat" not in s.function_words


def test_default_scorer_synonym_stage_live():
    # "man" ~ "guy" via data/synonym-en.tsv (w=0.8); both content words;
    # P = R = .75*.8/.75 = 0.8; single full-cover chunk -> identity rule,
    # no fragmentation penalty; Fmean(0.8, 0.8) = 0.8.
    s = _live_scorer()
    assert abs(s.sentence("man", ["guy"]) - 0.8) < 1e-9


def test_default_scorer_paraphrase_and_fw_live():
    # hyp "the man naps right now" / ref "the man naps now".
    # Matches: the/man/naps exact (w=1); phrase "right now"<->"now" from
    # data/paraphrase-en.tsv (w=0.6, (2+1)/2 = 1.5 matches). All in order ->
    # ONE chunk; m = 4.5; frag = 1/4.5.
    # fw list: the, now ARE function words; right is not.
    # P: wc = man+naps+right = 1+1+.6 = 2.6; wf = the+now = 1+.6 = 1.6
    #    num = .75*2.6+.25*1.6 = 2.35; den = .75*3+.25*2 = 2.75
    # R: wc = 2.0, wf = 1.6; num = 1.9; den = 2.0
    # P = .854545, R = .95; Fmean = PR/(.85P+.15R) = .934349
    # pen = .6*(1/4.5)**.2 = .444116; score = .934349*.555884 = .519376
    s = _live_scorer()
    got = s.sentence("the man naps right now", ["the man naps now"])
    assert abs(got - 0.519376) < 1e-4, got
    st = s._segment_stats("the man naps right now".split(),
                          "the man naps now".split())
    assert st == {"m": 4.5, "chunks": 1, "p_num": 2.35, "p_den": 2.75,
                  "r_num": 1.9, "r_den": 2.0}


def test_default_scorer_all_four_stages_one_segment():
    # hyp "a guy chops a lot of tomatoes" / ref "a man chopped many tomatoes"
    # exercises every stage at once:
    #   a<->a            exact    1.0  (function word)
    #   guy<->man        SYNONYM  0.8  (data/synonym-en.tsv)
    #   chops<->chopped  STEM     0.6  (Snowball: chop)
    #   a lot of<->many  PHRASE   0.6  ((3+1)/2 = 2 matches; a/of are fw)
    #   tomatoes<->...   exact    1.0
    # m = 6, one ordered chunk; frag = 1/6.
    # P: wc = .8+.6+.6+1 = 3.0; wf = 1+.6+.6 = 2.2 -> num 2.8, den 3.75
    # R: wc = .8+.6+.6+1 = 3.0; wf = 1.0       -> num 2.5, den 3.25
    # P = .746667, R = .769231, Fmean = .765760
    # pen = .6*(1/6)**.2 = .419296; score = .765760*.580704 = .444679
    s = _live_scorer()
    got = s.sentence("a guy chops a lot of tomatoes",
                     ["a man chopped many tomatoes"])
    assert abs(got - 0.444679) < 1e-4, got
    st = s._segment_stats("a guy chops a lot of tomatoes".split(),
                          "a man chopped many tomatoes".split())
    assert st["m"] == 6.0 and st["chunks"] == 1
    assert abs(st["p_num"] - 2.8) < 1e-12 and st["p_den"] == 3.75
    assert abs(st["r_num"] - 2.5) < 1e-12 and st["r_den"] == 3.25


def test_default_scorer_bare_env_gate(monkeypatch):
    import navc_tpu.metrics.meteor15 as m
    monkeypatch.setenv("NAVC_METEOR_BARE", "1")
    monkeypatch.setattr(m, "_DEFAULT", None)
    s = m.default_scorer()
    assert s.synonyms is None and not s.para_phrases
    # exact+stem still work; synonym pair no longer matches
    assert s.sentence("man", ["guy"]) == 0.0


# ---------------------------------------------------------------------------
# Expanded paraphrase table (VERDICT r4 #5): programmatic derivation,
# live-path loading, and table-size sensitivity.
# ---------------------------------------------------------------------------


def test_expanded_table_matches_generator():
    """The committed expanded table must be exactly what the generator
    emits (deterministic regeneration contract)."""
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, "scripts/make_meteor_tables.py", "--check"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout + r.stderr


def test_expanded_table_on_live_path(monkeypatch):
    import navc_tpu.metrics.meteor15 as m
    monkeypatch.setattr(m, "_DEFAULT", None)
    s = m.default_scorer()
    # far beyond the 169-line curated core
    assert len(s.para_phrases) > 5000
    # suppletive verb family bridged (Porter cannot): went <-> goes
    assert s.sentence("the man went home", ["the man goes home"]) > \
        s.sentence("the man went home", ["the man sees home"])
    # progressive <-> finite multi-word bridge: "is running" <-> "runs"
    hi = s.sentence("a dog is running", ["a dog runs"])
    lo = s.sentence("a dog is running", ["a dog barks"])
    assert hi > lo
    # NAVC_METEOR_TABLE=curated selects the hand-curated core
    monkeypatch.setenv("NAVC_METEOR_TABLE", "curated")
    monkeypatch.setattr(m, "_DEFAULT", None)
    s2 = m.default_scorer()
    assert len(s2.para_phrases) < 1000


def test_meteor_table_sensitivity_ordering():
    """bare <= curated <= expanded on equivalence pairs; identical on
    unrelated controls (precision) — the committed METEOR_TABLE_AB.json
    protocol in miniature."""
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    from meteor_table_ab import CONTROL, EQUIVALENT, build_scorer, score_pairs
    eq, ctl = {}, {}
    for level in ("bare", "curated", "expanded"):
        sc = build_scorer(level)
        eq[level] = score_pairs(sc, EQUIVALENT[:12])
        ctl[level] = score_pairs(sc, CONTROL[:6])
    assert eq["bare"] <= eq["curated"] <= eq["expanded"]
    assert eq["expanded"] > eq["curated"]  # the expansion must buy recall
    assert ctl["bare"] == ctl["curated"] == ctl["expanded"]  # no inflation
