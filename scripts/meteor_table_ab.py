"""METEOR paraphrase-table size sensitivity A/B (VERDICT r4 #5).

The jar's PPDB table is absent upstream (.MISSING_LARGE_BLOBS:3); this repo
ships a 169-line hand-curated core plus a ~5.2k-pair programmatic expansion
(scripts/make_meteor_tables.py). This A/B quantifies what each table level
buys, on two text populations:

  1. an ENGLISH caption-equivalence fixture — 40 meaning-preserving
     MSR-VTT-register caption pairs exercising the phenomena the tables
     target (progressive<->finite phrasing, irregular verb/noun forms,
     synonym swaps, phrase paraphrases, contractions, number words) plus 10
     non-equivalent control pairs (precision guard: bigger tables must NOT
     inflate scores of unrelated captions);
  2. the FLAGSHIP synthetic corpus's oracle predictions — the campaign's
     tokens ("subj3a"...) are outside English morphology, so the expanded
     table must leave flagship METEOR essentially unchanged (comparability
     guard for FLAGSHIP_E2E.json across rounds).

Writes METEOR_TABLE_AB.json with corpus METEOR under bare / curated /
expanded for both populations.

    python scripts/meteor_table_ab.py
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

# (hypothesis, reference) — meaning-preserving surface variation
EQUIVALENT = [
    ("a man is running on the beach", "a man runs along the beach"),
    ("the woman sliced a tomato", "the woman is slicing a tomato"),
    ("two children are playing soccer", "2 kids are playing soccer"),
    ("a guy went to the store", "a man goes to the store"),
    ("a chef is chopping onions quickly", "a chef chops onions in a quick way"),
    ("the dog ran after the ball", "the dog is running after the ball"),
    ("a woman is singing a song", "a lady sang a song"),
    ("the boy has eaten the cake", "the boy ate the cake"),
    ("a person is riding a horse", "an individual rode a horse"),
    ("three men are swimming in a pool", "3 men swam in a pool"),
    ("a child is drawing a picture", "a kid drew a picture"),
    ("the cat caught a mouse", "the cat is catching a mouse"),
    ("a man is driving a car", "a man drove an automobile"),
    ("she put the knives on the shelves", "she is putting the knife on the shelf"),
    ("a group of people are dancing", "many people danced"),
    ("the players won the game", "the players are winning the game"),
    ("a girl is brushing her teeth", "a girl brushed her tooth"),
    ("an old man is feeding the geese", "an old man fed the goose"),
    ("a woman is speaking to the camera", "a woman spoke to the camera"),
    ("the kids built a sandcastle", "the children are building a sandcastle"),
    ("a man is throwing a ball", "a man threw a ball"),
    ("someone is frying an egg in a pan", "someone fried an egg in a pan"),
    ("a band is performing on stage", "a band performs on stage"),
    ("the bird flew over the lake", "the bird is flying over the lake"),
    ("a lady is mixing flour in a bowl", "a lady mixes flour in a bowl"),
    ("two dogs are fighting over a toy", "two dogs fought over a toy"),
    ("a man doesn't like the food", "a man does not like the food"),
    ("the runner fell on the track", "the runner is falling on the track"),
    ("a woman is teaching a class", "a woman taught a class"),
    ("he is wearing a red shirt", "he wore a red shirt"),
    ("a boy is hiding behind a tree", "a boy hid behind a tree"),
    ("the chef tasted the soup slowly", "the chef tastes the soup in a slow way"),
    ("a man is more careful than before", "a man is carefuler than before"),
    ("a faster car overtook the truck", "a more fast car overtook the truck"),
    ("the audience clapped loudly", "the audience is clapping in a loud way"),
    ("a woman bought a lot of vegetables", "a woman bought many vegetables"),
    ("the team is going to win", "the team went to win"),
    ("a man is cutting a piece of wood", "a man cut a piece of wood"),
    ("five women are cooking dinner", "5 women cooked dinner"),
    ("a kid is jumping on the bed", "a kid jumped on the bed"),
]

# unrelated pairs — precision guard: tables must not inflate these
CONTROL = [
    ("a man is running on the beach", "a cat sleeps on the sofa"),
    ("two children are playing soccer", "a chef seasons the steak"),
    ("a woman is singing a song", "trucks are parked near the warehouse"),
    ("the dog ran after the ball", "a pilot lands the plane at night"),
    ("a chef is chopping onions", "students are reading in the library"),
    ("a girl is brushing her teeth", "the orchestra tunes its instruments"),
    ("a man is driving a car", "a farmer waters the crops"),
    ("the bird flew over the lake", "a tailor measures the fabric"),
    ("a band is performing on stage", "the fisherman repairs his net"),
    ("a boy is hiding behind a tree", "a barista steams the milk"),
]


def build_scorer(level: str):
    from navc_tpu.metrics.meteor15 import (Meteor15, load_function_words,
                                           load_paraphrases_tsv,
                                           load_synonyms_tsv)
    data = os.path.join(ROOT, "navc_tpu", "metrics", "data")
    if level == "bare":
        return Meteor15(synonyms=None, paraphrases=None)
    table = {"curated": "paraphrase-en.tsv",
             "expanded": "paraphrase-en-expanded.tsv"}[level]
    return Meteor15(
        synonyms=load_synonyms_tsv(os.path.join(data, "synonym-en.tsv")),
        paraphrases=load_paraphrases_tsv(os.path.join(data, table)),
        function_words=load_function_words(
            os.path.join(data, "function-words-en.txt")))


def score_pairs(scorer, pairs):
    hyps = {str(i): [h] for i, (h, _) in enumerate(pairs)}
    refs = {str(i): [r] for i, (_, r) in enumerate(pairs)}
    corpus, _ = scorer.corpus(hyps, refs)
    return round(float(corpus), 4)


def flagship_oracle_pairs():
    """Oracle predictions vs references on the flagship synthetic corpus's
    test split — the text population FLAGSHIP_E2E.json scores live on."""
    from collections import Counter, defaultdict

    from navc_tpu.config import default_config
    from navc_tpu.data.synthetic import make_hard_synthetic

    cfg = default_config("NACF", dataset="MSRVTT", vocab_size=10048,
                         n_frames=8, n_total_frames=16)
    corpus, refs, _ = make_hard_synthetic(
        cfg, n_videos=768, n_classes=128, vocab_size=10048, n_caps=4,
        n_total_frames=16, role_features=True, modifier_distractors=True)
    info = corpus["info"]
    itow = info["itow"]
    video_class = {v: v % 128 for v in range(768)}
    class_caps = defaultdict(Counter)
    for v in info["split"]["train"]:
        for c in corpus["captions"]["video%d" % v]:
            class_caps[video_class[v]][tuple(c[1:-1])] += 1
    pairs = []
    for v in info["split"]["test"]:
        cc = class_caps[video_class[v]]
        if not cc:
            continue
        hyp = " ".join(itow[w] for w in cc.most_common(1)[0][0])
        for r in refs["video%d" % v]:
            pairs.append((hyp, r["caption"]))
            break  # one ref per video keeps this a quick corpus probe
    return pairs


def main():
    report = {
        "protocol": __doc__.split("\n\n")[1].replace("\n", " "),
        "n_pairs": {"equivalent": len(EQUIVALENT), "control": len(CONTROL)},
        "tables": {},
    }
    flagship = flagship_oracle_pairs()
    report["n_pairs"]["flagship_oracle"] = len(flagship)
    for level in ("bare", "curated", "expanded"):
        sc = build_scorer(level)
        report["tables"][level] = {
            "equivalent_METEOR": score_pairs(sc, EQUIVALENT),
            "control_METEOR": score_pairs(sc, CONTROL),
            "flagship_oracle_METEOR": score_pairs(sc, flagship),
        }
    t = report["tables"]
    report["findings"] = {
        "equivalence_recall_gain_expanded_vs_curated": round(
            t["expanded"]["equivalent_METEOR"]
            - t["curated"]["equivalent_METEOR"], 4),
        "equivalence_recall_gain_curated_vs_bare": round(
            t["curated"]["equivalent_METEOR"]
            - t["bare"]["equivalent_METEOR"], 4),
        "control_drift_expanded_vs_bare": round(
            t["expanded"]["control_METEOR"] - t["bare"]["control_METEOR"], 4),
        "flagship_drift_expanded_vs_bare": round(
            t["expanded"]["flagship_oracle_METEOR"]
            - t["bare"]["flagship_oracle_METEOR"], 4),
    }
    report["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S%z")
    out = os.path.join(ROOT, "METEOR_TABLE_AB.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(json.dumps(report["tables"], indent=1))
    print(json.dumps(report["findings"], indent=1))


if __name__ == "__main__":
    main()
