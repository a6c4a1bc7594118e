"""Train and vendor a tiny nltk averaged-perceptron POS tagger fixture.

The corpus-prep pipeline tags every caption with ``nltk.pos_tag``
(reference misc/utils_corpora.py:172-222); nltk's pretrained
``averaged_perceptron_tagger_eng`` model is a downloadable resource that is
absent in zero-egress environments, so the real tagging path used to skip in
CI (tests/test_utils_fuzz.py). This script trains nltk's own
``PerceptronTagger`` — the identical class/algorithm ``nltk.pos_tag`` loads —
on a small hand-tagged Penn-Treebank-style corpus of caption-domain
sentences, and saves the json model files in nltk's resource layout:

    tests/fixtures/nltk_data/taggers/averaged_perceptron_tagger_eng/

Tests prepend ``tests/fixtures/nltk_data`` to ``nltk.data.path`` (see
tests/conftest.py::nltk_pos_fixture) and ``nltk.pos_tag`` then works
unmodified in BOTH stacks, exercising the real perceptron path end-to-end.

Deterministic: the perceptron's shuffle uses the stdlib ``random`` module,
seeded here. Regenerate with ``python scripts/make_pos_fixture.py``.
"""

import os
import random
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(ROOT, "tests", "fixtures", "nltk_data", "taggers",
                   "averaged_perceptron_tagger_eng")

# Hand-tagged PTB-style corpus: video-caption-domain sentences covering the
# POS classes the reference's visual-word demand set cares about
# (config/Constants.py:24-46 maps PTB tags -> universal classes; the demanded
# classes are VERB/NOUN by default, opts.py visual-word flags).
TAGGED = [
    [("a", "DT"), ("man", "NN"), ("is", "VBZ"), ("playing", "VBG"),
     ("a", "DT"), ("guitar", "NN"), ("on", "IN"), ("stage", "NN")],
    [("the", "DT"), ("dog", "NN"), ("runs", "VBZ"), ("fast", "RB"),
     ("in", "IN"), ("the", "DT"), ("park", "NN")],
    [("someone", "NN"), ("is", "VBZ"), ("cooking", "VBG"), ("food", "NN"),
     ("quickly", "RB")],
    [("children", "NNS"), ("are", "VBP"), ("kicking", "VBG"), ("a", "DT"),
     ("red", "JJ"), ("ball", "NN")],
    [("a", "DT"), ("woman", "NN"), ("sings", "VBZ"), ("and", "CC"),
     ("dances", "VBZ"), ("outdoors", "RB")],
    [("two", "CD"), ("men", "NNS"), ("are", "VBP"), ("riding", "VBG"),
     ("horses", "NNS"), ("near", "IN"), ("a", "DT"), ("river", "NN")],
    [("the", "DT"), ("cat", "NN"), ("sat", "VBD"), ("on", "IN"),
     ("the", "DT"), ("mat", "NN")],
    [("a", "DT"), ("girl", "NN"), ("talks", "VBZ"), ("about", "IN"),
     ("her", "PRP$"), ("new", "JJ"), ("phone", "NN")],
    [("people", "NNS"), ("are", "VBP"), ("dancing", "VBG"), ("at", "IN"),
     ("a", "DT"), ("party", "NN")],
    [("he", "PRP"), ("slices", "VBZ"), ("vegetables", "NNS"), ("with", "IN"),
     ("a", "DT"), ("sharp", "JJ"), ("knife", "NN")],
    [("she", "PRP"), ("mixes", "VBZ"), ("flour", "NN"), ("and", "CC"),
     ("eggs", "NNS"), ("in", "IN"), ("a", "DT"), ("bowl", "NN")],
    [("a", "DT"), ("boy", "NN"), ("jumps", "VBZ"), ("over", "IN"),
     ("a", "DT"), ("small", "JJ"), ("fence", "NN")],
    [("the", "DT"), ("players", "NNS"), ("kick", "VBP"), ("the", "DT"),
     ("ball", "NN"), ("across", "IN"), ("the", "DT"), ("field", "NN")],
    [("an", "DT"), ("old", "JJ"), ("car", "NN"), ("drives", "VBZ"),
     ("down", "IN"), ("a", "DT"), ("dusty", "JJ"), ("road", "NN")],
    [("a", "DT"), ("chef", "NN"), ("is", "VBZ"), ("cutting", "VBG"),
     ("meat", "NN"), ("into", "IN"), ("pieces", "NNS")],
    [("the", "DT"), ("baby", "NN"), ("laughs", "VBZ"), ("loudly", "RB")],
    [("a", "DT"), ("group", "NN"), ("of", "IN"), ("students", "NNS"),
     ("walk", "VBP"), ("to", "TO"), ("school", "NN")],
    [("a", "DT"), ("person", "NN"), ("is", "VBZ"), ("drawing", "VBG"),
     ("a", "DT"), ("picture", "NN")],
    [("the", "DT"), ("singer", "NN"), ("performs", "VBZ"), ("a", "DT"),
     ("song", "NN"), ("on", "IN"), ("television", "NN")],
    [("monkeys", "NNS"), ("climb", "VBP"), ("tall", "JJ"), ("trees", "NNS")],
    [("a", "DT"), ("man", "NN"), ("throws", "VBZ"), ("a", "DT"),
     ("basketball", "NN"), ("into", "IN"), ("the", "DT"), ("hoop", "NN")],
    [("women", "NNS"), ("are", "VBP"), ("swimming", "VBG"), ("in", "IN"),
     ("the", "DT"), ("pool", "NN")],
    [("it", "PRP"), ("rains", "VBZ"), ("heavily", "RB"), ("outside", "RB")],
    [("the", "DT"), ("driver", "NN"), ("stops", "VBZ"), ("the", "DT"),
     ("bus", "NN"), ("at", "IN"), ("the", "DT"), ("station", "NN")],
    [("a", "DT"), ("dog", "NN"), ("and", "CC"), ("a", "DT"), ("cat", "NN"),
     ("play", "VBP"), ("together", "RB")],
    [("soldiers", "NNS"), ("march", "VBP"), ("through", "IN"),
     ("the", "DT"), ("city", "NN")],
    [("a", "DT"), ("young", "JJ"), ("girl", "NN"), ("reads", "VBZ"),
     ("a", "DT"), ("book", "NN"), ("quietly", "RB")],
    [("the", "DT"), ("teacher", "NN"), ("writes", "VBZ"), ("words", "NNS"),
     ("on", "IN"), ("the", "DT"), ("board", "NN")],
    [("birds", "NNS"), ("fly", "VBP"), ("over", "IN"), ("the", "DT"),
     ("mountains", "NNS")],
    [("a", "DT"), ("guy", "NN"), ("repairs", "VBZ"), ("his", "PRP$"),
     ("broken", "JJ"), ("bicycle", "NN")],
]


def main():
    random.seed(1234)  # PerceptronTagger.train shuffles via stdlib random
    from nltk.tag.perceptron import PerceptronTagger

    tagger = PerceptronTagger(load=False)
    tagger.train(list(TAGGED), nr_iter=8)
    os.makedirs(OUT, exist_ok=True)
    tagger.save_to_json(lang="eng", loc=OUT)
    print("wrote", sorted(os.listdir(OUT)))

    # reload through nltk's own resource discovery and sanity-tag
    import nltk
    fixture_root = os.path.dirname(os.path.dirname(OUT))
    nltk.data.path.insert(0, fixture_root)
    nltk.tag._get_tagger.cache_clear()
    tags = nltk.pos_tag("a man is playing a guitar".split())
    print("pos_tag via fixture:", tags)
    assert tags[1][1].startswith("NN") and tags[3][1].startswith("VB")


if __name__ == "__main__":
    sys.exit(main())
