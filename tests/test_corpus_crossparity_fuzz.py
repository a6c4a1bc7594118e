"""Cross-implementation fuzz of offline corpus preparation vs the ACTUAL
reference misc/utils_corpora.py.

Covers, with randomized adversarial inputs:
  * preprocess_MSRVTT (utils_corpora.py:13-65): split construction, the
    tokenize-lowercase-after-punctuation-filter quirk (membership tested on
    the ORIGINAL token), references cap_id numbering, itoc / split_category;
  * preprocess_Youtube2Text (utils_corpora.py:68-114): fixed 1200/100/670
    splits, lowercase().split() tokenization, train subset aliasing;
  * build_vocab (utils_corpora.py:117-154): <=threshold filtering in dict
    insertion order, optional stable frequency sort;
  * get_length_info (utils_corpora.py:157-169): 50-bin histograms with
    out-of-range lengths dropped;
  * get_captions_and_pos_tags (utils_corpora.py:172-222): id-ification with
    UNK fallback, first-seen POS id assignment from 6 upward, itop inversion
    — the nltk tagger itself is stubbed deterministically on BOTH sides
    (its model data is absent from this machine and from the reference
    checkout alike; the logic around it is what must match).
"""

import json
import pickle
import string
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

# the reference imports wget for annotation downloads (utils_corpora.py:16-19,
# 73-81); this environment has no wget module and no egress — every input
# file is pre-created on disk, so a bare stub suffices
import types  # noqa: E402

sys.modules.setdefault("wget", types.ModuleType("wget"))

import misc.utils_corpora as ref_uc  # noqa: E402

from navc_tpu import constants as C  # noqa: E402
from navc_tpu.data import corpus as my_c  # noqa: E402

PENN_TAGS = sorted(C.pos_tag_mapping.keys())

WORD_POOL = (["cat", "DOG", "Running", "the", "a", "IS", "nicely", "it's",
              "sees,", "!", ",", ".", "?", "'", "x" * 30, "12", "über"]
             + ["w%d" % i for i in range(40)])


def normalize(obj):
    """defaultdicts -> dicts, tuples -> lists, for == comparison."""
    if isinstance(obj, dict):
        return {k: normalize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [normalize(v) for v in obj]
    return obj


def fake_pos_tag(tokens):
    """Deterministic stand-in for nltk.pos_tag: tag by character sum."""
    return [(w, PENN_TAGS[sum(map(ord, w)) % len(PENN_TAGS)]) for w in tokens]


def random_caption(rng, min_len=1, max_len=12):
    n = int(rng.randint(min_len, max_len + 1))
    return " ".join(WORD_POOL[i] for i in rng.randint(0, len(WORD_POOL), n))


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("trial", range(4))
def test_preprocess_msrvtt_exact(tmp_path, trial):
    rng = np.random.RandomState(trial)
    n_videos = int(rng.randint(5, 12))
    videos, sentences = [], []
    for v in range(n_videos):
        videos.append({
            "id": v,
            "split": ["train", "validate", "test"][int(rng.randint(3))],
            "category": int(rng.randint(4)),
        })
        for _ in range(int(rng.randint(1, 5))):
            sentences.append({"video_id": "video%d" % v,
                              "caption": random_caption(rng)})
    base = tmp_path / ("msrvtt%d" % trial)
    base.mkdir()
    with open(base / "videodatainfo.json", "w") as f:
        json.dump({"videos": videos, "sentences": sentences}, f)

    ref = ref_uc.preprocess_MSRVTT(str(base))
    mine = my_c.preprocess_msrvtt(str(base / "videodatainfo.json"))

    for key in ("split", "raw_caps_train", "raw_caps_all", "references",
                "itoc", "split_category"):
        assert normalize(ref[key]) == normalize(mine[key]), (trial, key)


@pytest.mark.parametrize("trial", range(3))
def test_preprocess_youtube2text_exact(tmp_path, trial):
    rng = np.random.RandomState(50 + trial)
    refs = {}
    # include ids straddling every split boundary
    ids = sorted(set(int(i) for i in rng.randint(0, 1970, 8))
                 | {0, 1199, 1200, 1299, 1300, 1969})
    for num in ids:
        vid = "video%d" % num
        refs[vid] = [{"image_id": vid, "cap_id": ci,
                      "caption": random_caption(rng)}
                     for ci in range(int(rng.randint(1, 4)))]
    base = tmp_path / ("msvd%d" % trial)
    base.mkdir()
    with open(base / "refs.pkl", "wb") as f:
        pickle.dump(refs, f)
    with open(base / "youtube_mapping.txt", "w") as f:
        f.write("\n".join("yt%d vid%d" % (n, n) for n in ids))

    ref = ref_uc.preprocess_Youtube2Text(str(base))
    mine = my_c.preprocess_youtube2text(str(base / "refs.pkl"))

    for key in ("split", "raw_caps_train", "raw_caps_all"):
        assert normalize(ref[key]) == normalize(mine[key]), (trial, key)


@pytest.mark.parametrize("thr", [0, 1, 2])
@pytest.mark.parametrize("sort_vocab", [False, True])
def test_build_vocab_exact(thr, sort_vocab):
    rng = np.random.RandomState(7 * thr + sort_vocab)
    caps = {}
    for v in range(6):
        caps["video%d" % v] = [
            [WORD_POOL[i] for i in rng.randint(0, len(WORD_POOL), 6)]
            for _ in range(3)]
    ref = ref_uc.build_vocab(caps, thr, sort_vocab=sort_vocab)
    mine = my_c.build_vocab(caps, thr, sort_vocab=sort_vocab, verbose=False)
    assert ref == mine


@pytest.mark.parametrize("trial", range(3))
def test_length_info_exact(trial):
    rng = np.random.RandomState(90 + trial)
    caps = {}
    for v in range(5):
        caps["video%d" % v] = [
            list(range(int(n))) for n in rng.randint(2, 60, 4)]
    assert ref_uc.get_length_info(caps) == my_c.get_length_info(caps)


@pytest.mark.parametrize("trial", range(3))
def test_captions_and_pos_tags_exact(monkeypatch, trial):
    rng = np.random.RandomState(130 + trial)
    # stub the tagger identically on both sides (model data unavailable in
    # either checkout); the surrounding id-ification logic is under test
    monkeypatch.setattr(ref_uc.nltk, "pos_tag", fake_pos_tag)

    raw = {}
    for v in range(6):
        raw["video%d" % v] = [random_caption(rng).split()
                              for _ in range(int(rng.randint(1, 4)))]
    vocab = my_c.build_vocab(raw, 1, verbose=False)

    r_itow, r_caps, r_itop, r_tags = ref_uc.get_captions_and_pos_tags(raw, vocab)
    m_itow, m_caps, m_itop, m_tags = my_c.get_captions_and_pos_tags(raw, vocab)

    assert r_itow == m_itow
    assert normalize(r_caps) == normalize(m_caps)
    assert r_itop == m_itop
    assert normalize(r_tags) == normalize(m_tags)
