"""Cross-implementation fuzz of the data pipeline vs the ACTUAL reference
torch dataloader (/root/reference/dataloader.py), item-exact.

Both stacks consume the same on-disk corpus pickle + feature arrays and are
seeded identically; every per-item tensor (tokens, labels, visual-word
pairs, taggings, length targets, categories, sampled features) must match
bit-for-bit. RNG stream alignment per reference semantics:

  * MLM masking draws come from ``RandomState(opt['seed'])``
    (dataloader.py:68, 368-369) — ours mirrors the draw order exactly, so
    NARFormer fuzz runs with frame sampling that consumes no RNG
    (equally_sampling / load_feats_type=2) to keep the streams aligned.
  * segment_random frame draws come from the GLOBAL ``np.random``
    (dataloader.py:33); the ARFormer campaigns seed it to the same value as
    our single per-dataset stream (no masking draws interleave for AR).
  * ``all_random`` uses stdlib ``random.sample`` (dataloader.py:26) — a
    different generator from our ``RandomState.choice``; semantically the
    same uniform no-replacement draw, not bit-reproducible, so excluded
    here (distributional coverage in test_misc_features.py).

Corpora are adversarial: captions shorter than min mask count, captions
longer than max_len (truncation + EOS repair), 'be'-verbs that the
visual-word demand filter must skip (dataloader.py:404), videos missing
from one modality store (zero-fill, dataloader.py:276-279), 1-D per-video
features broadcast over time (dataloader.py:281-285), length histograms
spilling past max_len.
"""

import pickle
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
h5py = pytest.importorskip("h5py")

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import dataloader as ref_dataloader  # noqa: E402  (reference torch code)

from navc_tpu import constants as C  # noqa: E402
from navc_tpu.config import Config, resolve  # noqa: E402
from navc_tpu.data.dataset import VideoDataset  # noqa: E402

METHOD_KNOBS = {
    "ARB": ("ARFormer", False),
    "ARB2": ("ARFormer", True),
    "NAB": ("NARFormer", False),
    "NACF": ("NARFormer", True),
}

BE_VERBS = ["is", "are", "was", "were", "be"]


def make_fuzz_corpus(rng, max_len, vocab_size=48, n_videos=6, n_categories=3):
    """Adversarial corpus in the reference info_corpus.pkl schema."""
    n_words = vocab_size - C.NUM_SPECIAL_TOKENS
    itow = {tok: w for tok, w in C.SPECIAL_TOKEN_WORDS.items()}
    for j in range(n_words):
        wid = j + C.NUM_SPECIAL_TOKENS
        # sprinkle ignored 'be'-verbs through the vocab so the visual-word
        # demand filter (reference dataloader.py:404) gets exercised
        itow[wid] = BE_VERBS[j % len(BE_VERBS)] if j % 5 == 0 else "w%03d" % j

    itop = {C.PAD: C.PAD_WORD, C.UNK: C.UNK_WORD, C.BOS: C.BOS_WORD,
            C.EOS: C.EOS_WORD, C.MASK: C.MASK_WORD, C.VIS: C.VIS_WORD,
            6: "NOUN", 7: "VERB", 8: "DET", 9: "ADJ"}
    tag_ids = [6, 7, 8, 9]

    split = {"train": list(range(0, n_videos - 2)),
             "validate": [n_videos - 2], "test": [n_videos - 1]}
    captions, pos_tags, length_info, itoc = {}, {}, {}, {}
    for v in range(n_videos):
        vid = "video%d" % v
        itoc[v] = int(rng.randint(n_categories))
        captions[vid], pos_tags[vid] = [], []
        length_info[vid] = [0] * 50
        n_caps = int(rng.randint(2, 5))
        for ci in range(n_caps):
            if ci == 0:       # guaranteed short caption (keeps sum > 0 within
                length = 1    # max_len AND hits the min_num_masks >= len path)
            elif ci == 1:
                length = int(rng.randint(max_len, max_len + 4))  # truncation
            else:
                length = int(rng.randint(1, max_len + 2))
            word_ids = list(int(w) for w in rng.randint(
                C.NUM_SPECIAL_TOKENS, vocab_size, size=length))
            captions[vid].append([C.BOS] + word_ids + [C.EOS])
            pos_tags[vid].append(
                [C.BOS] + [int(rng.choice(tag_ids)) for _ in word_ids] + [C.EOS])
            length_info[vid][length] += 1
    info = {"itow": itow, "itop": itop, "itoc": itoc,
            "length_info": length_info, "split": split, "split_category": None}
    return {"info": info, "captions": captions, "pos_tags": pos_tags}


def make_fuzz_feats(rng, corpus, dims, n_total_frames, missing_ok=True,
                    oned_ok=True):
    """Per-modality vid->array dicts with missing-vid and 1-D quirks."""
    vids = sorted(corpus["captions"].keys())
    out = {}
    for j, (ch, dim) in enumerate(dims.items()):
        store = {}
        for i, vid in enumerate(vids):
            r = rng.rand()
            if missing_ok and r < 0.12 and j > 0:
                continue                       # vid absent from this store
            if oned_ok and r > 0.85:
                store[vid] = rng.randn(dim).astype(np.float32)   # 1-D
            else:
                t = int(rng.randint(2, n_total_frames + 3))
                store[vid] = rng.randn(t, dim).astype(np.float32)
        out[ch] = store
    return out


def write_fixture(tmp_path, corpus, feats, tag):
    pkl = tmp_path / ("info_corpus_%s.pkl" % tag)
    with open(pkl, "wb") as f:
        pickle.dump(corpus, f)
    paths = {}
    for ch, store in feats.items():
        p = tmp_path / ("feats_%s_%s.hdf5" % (ch, tag))
        with h5py.File(p, "w") as h:
            for vid, arr in store.items():
                h.create_dataset(vid, data=arr)
        paths[ch] = str(p)
    return str(pkl), paths


def build_pair(tmp_path, method, corpus, feats, tag, *, seed, max_len,
               n_frames, n_total_frames, load_feats_type, random_type,
               beta, n_caps_per_video, mode, fixed_length=False):
    decoding_type, vwg = METHOD_KNOBS[method]
    pkl, paths = write_fixture(tmp_path, corpus, feats, tag)
    dims = {ch: next(iter(s.values())).shape[-1] for ch, s in feats.items()}
    modality = "".join(sorted(dims.keys()))

    opt = {
        "dataset": "FUZZ", "info_corpus": pkl, "seed": seed,
        "modality": modality, "n_frames": n_frames,
        "n_total_frames": n_total_frames, "load_feats_type": load_feats_type,
        "max_len": max_len, "beta": list(beta),
        "decoding_type": decoding_type, "visual_word_generation": vwg,
        "demand": ["VERB", "NOUN"], "random_type": random_type,
        "n_caps_per_video": n_caps_per_video,
    }
    for ch in dims:
        opt["feats_%s" % ch] = [paths[ch]]
        opt["dim_%s" % ch] = dims[ch]
    ref_ds = ref_dataloader.VideoDataset(opt, mode)

    # default=False: the --default preset layer would clobber the fuzzed
    # max_len/beta (check_dataset presets); the method overlay still applies
    over = dict(
        vocab_size=len(corpus["info"]["itow"]), max_len=max_len,
        n_frames=n_frames, n_total_frames=n_total_frames,
        load_feats_type=load_feats_type, random_type=random_type,
        beta=list(beta), n_caps_per_video=n_caps_per_video, seed=seed,
        modality=modality,
    )
    for ch in dims:
        over["dim_%s" % ch] = dims[ch]
    cfg = resolve(Config(method=method, dataset="MSVD", scope="run",
                         **over))
    my_ds = VideoDataset(cfg, mode, info_corpus=corpus,
                         in_memory_feats={"feats_%s" % ch: feats[ch]
                                          for ch in dims})
    return ref_ds, my_ds


def compare_all_items(ref_ds, my_ds):
    assert len(ref_ds) == len(my_ds)
    tensor_keys = ("tokens", "labels", "taggings", "tokens_1", "labels_1")
    for ix in range(len(ref_ds)):
        r = ref_ds[ix]
        m = my_ds[ix]
        assert r["video_ids"] == m["video_ids"], ix
        for k in tensor_keys:
            assert (k in r) == (k in m), (ix, k)
            if k in r:
                np.testing.assert_array_equal(
                    np.asarray(r[k]), np.asarray(m[k]),
                    err_msg="item %d key %s" % (ix, k))
        np.testing.assert_array_equal(
            np.asarray(r["length_target"], np.float32),
            np.asarray(m["length_target"], np.float32),
            err_msg="item %d length_target" % ix)
        assert int(np.asarray(r["category"]).reshape(-1)[0]) == \
            int(np.asarray(m["category"]).reshape(-1)[0]), ix
        for k in r:
            if k.startswith("feats_"):
                np.testing.assert_array_equal(
                    np.asarray(r[k], np.float32),
                    np.asarray(m[k], np.float32),
                    err_msg="item %d key %s" % (ix, k))


# ---------------------------------------------------------------------------
# NAR campaigns: masking stream only (frame sampling consumes no RNG)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method", ["NAB", "NACF"])
@pytest.mark.parametrize("trial", range(4))
def test_nar_mlm_and_visual_words_exact(tmp_path, method, trial):
    rng = np.random.RandomState(100 + trial)
    max_len = int(rng.randint(6, 12))
    n_total = int(rng.randint(6, 12))
    corpus = make_fuzz_corpus(rng, max_len, vocab_size=int(rng.randint(30, 60)))
    feats = make_fuzz_feats(rng, corpus, {"i": 11, "m": 7}, n_total)
    lft = [0, 1, 2][trial % 3]
    if lft == 0:
        # reference load_feats_type=0 indexes raw features with ids drawn
        # over n_total_frames and no bounds clamp (dataloader.py:315): it
        # assumes full-length videos, so give it exactly that
        for st in feats.values():
            for vid in list(st):
                if st[vid].ndim == 2:
                    st[vid] = np.ascontiguousarray(
                        np.resize(st[vid], (n_total, st[vid].shape[-1])))
    beta = sorted([float(rng.uniform(0, 1)), float(rng.uniform(0, 1))])
    for mode in ("train", "validate"):
        ref_ds, my_ds = build_pair(
            tmp_path, method, corpus, feats, "%s_%s_%d" % (method, mode, trial),
            seed=trial * 7 + 1, max_len=max_len, n_frames=4,
            n_total_frames=n_total, load_feats_type=lft,
            random_type="equally_sampling", beta=beta,
            n_caps_per_video=0, mode=mode)
        compare_all_items(ref_ds, my_ds)


@pytest.mark.parametrize("trial", range(3))
def test_nar_ncaps_resampling_exact(tmp_path, trial):
    """n_caps_per_video>0: the infoset caption choice consumes the SAME
    RandomState stream as per-item masking (reference dataloader.py:184-188,
    349-381) — parity must hold across a shuffle() epoch boundary too."""
    rng = np.random.RandomState(300 + trial)
    max_len = 9
    corpus = make_fuzz_corpus(rng, max_len)
    feats = make_fuzz_feats(rng, corpus, {"i": 9}, 8)
    ref_ds, my_ds = build_pair(
        tmp_path, "NACF", corpus, feats, "ncaps_%d" % trial,
        seed=50 + trial, max_len=max_len, n_frames=4, n_total_frames=8,
        load_feats_type=2, random_type="equally_sampling",
        beta=[0.35, 0.9], n_caps_per_video=1 + trial, mode="train")
    compare_all_items(ref_ds, my_ds)
    ref_ds.shuffle()
    my_ds.shuffle()
    compare_all_items(ref_ds, my_ds)


# ---------------------------------------------------------------------------
# AR campaigns: no masking draws; segment_random exercises the frame stream
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method", ["ARB", "ARB2"])
@pytest.mark.parametrize("trial", range(3))
def test_ar_tokens_and_frames_exact(tmp_path, method, trial):
    rng = np.random.RandomState(200 + trial)
    max_len = int(rng.randint(6, 12))
    n_total = int(rng.randint(6, 12))
    corpus = make_fuzz_corpus(rng, max_len)
    lft = [0, 1][trial % 2]
    # segment_random type-1 draws happen per store only when the video is
    # present and 2-D-or-broadcast — keep every vid present so the reference
    # (which skips sampling for zero-filled vids, dataloader.py:276-279) and
    # our pipeline consume identical draw counts; type 0 draws BEFORE loading
    # on both sides, so quirks are safe there
    feats = make_fuzz_feats(rng, corpus, {"i": 10, "m": 6}, n_total,
                            missing_ok=(lft == 0), oned_ok=True)
    if lft == 0:
        # reference indexes raw features with ids drawn over n_total_frames
        # (no clamp, dataloader.py:229-232 + 315): full-length videos only
        for st in feats.values():
            for vid in list(st):
                if st[vid].ndim == 2:
                    st[vid] = np.ascontiguousarray(
                        np.resize(st[vid], (n_total, st[vid].shape[-1])))
    seed = 400 + trial
    np.random.seed(seed)  # reference global frame-draw stream
    for mode in ("train", "validate"):
        ref_ds, my_ds = build_pair(
            tmp_path, method, corpus, feats, "%s_%s_%d" % (method, mode, trial),
            seed=seed, max_len=max_len, n_frames=4, n_total_frames=n_total,
            load_feats_type=lft, random_type="segment_random",
            beta=[0.0, 1.0], n_caps_per_video=0, mode=mode)
        compare_all_items(ref_ds, my_ds)
