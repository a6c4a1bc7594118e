"""Randomized parity fuzz for sentence/diversity utils vs the reference.

Drives the ACTUAL reference functions (misc/utils.py: to_sentence,
duplicate/remove_repeat_n_grame, analyze_length_novel_unique) and navc's
ports with identical random inputs — repeated-n-gram-heavy captions stress
the dedup loop's restart/distance logic; random prediction/GT corpora stress
the novel/unique/usage/gram4 analysis.
"""

import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from misc import utils as ref_utils  # noqa: E402

from navc_tpu import constants as C  # noqa: E402
from navc_tpu.runtime import sentence as my_sent  # noqa: E402

WORDS = "a the man dog runs park fast red ball two".split()


@pytest.mark.parametrize("seed", [0, 1])
def test_to_sentence_parity(seed):
    rng = np.random.RandomState(seed)
    vocab = {i: "w%d" % i for i in range(20)}
    for _ in range(200):
        n = rng.randint(1, 12)
        ids = rng.randint(0, 20, size=n).tolist()
        assert (my_sent.to_sentence(ids, vocab)
                == ref_utils.to_sentence(ids, vocab)), ids
        # EOS/PAD break, custom skip words
        assert (my_sent.to_sentence(ids, vocab, skip_words=[C.MASK])
                == ref_utils.to_sentence(ids, vocab, skip_words=[C.MASK]))


@pytest.mark.parametrize("seed", [2, 3])
def test_duplicate_removal_parity(seed):
    """Repeat-heavy captions: short vocab makes 1..4-gram repeats common."""
    rng = np.random.RandomState(seed)
    for _ in range(300):
        n = rng.randint(1, 16)
        words = [str(rng.choice(WORDS[: rng.randint(2, len(WORDS))]))
                 for _ in range(n)]
        sent = " ".join(words)
        my_clean, my_stat = my_sent.duplicate(sent)
        ref_clean, ref_stat = ref_utils.duplicate(sent)
        assert my_clean == ref_clean, sent
        assert my_stat == ref_stat, sent


@pytest.mark.parametrize("seed", [4, 5])
def test_analysis_parity(seed):
    rng = np.random.RandomState(seed)
    vocab = {i: w for i, w in enumerate(
        ["<pad>", "<bos>", "<eos>", "<mask>"] + WORDS)}

    def cap_ids():
        n = rng.randint(2, 8)
        body = rng.randint(4, len(vocab), size=n).tolist()
        return [1] + body + [2]  # BOS ... EOS like the corpus stores them

    for _ in range(10):
        n_train = rng.randint(2, 6)
        gt_data = {"video%d" % i: [cap_ids() for _ in range(rng.randint(1, 4))]
                   for i in range(n_train)}
        splits = {"train": list(range(n_train))}

        def cap_str():
            if rng.rand() < 0.3:
                # sometimes exactly a training caption -> non-novel
                vid = "video%d" % rng.randint(n_train)
                ids = gt_data[vid][0]
                return " ".join(vocab[w] for w in ids[1:-1])
            n = rng.randint(1, 7)
            return " ".join(str(vocab[int(w)])
                            for w in rng.randint(4, len(vocab), size=n))

        pred = {"video%d" % i: [{"caption": cap_str()}]
                for i in range(rng.randint(2, 6))}

        mine = my_sent.analyze_length_novel_unique(gt_data, pred, vocab,
                                                   splits, n=1)
        ref = ref_utils.analyze_length_novel_unique(gt_data, pred, vocab,
                                                    splits, n=1)
        # (ave_length, novel, unique, usage, hy_res, gram4)
        assert mine[0] == ref[0]
        np.testing.assert_allclose(mine[1], ref[1])
        np.testing.assert_allclose(mine[2], ref[2])
        assert mine[3] == ref[3]
        assert mine[5] == ref[5]
