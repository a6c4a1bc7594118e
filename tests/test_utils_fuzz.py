"""Randomized parity fuzz: beam tiling and POS-tag word extraction vs the
reference misc/utils.py."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from misc import utils as ref_utils  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from navc_tpu.decoding.length_beam import enlarge  # noqa: E402
from navc_tpu.runtime.sentence import get_words_with_specified_tags  # noqa: E402


@pytest.mark.parametrize("seed", [0, 1])
def test_enlarge_tiling_parity(seed):
    """Reference misc/utils.py:205-213: every rank (B,), (B, T), (B, T, D)
    must tile identically to interleaved (B*beam, ...) order."""
    rng = np.random.RandomState(seed)
    for _ in range(20):
        beam = int(rng.randint(1, 7))
        b = int(rng.randint(1, 5))
        shape = [b] + [int(rng.randint(1, 5))
                       for _ in range(rng.randint(0, 3))]
        x = rng.randn(*shape).astype(np.float32)
        ref = ref_utils.enlarge(torch.from_numpy(x), beam).numpy()
        mine = np.asarray(enlarge(jnp.asarray(x), beam))
        np.testing.assert_array_equal(mine, ref)


def test_pos_tag_word_extraction_parity():
    pytest.importorskip("nltk")
    sentences = [
        "a man is playing a guitar on stage",
        "the dog runs fast in the park",
        "someone <mask> cooking food quickly",
        "children are kicking a red ball",
        "a woman sings and dances outdoors",
    ]
    vocab = {}
    for s in sentences:
        for w in s.split():
            vocab.setdefault(w, len(vocab))
    for s in sentences:
        ref_set, my_set = set(), set()
        try:
            ref_utils.get_words_with_specified_tags(vocab, s, ref_set)
        except LookupError:
            pytest.skip("nltk pos tagger data unavailable")
        get_words_with_specified_tags(vocab, s, my_set)
        assert my_set == ref_set, s
