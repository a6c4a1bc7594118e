"""Bounded randomized decode-parity fuzz (scripts/fuzz_crossparity.py).

Each seed deterministically samples decode configurations across the space
the fixed cross-parity tests pin only pointwise — paradigm x schedule x
length-beam width x teacher gates x dict_mapping x beam shape — and asserts
token-identical captions vs the actual torch reference. Wider sweeps:
``python scripts/fuzz_crossparity.py --n 40``.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_fuzzer():
    path = os.path.join(REPO, "scripts", "fuzz_crossparity.py")
    spec = importlib.util.spec_from_file_location("fuzz_crossparity", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["fuzz_crossparity"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_fuzzed_decode_parity(seed):
    fz = _load_fuzzer()
    h = fz.load_harness()
    rng = np.random.RandomState(seed)
    for _ in range(2):
        fz.run_case(h, fz.sample_case(rng))


@pytest.mark.parametrize("seed", [404, 505])
def test_fuzzed_forward_parity(seed):
    """Architecture-knob forward parity (enhance_input, watch, pos_attention,
    with_layernorm, norm_type, fusion, modality subsets, tie_weights)."""
    fz = _load_fuzzer()
    h = fz.load_harness()
    rng = np.random.RandomState(seed)
    for _ in range(2):
        fz.run_model_case(h, fz.sample_model_case(rng))
