"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding tests work without TPU hardware (SURVEY.md §4 test strategy)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon TPU plugin overrides JAX_PLATFORMS at import time; force cpu here
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


FIXTURE_NLTK = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "fixtures", "nltk_data")


@pytest.fixture
def nltk_pos_tagger():
    """Make ``nltk.pos_tag`` work without downloads: if the pretrained
    averaged-perceptron model is absent (zero-egress env), install the
    vendored fixture model (scripts/make_pos_fixture.py) into nltk's
    resource path so the REAL perceptron tagging path runs in CI
    (VERDICT r3 #9) instead of skipping."""
    nltk = pytest.importorskip("nltk")
    import nltk.tag

    try:
        nltk.pos_tag(["probe"])
        yield  # real pretrained model available; nothing to do
        return
    except LookupError:
        pass
    nltk.data.path.insert(0, FIXTURE_NLTK)
    nltk.tag._get_tagger.cache_clear()
    try:
        nltk.pos_tag(["probe"])
        yield
    finally:
        nltk.data.path.remove(FIXTURE_NLTK)
        nltk.tag._get_tagger.cache_clear()
