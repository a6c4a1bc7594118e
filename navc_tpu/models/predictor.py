"""Auxiliary task heads (length prediction for NAR decoding).

Capability parity with reference models/Predictor.py: the length head is
Linear -> ReLU -> Dropout -> Linear(max_len) over the temporal mean of the
encoder output, log-softmaxed (Predictor.py:12-30). Heads are assembled per
``crit`` entry like the reference factory (models/__init__.py:41-52).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dense


class LengthPredictor(nn.Module):
    dim_hidden: int
    max_len: int
    hidden_dropout_prob: float = 0.5
    key_name: str = "pred_length"

    @nn.compact
    def __call__(self, enc_output, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        assert enc_output.ndim == 3
        x = enc_output.mean(axis=1)
        x = Dense(self.dim_hidden, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.hidden_dropout_prob)(x, deterministic=deterministic)
        x = Dense(self.max_len, name="fc2")(x)
        return {self.key_name: jax.nn.log_softmax(x, axis=-1)}


# Registry of auxiliary predictors keyed by crit name; mirrors the reflection
# over Predictor_* in the reference factory (models/__init__.py:41-52).
AUXILIARY_PREDICTORS = {
    "length": LengthPredictor,
}
