"""Per-modality highway feature encoder.

Capability parity with reference models/Encoder.py: each modality stream is
Linear(dim_in -> dim_hidden) -> HighWay(gated tanh) -> Dropout, and the stream
hidden state is the temporal mean (Encoder.py:47-59).

TPU notes: each stream is a pair of (T-batched) matmuls onto the MXU; streams
are independent so XLA schedules them concurrently.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import Dense


class HighWay(nn.Module):
    """Gated highway block (reference models/Encoder.py:9-25)."""

    hidden_size: int
    with_gate: bool = True

    @nn.compact
    def __call__(self, x):
        y = jnp.tanh(Dense(self.hidden_size, name="w1")(x))
        if self.with_gate:
            gate = nn.sigmoid(Dense(self.hidden_size, name="w2")(x))
            return gate * x + (1.0 - gate) * y
        return x + y


class HighWayStream(nn.Module):
    """One modality stream: Linear -> HighWay -> Dropout (Encoder.py:65)."""

    dim_hidden: int
    dropout: float = 0.5
    with_gate: bool = True

    @nn.compact
    def __call__(self, feats, deterministic: bool = True):
        x = Dense(self.dim_hidden, name="linear")(feats)
        x = HighWay(self.dim_hidden, self.with_gate, name="highway")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class MultiStreamEncoder(nn.Module):
    """All modality streams; hiddens are temporal means (Encoder.py:27-59)."""

    modality: str
    dim_hidden: int
    encoder_dropout: float = 0.5
    with_gate: bool = True

    def setup(self):
        self.streams = [
            HighWayStream(self.dim_hidden, self.encoder_dropout, self.with_gate,
                          name="Encoder_%s" % ch.upper())
            for ch in self.modality.lower()
        ]

    def __call__(self, input_feats: Sequence[jnp.ndarray], deterministic: bool = True):
        assert len(input_feats) == len(self.streams), \
            "expected %d modality streams, got %d" % (len(self.streams), len(input_feats))
        outputs: List[jnp.ndarray] = [
            stream(f, deterministic=deterministic)
            for stream, f in zip(self.streams, input_feats)
        ]
        hiddens = [o.mean(axis=1) for o in outputs]
        return outputs, hiddens
