"""Joint representation learner: per-stream norm + temporal fusion.

Capability parity with reference models/joint_representation.py: per-stream
BatchNorm over the flattened (B*T, C) activations (or LayerNorm when
``norm_type == 'ln'``), then temporal concatenation or additive mean fusion;
stream hiddens are averaged (joint_representation.py:24-53).

Documented deviation — ``addition`` with norms enabled: the reference's code
path is broken upstream for any batch > 1 (after ``stack().mean(0)`` the
``len(encoder_outputs)`` it asserts against ``len(norm_list)`` is the BATCH
size, joint_representation.py:38-41, and the BN branch then unpacks 3 dims
from per-row 2-D slices), so upstream only ``no_encoder_bn=True`` is
functional. This module implements the evident intent instead: ONE norm
applied to the averaged stream. Cross-parity with the reference is asserted
for every upstream-functional combination (scripts/fuzz_crossparity.py).

TPU/pjit note: BatchNorm batch statistics are computed with global jnp means;
under pjit with a batch-sharded input the mean is a global reduction, so
multi-chip training sees exactly the full-batch statistics (no per-replica BN
drift). Running averages live in the flax ``batch_stats`` collection and are
used at eval, matching torch BatchNorm1d semantics (momentum 0.1, eps 1e-5).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn


class Fusion(nn.Module):
    fusion: str = "temporal_concat"  # temporal_concat | addition | none
    norm_type: str = "bn"  # bn | ln
    no_encoder_bn: bool = False
    num_streams: int = 1
    dim_hidden: int = 512

    def setup(self):
        if self.fusion not in ("temporal_concat", "addition", "none"):
            raise ValueError("Unsupported fusion type: %r" % self.fusion)
        if not self.no_encoder_bn:
            # addition fuses before the norm, so only one norm module
            # (reference joint_representation.py:17-18).
            n = 1 if self.fusion == "addition" else self.num_streams
            if self.norm_type.lower() == "bn":
                self.norms = [
                    nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-5,
                                 name="bn%d" % i)
                    for i in range(n)
                ]
            else:
                self.norms = [nn.LayerNorm(epsilon=1e-5, name="ln%d" % i) for i in range(n)]
        else:
            self.norms = []

    def __call__(self, encoder_outputs: Sequence[jnp.ndarray],
                 encoder_hiddens: Sequence[jnp.ndarray],
                 use_running_average: bool = True):
        if not isinstance(encoder_hiddens, (list, tuple)):
            encoder_hiddens = [encoder_hiddens]
        enc_hidden = jnp.stack(list(encoder_hiddens), axis=0).mean(0)

        if self.fusion == "none":
            out = jnp.concatenate(list(encoder_outputs), axis=1) \
                if isinstance(encoder_outputs, (list, tuple)) else encoder_outputs
            return out, enc_hidden

        outs: List[jnp.ndarray] = list(encoder_outputs) \
            if isinstance(encoder_outputs, (list, tuple)) else [encoder_outputs]

        if self.fusion == "addition":
            outs = [jnp.stack(outs, axis=0).mean(0)]

        if self.norms:
            assert len(outs) == len(self.norms)
            normed = []
            for x, norm in zip(outs, self.norms):
                if isinstance(norm, nn.BatchNorm):
                    b, t, c = x.shape
                    # BN over (B*T, C) — reference joint_representation.py:44-45.
                    y = norm(x.reshape(b * t, c), use_running_average=use_running_average)
                    normed.append(y.reshape(b, t, c))
                else:
                    normed.append(norm(x))
            outs = normed

        if self.fusion == "temporal_concat":
            out = jnp.concatenate(outs, axis=1)
        else:
            out = outs[0]
        return out, enc_hidden
