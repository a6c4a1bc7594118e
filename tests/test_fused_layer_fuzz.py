"""Randomized shape/mask fuzz for the fused Pallas decoder layer.

The fixed interpret tests pin one (n, L, pad-pattern) point; these sweep
random row counts (around the tile boundaries the kernel pads to), canvas
widths, PAD tails, interior MASK slots, and fully-padded rows — the class
of boundary where masking bugs live — and assert:

  * fused-vs-XLA agreement at the established bf16-matmul tolerance,
  * exact zeros at PAD positions (non-pad multiplier).

(The hoisted cross-K/V bit-equality lives in test_fused_layer.py — the
enc_kv operand requires the folded-epilogue call form used by the decode
driver, not this test's plain-embedding form.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navc_tpu import constants as C
from navc_tpu.models import build_model, init_params
from navc_tpu.ops.fused_layer import (fused_nar_decoder_layer,
                                      layer_weights_from_params)
from test_fused_layer import small_cfg


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_layer_random_shapes_and_masks(seed):
    rng = np.random.RandomState(seed)
    for draw in range(4):
        max_len = int(rng.choice([8, 10, 13]))
        heads = int(rng.choice([2, 4]))
        cfg = small_cfg(max_len=max_len, num_attention_heads=heads)
        model = build_model(cfg)
        variables = init_params(model, jax.random.PRNGKey(seed), cfg)

        n = int(rng.choice([1, 3, 6, 9]))
        enc = jnp.asarray(
            rng.randn(n, 2 * cfg.n_frames, cfg.dim_hidden).astype(np.float32))
        tokens = np.full((n, max_len), C.PAD, np.int32)
        for i in range(n):
            if rng.rand() < 0.15:
                continue  # fully-padded row
            l = int(rng.randint(1, max_len + 1))
            tokens[i, :l] = rng.randint(4, cfg.vocab_size, size=l)
            m = rng.rand(l) < 0.3
            tokens[i, :l][m] = C.MASK
        tokens = jnp.asarray(tokens)

        hidden_ref, _, _ = model.apply(
            variables, tokens, enc, None, "NARFormer", True,
            method=lambda m, *a: m.decode(*a))
        emb = model.apply(variables, tokens, enc, None,
                          method=lambda m, *a: m.nar_embed(*a))
        weights = layer_weights_from_params(
            variables["params"]["decoder"]["layer_0"])
        fused = fused_nar_decoder_layer(
            emb, enc, tokens == C.PAD, weights,
            n_head=heads, tb=8, interpret=True)

        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(hidden_ref), rtol=2e-2, atol=2e-2,
            err_msg="draw %d n=%d L=%d heads=%d" % (draw, n, max_len, heads))
        pad = np.asarray(tokens) == C.PAD
        np.testing.assert_allclose(np.asarray(fused)[pad], 0.0, atol=1e-6)
