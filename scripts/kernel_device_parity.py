"""Device parity checks for the beam-search Pallas kernels.

Runs the compiled (non-interpret) kernels on whatever backend is active
and compares against the XLA reference ops — the device-side complement
of the interpret-mode tests in tests/test_pallas_ops.py (repo rule:
every Pallas kernel needs both). Single process; safe on the TPU tunnel.

Usage: python scripts/kernel_device_parity.py
"""

import jax
import jax.numpy as jnp
import numpy as np


def check_beam_permute():
    from navc_tpu.ops.beam_permute import (beam_permute_eligible,
                                           permute_beam_caches)
    b, k, max_len, nh, dh = 64, 5, 30, 8, 64
    for dt in (jnp.bfloat16, jnp.float32):
        assert beam_permute_eligible(b, k, max_len * nh * dh, dt.dtype.itemsize)
        rng = np.random.RandomState(0)
        kc = jnp.asarray(rng.randn(b * k, max_len, nh, dh)).astype(dt)
        vc = jnp.asarray(rng.randn(b * k, max_len, nh, dh)).astype(dt)
        prev_k = jnp.asarray(rng.randint(0, k, (b, k)), jnp.int32)
        okc, ovc = permute_beam_caches(kc, vc, prev_k, k)
        rkc = jnp.take_along_axis(kc.reshape(b, k, max_len, nh, dh),
                                  prev_k[:, :, None, None, None],
                                  axis=1).reshape(kc.shape)
        rvc = jnp.take_along_axis(vc.reshape(b, k, max_len, nh, dh),
                                  prev_k[:, :, None, None, None],
                                  axis=1).reshape(vc.shape)
        np.testing.assert_array_equal(np.asarray(okc), np.asarray(rkc))
        np.testing.assert_array_equal(np.asarray(ovc), np.asarray(rvc))
        print(f"beam_permute {dt.__name__}: exact")


def check_project_topk():
    from navc_tpu.ops.vocab_fused import fused_project_topk
    rng = np.random.RandomState(1)
    n, d, v, k = 640, 512, 10048, 5
    h = jnp.asarray(rng.randn(n, d).astype(np.float32))
    w = jnp.asarray((rng.randn(d, v) * 0.05).astype(np.float32))
    bias = jnp.asarray(rng.randn(v).astype(np.float32) * 0.02)
    for b_arg in (None, bias):
        wp, ids = fused_project_topk(h, w, k, bias=b_arg)
        logits = (h.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16)
                  ).astype(jnp.float32)
        if b_arg is not None:
            logits = logits + b_arg
        rv, ri = jax.lax.top_k(logits, k)
        rwp = rv - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        ids, ri = np.asarray(ids), np.asarray(ri)
        match = (ids == ri).mean()
        assert match > 0.999, match  # bf16-tie flips only
        agree = ids == ri
        np.testing.assert_allclose(np.asarray(wp)[agree],
                                   np.asarray(rwp)[agree],
                                   rtol=1e-5, atol=1e-5)
        print(f"project_topk bias={b_arg is not None}: "
              f"ids match {match:.6f}, logprobs within 1e-5")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    check_beam_permute()
    check_project_topk()
    print("OK")
