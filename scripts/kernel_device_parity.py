"""Device parity checks for the beam-search Pallas kernels.

Runs the compiled (non-interpret) kernels on whatever backend is active
and compares against the XLA reference ops — the device-side complement
of the interpret-mode tests in tests/test_pallas_ops.py (repo rule:
every Pallas kernel needs both). Single process; safe on the TPU tunnel.

Usage: python scripts/kernel_device_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
        # reference mirrors the kernel's arithmetic: exact f32 accumulation
        # of bf16-rounded inputs (a plain bf16 @ bf16 would round the
        # OUTPUT to bf16 and scramble near-tied rankings)
        logits = jnp.matmul(h.astype(jnp.bfloat16).astype(jnp.float32),
                            w.astype(jnp.bfloat16).astype(jnp.float32),
                            precision=jax.lax.Precision.HIGHEST)
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


def check_beam_attend():
    from navc_tpu.ops.beam_attend import beam_attend_eligible, beam_attend_step
    b, k, l, nh, dh = 64, 5, 30, 8, 64
    h = nh * dh
    n = b * k
    assert beam_attend_eligible(b, k, l, h, 2)
    rng = np.random.RandomState(2)
    tpos = 7
    kc = jnp.asarray(rng.randn(n, l * h)).astype(jnp.bfloat16)
    vc = jnp.asarray(rng.randn(n, l * h)).astype(jnp.bfloat16)
    wiped = jnp.arange(l * h) >= tpos * h
    kc = jnp.where(wiped[None, :], 0, kc)
    vc = jnp.where(wiped[None, :], 0, vc)
    q = jnp.asarray(rng.randn(n, h).astype(np.float32))
    kt = jnp.asarray(rng.randn(n, h).astype(np.float32))
    vt = jnp.asarray(rng.randn(n, h).astype(np.float32))
    prev_k = jnp.asarray(rng.randint(0, k, (b, k)), jnp.int32)
    maskb = np.arange(l)[None, :] > tpos
    amask = jnp.asarray(np.where(maskb, -1e7, 0.0).astype(np.float32))
    amask = jnp.broadcast_to(amask, (n, l))
    kco, vco, att = beam_attend_step(kc, vc, q, kt, vt, prev_k, amask,
                                     tpos, k=k, nh=nh, l=l)
    src = (np.arange(n) // k) * k + np.asarray(prev_k).reshape(n)
    rkc = np.asarray(kc, np.float32)[src].reshape(n, l, h)
    rvc = np.asarray(vc, np.float32)[src].reshape(n, l, h)
    rkc[:, tpos] = np.asarray(kt.astype(jnp.bfloat16), np.float32)
    rvc[:, tpos] = np.asarray(vt.astype(jnp.bfloat16), np.float32)
    lim = (tpos + 1) * h  # positions > tpos are unspecified (clamped tiles)
    np.testing.assert_array_equal(np.asarray(kco, np.float32)[:, :lim],
                                  rkc.reshape(n, l * h)[:, :lim])
    np.testing.assert_array_equal(np.asarray(vco, np.float32)[:, :lim],
                                  rvc.reshape(n, l * h)[:, :lim])
    qh = np.asarray(q).reshape(n, nh, dh)
    sc = (np.einsum("nhd,nlhd->nhl", qh, rkc.reshape(n, l, nh, dh))
          / np.sqrt(dh)) + np.asarray(amask)[:, None, :]
    pr = np.exp(sc - sc.max(-1, keepdims=True))
    pr /= pr.sum(-1, keepdims=True)
    ref = np.einsum("nhl,nlhd->nhd", pr,
                    rvc.reshape(n, l, nh, dh)).reshape(n, h)
    np.testing.assert_allclose(np.asarray(att), ref, rtol=5e-5, atol=5e-5)
    print("beam_attend: caches exact, attention within 5e-5")


def check_cross_attend():
    from navc_tpu.ops.beam_attend import cross_attend, cross_attend_eligible
    b, k, le, nh, dh = 64, 5, 16, 8, 64
    h = nh * dh
    n = b * k
    # f32 payload selects the exact passes=0 path; bf16 payload exercises
    # the production NAVC_SEG_PASSES=2 hi/lo-split _segdot branch (bf16
    # inputs are bf16-representable so the split error ~2^-18 relative sits
    # well inside the 5e-4 tolerance)
    for dt, tol in ((jnp.float32, 5e-5), (jnp.bfloat16, 5e-4)):
        assert cross_attend_eligible(n, le, h, dt.dtype.itemsize)
        rng = np.random.RandomState(6)
        q = jnp.asarray(rng.randn(n, h).astype(np.float32))
        ke = jnp.asarray(rng.randn(b, le * h).astype(np.float32)).astype(
            dt).astype(jnp.float32)
        ve = jnp.asarray(rng.randn(b, le * h).astype(np.float32)).astype(
            dt).astype(jnp.float32)
        att = cross_attend(q, jnp.repeat(ke.astype(dt), k, axis=0),
                           jnp.repeat(ve.astype(dt), k, axis=0), nh=nh)
        qh = np.asarray(q).reshape(b, k, nh, dh)
        kh = np.asarray(ke).reshape(b, le, nh, dh)
        vh = np.asarray(ve).reshape(b, le, nh, dh)
        sc = np.einsum("bkhd,blhd->bkhl", qh, kh) / np.sqrt(dh)
        pr = np.exp(sc - sc.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        ref = np.einsum("bkhl,blhd->bkhd", pr, vh).reshape(n, h)
        np.testing.assert_allclose(np.asarray(att), ref, rtol=tol, atol=tol)
        print(f"cross_attend {dt.__name__}: within {tol}")


def check_vocab_ce():
    from navc_tpu.ops.vocab_ce import reference_ce, vocab_ce_train
    rng = np.random.RandomState(9)
    n, d, v = 640, 512, 10048  # production-shaped: irregular V, padded cols
    h = jnp.asarray((rng.randn(n, d) * 0.5).astype(np.float32))
    w = jnp.asarray((rng.randn(d, v) * 0.05).astype(np.float32))
    bias = jnp.asarray((rng.randn(v) * 0.1).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, v, (n,)), jnp.int32)
    mask = jnp.asarray(rng.rand(n) > 0.3, jnp.float32)

    # (compute dtype, fwd tol, grad tol): the bf16 path rounds the matmul
    # operands only (f32 accumulate), so errors scale with bf16 input
    # rounding of |logits| ~ a few units
    for dt, ftol, gtol in ((jnp.float32, 2e-4, 2e-4),
                           (jnp.bfloat16, 5e-2, 5e-3)):
        def loss_fused(h, w, b):
            g, _ = vocab_ce_train(h, w, b, lab, compute_dtype=dt)
            return -(g * mask).sum() / n

        def loss_ref(h, w, b):
            hh = h.astype(dt).astype(jnp.float32) if dt == jnp.bfloat16 else h
            ww = w.astype(dt).astype(jnp.float32) if dt == jnp.bfloat16 else w
            g, _ = reference_ce(hh, ww, b, lab)
            return -(g * mask).sum() / n

        g, p = jax.jit(lambda: vocab_ce_train(
            h, w, bias, lab, compute_dtype=dt))()
        gr, pr = reference_ce(
            h.astype(dt).astype(jnp.float32) if dt == jnp.bfloat16 else h,
            w.astype(dt).astype(jnp.float32) if dt == jnp.bfloat16 else w,
            bias, lab)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   rtol=ftol, atol=ftol)
        match = float((np.asarray(p) == np.asarray(pr)).mean())
        assert match > 0.999, match  # near-tie flips only

        gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(h, w, bias)
        gr_ = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(h, w, bias)
        for name, a, b in zip(("dh", "dw", "db"), gf, gr_):
            scale = max(float(jnp.abs(b).max()), 1e-6)
            err = float(jnp.abs(a - b).max()) / scale
            assert err < gtol, (name, err)
        print(f"vocab_ce {dt.__name__}: fwd within {ftol}, "
              f"grads within {gtol} rel")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    check_beam_permute()
    check_project_topk()
    check_beam_attend()
    check_cross_attend()
    check_vocab_ce()
    print("OK")
