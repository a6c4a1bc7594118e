"""Numerical parity vs torch for loss and optimizer semantics.

The reference's subtle loss conventions (SURVEY.md §7 hard-part 5) and
torch-style Adam weight decay are verified directly against torch CPU ops —
not against the reference repo's code, just the same torch primitives it
calls (nn.NLLLoss, nn.KLDivLoss, optim.Adam).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from navc_tpu.runtime.crit import kl_length_loss, nll_language_loss
from navc_tpu.runtime.optim import make_optimizer
from navc_tpu.config import Config


def test_nll_language_loss_matches_torch():
    rng = np.random.RandomState(0)
    b, l, v = 3, 5, 11
    logits = rng.randn(b, l, v).astype(np.float32)
    labels = rng.randint(0, v, size=(b, l))
    labels[0, 3:] = 0  # PAD
    labels[2, 1:] = 0

    logprobs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    ours = float(nll_language_loss(jnp.asarray(logprobs), jnp.asarray(labels))) / b

    # torch: NLLLoss(reduce=False), PAD-masked sum / batch size
    # (reference crit.py:57, 76-84, 40-48)
    tl = torch.nn.functional.nll_loss(
        torch.from_numpy(logprobs).reshape(-1, v),
        torch.from_numpy(labels).reshape(-1), reduction="none")
    mask = torch.from_numpy(labels).reshape(-1).ne(0).float()
    theirs = float((tl * mask).sum() / b)
    assert abs(ours - theirs) < 1e-5


def test_kl_length_loss_matches_torch():
    rng = np.random.RandomState(1)
    b, l = 4, 7
    pred = np.asarray(jax.nn.log_softmax(jnp.asarray(rng.randn(b, l).astype(np.float32)), -1))
    target = rng.rand(b, l).astype(np.float32)
    target[1, 2:] = 0.0  # zero-target entries must contribute 0
    target /= target.sum(-1, keepdims=True)

    ours = float(kl_length_loss(jnp.asarray(pred), jnp.asarray(target)))
    # torch nn.KLDivLoss() default 'mean' over all elements (crit.py:223)
    theirs = float(torch.nn.functional.kl_div(
        torch.from_numpy(pred), torch.from_numpy(target), reduction="mean"))
    assert abs(ours - theirs) < 1e-6


def test_adam_step_matches_torch():
    """One step of our optax chain == torch Adam(weight_decay) after the same
    value-clipped gradient (reference optim.py:61-62, run.py:260)."""
    rng = np.random.RandomState(2)
    w0 = rng.randn(6, 4).astype(np.float32)
    g = (rng.randn(6, 4).astype(np.float32) * 4.0)  # exceeds clip range ±2

    lr, wd, clip = 1e-3, 5e-4, 2.0
    cfg = Config(learning_rate=lr, weight_decay=wd, grad_clip=clip, optim="adam")
    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    state.hyperparams["learning_rate"] = lr
    updates, _ = tx.update({"w": jnp.asarray(g)}, state, params)
    ours = np.asarray(optax.apply_updates(params, updates)["w"])

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    tw.grad = torch.from_numpy(g.copy())
    # reference clips the raw gradient by value before the step (run.py:260)
    torch.nn.utils.clip_grad_value_([tw], clip)
    opt.step()
    theirs = tw.detach().numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


def test_rmsprop_step_matches_torch():
    rng = np.random.RandomState(3)
    w0 = rng.randn(5, 3).astype(np.float32)
    g = rng.randn(5, 3).astype(np.float32)

    lr, wd = 1e-3, 5e-4
    cfg = Config(learning_rate=lr, weight_decay=wd, grad_clip=100.0, optim="rmsprop")
    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    state.hyperparams["learning_rate"] = lr
    updates, _ = tx.update({"w": jnp.asarray(g)}, state, params)
    ours = np.asarray(optax.apply_updates(params, updates)["w"])

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.RMSprop([tw], lr=lr, weight_decay=wd)
    tw.grad = torch.from_numpy(g.copy())
    opt.step()
    theirs = tw.detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)
