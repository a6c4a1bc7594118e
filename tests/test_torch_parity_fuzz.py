"""Randomized multi-step optimizer-trajectory parity vs torch.

test_torch_parity.py pins ONE step at one hyperparameter point; these sweep
random (lr, weight_decay, clip, shape) draws and run several steps with fresh
gradients — moment accumulation, bias correction, torch-style decoupled-into-
gradient weight decay, and mid-run learning-rate changes (the per-epoch decay
path, reference misc/optim.py) all have to track for trajectories to stay
close.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from navc_tpu.config import Config  # noqa: E402
from navc_tpu.runtime.optim import make_optimizer  # noqa: E402


def _run_pair(optim: str, seed: int, n_steps: int = 8):
    rng = np.random.RandomState(seed)
    lr = float(10.0 ** rng.uniform(-4, -2))
    wd = float(rng.choice([0.0, 5e-4, 1e-2]))
    clip = float(rng.choice([0.5, 2.0, 100.0]))
    shape = (int(rng.randint(2, 8)), int(rng.randint(2, 8)))
    w0 = rng.randn(*shape).astype(np.float32)
    # halve the lr midway, like the per-epoch decay (reference run.py:248-257)
    lr_at = lambda t: lr * (0.5 if t >= n_steps // 2 else 1.0)  # noqa: E731

    cfg = Config(learning_rate=lr, weight_decay=wd, grad_clip=clip,
                 optim=optim)
    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = (torch.optim.Adam([tw], lr=lr, weight_decay=wd) if optim == "adam"
            else torch.optim.RMSprop([tw], lr=lr, weight_decay=wd))

    for t in range(n_steps):
        g = (rng.randn(*shape).astype(np.float32)
             * float(rng.choice([0.2, 1.0, 4.0])))
        state.hyperparams["learning_rate"] = lr_at(t)
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

        for group in topt.param_groups:
            group["lr"] = lr_at(t)
        tw.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_value_([tw], clip)  # reference run.py:260
        topt.step()

    return np.asarray(params["w"]), tw.detach().numpy(), (lr, wd, clip, shape)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_adam_trajectory_fuzz(seed):
    ours, theirs, drawn = _run_pair("adam", seed)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6,
                               err_msg=str(drawn))


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_rmsprop_trajectory_fuzz(seed):
    ours, theirs, drawn = _run_pair("rmsprop", seed)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6,
                               err_msg=str(drawn))
