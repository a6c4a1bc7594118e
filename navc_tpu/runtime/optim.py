"""Optimizer with the reference's exact schedule semantics (misc/optim.py).

Reference behavior replicated:
  * Adam / RMSprop with L2 weight decay folded into the gradient *before*
    moment estimation (torch-style ``weight_decay``, optim.py:61-62),
  * elementwise gradient value-clip at ``grad_clip`` applied to the raw
    gradient before the optimizer update (misc/run.py:260),
  * per-step linear warmup: ``lr * min(step / (warmup + 1), 1)``
    (optim.py:36-46),
  * per-epoch decay: ``lr = max(mlr, decay * lr)``, applied only once past the
    warmup horizon (optim.py:32-34).

Implementation: an optax chain with an injected ``learning_rate`` hyperparam;
the host-side :class:`LrSchedule` mirrors ScheduledOptim's bookkeeping and
computes the scalar lr that the train step feeds into the chain each step.
"""

from __future__ import annotations

from dataclasses import dataclass

import optax

from ..config import Config


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.optim.lower() == "adam":
        scaler = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    elif cfg.optim.lower() == "rmsprop":
        # torch RMSprop defaults: alpha=0.99, eps=1e-8 with eps OUTSIDE the
        # sqrt (g / (sqrt(nu) + eps)); optax's default eps_in_sqrt=True is
        # the other convention and diverges once nu decays to ~eps scale
        scaler = optax.scale_by_rms(decay=0.99, eps=1e-8, eps_in_sqrt=False)
    else:
        raise ValueError("optim must be adam or rmsprop, got %r" % cfg.optim)

    def tx(learning_rate):
        return optax.chain(
            optax.clip(cfg.grad_clip),
            optax.add_decayed_weights(cfg.weight_decay),
            scaler,
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(tx)(learning_rate=cfg.learning_rate)


@dataclass
class LrSchedule:
    """Host-side mirror of reference ScheduledOptim lr bookkeeping."""

    learning_rate: float
    minimum_learning_rate: float
    decay: float
    n_warmup_steps: int = 0
    n_current_steps: int = 0

    @classmethod
    def from_config(cls, cfg: Config) -> "LrSchedule":
        return cls(
            learning_rate=cfg.learning_rate,
            minimum_learning_rate=cfg.minimum_learning_rate,
            decay=cfg.decay,
            n_warmup_steps=cfg.n_warmup_steps,
        )

    def step_lr(self) -> float:
        """lr for the next optimizer step (reference optim.py:36-46)."""
        self.n_current_steps += 1
        ratio = min(self.n_current_steps / (self.n_warmup_steps + 1.0), 1.0)
        return self.learning_rate * ratio

    def epoch_update(self) -> None:
        """Per-epoch decay (reference optim.py:32-34)."""
        if self.n_current_steps > self.n_warmup_steps:
            self.learning_rate = max(self.minimum_learning_rate,
                                     self.decay * self.learning_rate)

    def get_lr(self) -> float:
        return self.learning_rate


def set_learning_rate(opt_state, lr: float):
    """Write the scalar lr into an inject_hyperparams state (host side)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state
