"""Optimizer and schedule controllers with torch/Poutyne parity.

- ``adam``: torch.optim.Adam semantics (reference __main__.py:234) — L2
  weight decay is *added to the gradient before* the moment updates
  (torch-style, not AdamW-decoupled), lr injected as a mutable
  hyperparameter so the plateau scheduler can change it between epochs.
- ``ReduceLROnPlateau``: torch scheduler semantics with mode='max',
  threshold_mode='abs' (reference __main__.py:244-250).
- ``EarlyStopping``: Poutyne/Keras semantics — min_delta, patience, mode
  (reference __main__.py:252-258).

Both controllers are host-side: they watch a scalar metric once per epoch;
only the resulting lr reaches the device (as a donated scalar).
"""
from __future__ import annotations

import math

import optax


def adam(learning_rate: float, weight_decay: float = 0.0,
         b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) parity (grad-coupled L2)."""
    return optax.inject_hyperparams(_adam_inner)(
        learning_rate=learning_rate, weight_decay=weight_decay,
        b1=b1, b2=b2, eps=eps)


def _adam_inner(learning_rate, weight_decay, b1, b2, eps):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),  # torch: grad += wd * p
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale(-1.0 * learning_rate),
    )


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected lr of an ``adam`` optimizer state."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau, host-side.

    Reference config (__main__.py:244-250): monitor val_miou, mode='max',
    factor=0.2, patience=3, threshold=1e-1, threshold_mode='abs'.
    """

    def __init__(self, mode: str = "max", factor: float = 0.2,
                 patience: int = 3, threshold: float = 1e-1,
                 threshold_mode: str = "abs", min_lr: float = 0.0,
                 cooldown: int = 0):
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.min_lr = min_lr
        self.cooldown = cooldown
        self.cooldown_counter = 0
        self.best = -math.inf if mode == "max" else math.inf
        self.num_bad_epochs = 0

    def _is_better(self, metric: float) -> bool:
        if self.threshold_mode == "abs":
            delta = self.threshold
        else:  # 'rel'
            delta = abs(self.best) * self.threshold
        if self.mode == "max":
            return metric > self.best + delta
        return metric < self.best - delta

    def step(self, metric: float, lr: float) -> float:
        """Observe the epoch metric; return the (possibly reduced) lr."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            lr = max(lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return lr


class EarlyStopping:
    """Poutyne EarlyStopping (__main__.py:252-258): stop after ``patience``
    epochs without an improvement greater than ``min_delta``."""

    def __init__(self, mode: str = "max", min_delta: float = 1e-1,
                 patience: int = 8, verbose: bool = True):
        self.mode = mode
        self.min_delta = abs(min_delta)
        self.patience = patience
        self.verbose = verbose
        self.best = -math.inf if mode == "max" else math.inf
        self.wait = 0
        self.stopped_epoch = 0

    def step(self, metric: float, epoch: int) -> bool:
        """Observe the epoch metric; return True when training must stop."""
        improved = (metric > self.best + self.min_delta
                    if self.mode == "max"
                    else metric < self.best - self.min_delta)
        if improved:
            self.best = metric
            self.wait = 0
            return False
        self.wait += 1
        if self.wait >= self.patience:
            self.stopped_epoch = epoch
            if self.verbose:
                print(f"Epoch {epoch}: early stopping")
            return True
        return False


def make_training_deterministic(seed: int) -> "np.random.RandomState":
    """Reference make_training_deterministic parity (utils.py:195-198):
    seeds Python ``random``, global legacy numpy, and torch when present.

    The JAX side threads explicit PRNG keys instead of global state
    (SURVEY.md C12); this exists for host-side code and reference-script
    compatibility. Returns a RandomState(seed) — the same MT19937 stream
    the reference's global np.random yields after seeding — for callers
    that want an explicit handle.
    """
    import random as _random

    import numpy as np

    _random.seed(seed)
    np.random.seed(seed)
    try:
        import torch
        torch.manual_seed(seed)
    except ImportError:
        pass
    return np.random.RandomState(seed)
