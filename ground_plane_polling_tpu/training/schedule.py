"""Learning-rate scheduling: reduce-on-plateau.

Mirrors the reference's keras ReduceLROnPlateau on the training loss
(/root/reference/keras_retinanet_3D/bin/train.py:184-193: factor 0.1,
patience 2, min_delta 1e-4). Host-side state machine; the new lr is written
into TrainState.lr, so no recompilation happens.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["ReduceLROnPlateau"]


@dataclasses.dataclass
class ReduceLROnPlateau:
    factor: float = 0.1
    patience: int = 2
    min_delta: float = 1e-4
    min_lr: float = 0.0
    cooldown: int = 0

    best: float = float("inf")
    wait: int = 0
    cooldown_counter: int = 0

    def update(self, state, metric: float):
        """Feed the epoch metric; returns (state, reduced: bool)."""
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.wait = 0

        if metric < self.best - self.min_delta:
            self.best = metric
            self.wait = 0
            return state, False

        if self.cooldown_counter > 0:
            return state, False

        self.wait += 1
        if self.wait >= self.patience:
            new_lr = max(float(state.lr) * self.factor, self.min_lr)
            state = state._replace(lr=jnp.asarray(new_lr, jnp.float32))
            self.wait = 0
            self.cooldown_counter = self.cooldown
            return state, True
        return state, False
