"""Stochastic weight averaging over params AND batch stats.

Functional equivalent of the reference's ``AveragedModel`` override that
also averages buffers (utils/train_util.py:349-374 — unused by the
reference runners but part of the capability surface).  Usage::

    swa = SWAState.create(state)
    ...
    swa = swa.update(state)            # after each epoch past swa_start
    eval_state = swa.as_train_state(state)
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.training.train_state import TrainState


@flax.struct.dataclass
class SWAState:
    params: Any
    batch_stats: Any
    n_averaged: jnp.ndarray

    @classmethod
    def create(cls, state: TrainState) -> "SWAState":
        return cls(params=state.params, batch_stats=state.batch_stats,
                   n_averaged=jnp.zeros((), jnp.int32))

    def update(self, state: TrainState) -> "SWAState":
        """Running average: avg += (new - avg) / (n + 1)."""
        n = self.n_averaged

        def avg(old, new):
            return jnp.where(
                n == 0, new,
                old + (new - old) / (n + 1).astype(old.dtype))

        return SWAState(
            params=jax.tree.map(avg, self.params, state.params),
            batch_stats=jax.tree.map(avg, self.batch_stats,
                                     state.batch_stats),
            n_averaged=n + 1)

    def as_train_state(self, template: TrainState) -> TrainState:
        return template.replace(params=self.params,
                                batch_stats=self.batch_stats)
