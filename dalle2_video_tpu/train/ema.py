"""EMA shadow parameters as a pure pytree transform.

Replaces the inherited lucidrains ``EMA`` module (reference trainer.py:92-93,
270-272; config knobs at configs/celebv-text.yaml:73-76: beta=0.99,
update_after_step=1000, update_every=10). Same decay spec: before
``update_after_step`` the shadow copies the online params; after, decay
follows 1 - (1 + k/inv_gamma)^-power clamped to [min_value, beta].

Sharding: the EMA tree mirrors the online params' sharding (it is produced
by elementwise ops on them), so under pjit it stays sharded like the model.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    beta: float = 0.99
    update_after_step: int = 1000
    update_every: int = 10
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0
    min_value: float = 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EMAState:
    params: Any  # shadow pytree
    step: jnp.ndarray  # () int32 — number of update() calls so far


def ema_init(params: Any) -> EMAState:
    return EMAState(params=jax.tree_util.tree_map(jnp.asarray, params),
                    step=jnp.zeros((), jnp.int32))


def current_decay(step: jnp.ndarray, cfg: EMAConfig) -> jnp.ndarray:
    """Decay at a given update step (lucidrains ema-pytorch get_current_decay)."""
    epoch = jnp.clip(step - cfg.update_after_step - 1, 0)
    value = 1.0 - (1.0 + epoch / cfg.inv_gamma) ** -cfg.power
    value = jnp.clip(value, cfg.min_value, cfg.beta)
    return jnp.where(epoch <= 0, 0.0, value)


def ema_update(state: EMAState, online_params: Any, cfg: EMAConfig) -> EMAState:
    """One update() call. Honors update_every (no-op steps keep the shadow)
    and the warmup copy phase."""
    step = state.step + 1
    should = (step % cfg.update_every) == 0
    decay = current_decay(step, cfg)

    def blend(ema_p, online_p):
        new = ema_p * decay + online_p.astype(ema_p.dtype) * (1.0 - decay)
        return jnp.where(should, new, ema_p)

    new_params = jax.tree_util.tree_map(blend, state.params, online_params)
    return EMAState(params=new_params, step=step)
