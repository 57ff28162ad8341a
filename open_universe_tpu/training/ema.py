"""Exponential moving average of parameters.

Parity target: torch_ema.ExponentialMovingAverage as used by the reference
(universe.py:119-127, decay 0.999): update ema <- d*ema + (1-d)*p with the
num_updates decay ramp d = min(decay, (1+n)/(10+n)), EMA-for-eval
semantics handled by the caller (checkpoint stores both trees).
"""
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EmaState:
    params: Any
    num_updates: jnp.ndarray  # int32 scalar
    decay: float = struct.field(pytree_node=False)


def ema_init(params, decay: float = 0.999) -> EmaState:
    return EmaState(params=jax.tree_util.tree_map(jnp.array, params),
                    num_updates=jnp.zeros((), jnp.int32), decay=decay)


def ema_update(state: EmaState, new_params) -> EmaState:
    n = state.num_updates + 1
    d = jnp.minimum(state.decay, (1.0 + n) / (10.0 + n))
    new_ema = jax.tree_util.tree_map(
        lambda e, p: e * d + p * (1.0 - d), state.params, new_params)
    return state.replace(params=new_ema, num_updates=n)
