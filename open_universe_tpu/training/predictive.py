"""Generic supervised (predictive, non-diffusion) enhancement trainer.

Parity target: reference ``BaseModel``/``EnhancementBaseModel``
(networks/enhancement/base.py:32,173): normalize the batch, run a
predictive model mix->enh, apply a weighted MultiLoss, single AdamW with
warmup-cosine schedule and grad clipping.
"""
import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses.combine import MultiLoss
from ..utils.norm import normalize_batch
from .clipping import clip_by_global_norm
from .ema import EmaState, ema_init, ema_update
from .gan_trainer import _wd_mask
from .schedules import linear_warmup_cosine_annealing


@dataclasses.dataclass(frozen=True)
class PredictiveTrainConfig:
    lr: float = 2e-4
    betas: Tuple[float, float] = (0.8, 0.99)
    weight_decay: float = 0.01
    grad_clip: float = 1000.0
    t_warmup: int = 10000
    t_cosine: int = 10001
    t_max: int = 200000
    eta_min: float = 1.6e-6
    ema_decay: float = 0.999
    normalization_norm: object = 2
    normalization_level_db: float = -26.0
    normalization_ref: str = "both"


@struct.dataclass
class PredictiveTrainState:
    params: Any
    opt: Any
    ema: EmaState
    step: jnp.ndarray


class PredictiveTrainer:
    """model_fn(params, mix, key) -> enhanced waveform; losses: MultiLoss."""

    def __init__(self, model_fn: Callable, losses: MultiLoss,
                 cfg: PredictiveTrainConfig = PredictiveTrainConfig()):
        self.model_fn = model_fn
        self.losses = losses
        self.cfg = cfg
        self._sched = linear_warmup_cosine_annealing(
            cfg.lr, cfg.t_warmup, cfg.t_cosine, cfg.t_max, cfg.eta_min)
        self.tx = optax.chain(
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]),
            optax.add_decayed_weights(cfg.weight_decay, mask=_wd_mask),
            optax.scale_by_learning_rate(self._sched),
        )

    def init_state(self, params) -> PredictiveTrainState:
        return PredictiveTrainState(
            params=params, opt=self.tx.init(params),
            ema=ema_init(params, self.cfg.ema_decay),
            step=jnp.zeros((), jnp.int32))

    def train_step(self, state: PredictiveTrainState, batch, key
                   ) -> Tuple[PredictiveTrainState, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        mix, target = batch[0], batch[1]
        (mix, target), *_ = normalize_batch(
            (mix, target), norm=cfg.normalization_norm,
            level_db=cfg.normalization_level_db, ref=cfg.normalization_ref)

        def loss_fn(params):
            enh = self.model_fn(params, mix, key)
            total, d = self.losses(enh, target, with_dict=True)
            return total, d

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads, gnorm = clip_by_global_norm(grads, cfg.grad_clip)
        upd, new_opt = self.tx.update(grads, state.opt, state.params)
        new_params = optax.apply_updates(state.params, upd)
        metrics = {"train/loss": loss, "grad/norm": gnorm,
                   **{f"train/{k}": v for k, v in parts.items()}}
        return PredictiveTrainState(
            params=new_params, opt=new_opt,
            ema=ema_update(state.ema, new_params),
            step=state.step + 1), metrics
