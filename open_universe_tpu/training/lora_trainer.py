"""LoRA fine-tuning of a pretrained UNIVERSE(++): backprop through the
last k diffusion steps.

Parity target: reference ``UniverseLoRA`` (networks/universe/lora.py:39-479):
load a pretrained model (EMA weights folded in, weight norm removed),
inject LoRA adapters into score + conditioner, freeze everything except
LoRA factors and biases, then train by running the full sampler with
gradients enabled only for the last ``n_steps_backprop`` steps
(lora.py:300-379), or the randomized ``partial_diffusion`` variant
(lora.py:231-298). Losses: MultiLoss on the enhanced waveform (typically
MultiResL1SpecLoss) + optional HiFi-GAN generator losses against the
pretrained discriminators.

JAX design: the "no-grad prefix" of the sampler is expressed with
``stop_gradient`` on the carried state, so one jit covers the whole
forward; LoRA weights are merged on the fly each step (rank-r outer
products are negligible next to the U-Net matmuls).
"""
import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion.schedule import get_std_dev, sampler_coefficients
from ..losses.combine import MultiLoss
from ..losses.gan import feature_loss, generator_loss
from ..lora.adapters import (
    apply_lora,
    combine_params,
    fold_weight_norm,
    init_lora,
    partition_trainable,
)
from ..models.universe.model import UniverseModel
from .clipping import clip_by_global_norm
from .ema import EmaState, ema_init, ema_update
from .schedules import linear_warmup_cosine_annealing


@dataclasses.dataclass(frozen=True)
class LoraTrainConfig:
    lora_rank: int = 16
    lora_alpha: Optional[float] = None
    lora_train_biases: bool = True
    n_steps_backprop: int = 1
    use_partial_diffusion: bool = False
    use_hifigan_loss: bool = False
    weight_hifigan_loss: float = 1.0
    lr: float = 1e-4
    betas: Tuple[float, float] = (0.8, 0.99)
    weight_decay: float = 0.0
    grad_clip: float = 1000.0
    t_warmup: int = 1000
    t_cosine: int = 1001
    t_max: int = 100000
    eta_min: float = 1e-6
    ema_decay: float = 0.0


@struct.dataclass
class LoraTrainState:
    lora: Any
    train_extra: Any   # trainable bias subtree
    opt: Any
    ema: Optional[EmaState]
    step: jnp.ndarray


class UniverseLoRATrainer:
    def __init__(self, model: UniverseModel, pretrained_params,
                 losses: MultiLoss, cfg: LoraTrainConfig = LoraTrainConfig(),
                 disc_params=None, discriminators=None):
        """pretrained_params: the (EMA) generator params of the base model.

        Weight norm is folded, so `model` must be built with
        use_weight_norm=False (use ``lora_ready_model``).
        """
        self.model = model
        self.cfg = cfg
        self.losses = losses
        self.disc_params = disc_params
        self.discriminators = discriminators
        if cfg.use_hifigan_loss and (disc_params is None
                                     or discriminators is None):
            raise ValueError("hifigan loss requires disc_params + modules")

        folded = fold_weight_norm(pretrained_params)
        self.train_bias_tmpl, self.frozen = partition_trainable(
            folded, train_biases=cfg.lora_train_biases)

    @staticmethod
    def lora_ready_model(model: UniverseModel) -> UniverseModel:
        """Rebuild the model without weight-norm parameterization."""
        cfg = dataclasses.replace(model.cfg, use_weight_norm=False)
        return UniverseModel(cfg)

    def init(self, key) -> LoraTrainState:
        base = combine_params(self.train_bias_tmpl, self.frozen)
        lora = init_lora(key, base, rank=self.cfg.lora_rank,
                         alpha=self.cfg.lora_alpha)
        trainable = (lora, self.train_bias_tmpl)
        ema = (ema_init(trainable, self.cfg.ema_decay)
               if self.cfg.ema_decay > 0 else None)
        return LoraTrainState(
            lora=lora, train_extra=self.train_bias_tmpl,
            opt=self._tx().init(trainable), ema=ema,
            step=jnp.zeros((), jnp.int32))

    def _tx(self):
        cfg = self.cfg
        sched = linear_warmup_cosine_annealing(
            cfg.lr, cfg.t_warmup, cfg.t_cosine, cfg.t_max, cfg.eta_min)
        self._sched = sched
        return optax.chain(
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_learning_rate(sched),
        )

    def effective_params(self, lora, train_extra):
        base = combine_params(train_extra, self.frozen)
        return apply_lora(base, lora, self.cfg.lora_rank, self.cfg.lora_alpha)

    # ------------------------------------------------------------- forward
    def forward(self, params, mix, key, n_steps=None):
        """Full sampler with grads only through the last k steps
        (reference lora.py:300-379)."""
        model = self.model
        dcfg = model.cfg.diffusion
        n = n_steps or dcfg.n_steps
        k_bp = self.cfg.n_steps_backprop

        mix_len = mix.shape[-2]
        mix, pad = model.pad(mix)
        (mix, _), *_ = model.normalize_batch((mix, None))

        sigma, eta, beta = sampler_coefficients(dcfg, n_steps=n)
        cond, aux, _ = model.apply_cond(params, mix)
        # signal-cond projections are fixed across the n sampler steps;
        # project once (differentiable — grads still reach LoRA adapters)
        cond = model.project_score_cond(params, cond)
        score_fn = model.score_fn(params, cond_projected=True)

        key, k0 = jax.random.split(key)
        x = sigma[0] * jax.random.normal(k0, mix.shape)
        for i in range(n - 1):
            key, kz = jax.random.split(key)
            s_now, s_next = sigma[i], sigma[i + 1]
            s_b = jnp.broadcast_to(s_now, (mix.shape[0],))
            score = score_fn(x, s_b, cond)
            z = s_next * jax.random.normal(kz, x.shape)
            x = x + s_now**2 * eta * score + beta * z
            if i < (n - 1) - k_bp:
                x = jax.lax.stop_gradient(x)
        s_b = jnp.broadcast_to(sigma[-1], (mix.shape[0],))
        x = x + sigma[-1] ** 2 * score_fn(x, s_b, cond)
        x = model.unpad(x, pad)
        t = x.shape[-2]
        if t < mix_len:
            x = jnp.pad(x, ((0, 0), (0, mix_len - t), (0, 0)))
        return x

    def partial_diffusion(self, params, mix, key, n_steps=None):
        """Per-sample random final time variant (reference lora.py:231-298)."""
        model = self.model
        dcfg = model.cfg.diffusion
        n = n_steps or dcfg.n_steps
        k_bp = self.cfg.n_steps_backprop

        (mix, _), *_ = model.normalize_batch((mix, None))
        key, kt, k0 = jax.random.split(key, 3)
        t_final = jax.random.uniform(kt, (mix.shape[0],))
        delta_t = (1.0 - t_final) / (n - 1)
        ratio = dcfg.sigma_max / dcfg.sigma_min
        gamma = ratio**-delta_t
        eta = 1.0 - gamma**dcfg.epsilon
        beta = jnp.sqrt(1.0 - gamma ** (2.0 * (dcfg.epsilon - 1.0)))

        time = jnp.ones((mix.shape[0],))
        sigma = get_std_dev(time, dcfg)
        cond, aux, _ = model.apply_cond(params, mix)
        cond = model.project_score_cond(params, cond)
        score_fn = model.score_fn(params, cond_projected=True)

        x = sigma[:, None, None] * jax.random.normal(k0, mix.shape)
        for i in range(n - 1):
            key, kz = jax.random.split(key)
            score = score_fn(x, sigma, cond)
            time = time - delta_t
            sigma_next = get_std_dev(time, dcfg)
            z = sigma_next[:, None, None] * jax.random.normal(kz, x.shape)
            x = (x + sigma[:, None, None] ** 2 * eta[:, None, None] * score
                 + beta[:, None, None] * z)
            sigma = sigma_next
            if i < (n - 1) - k_bp:
                x = jax.lax.stop_gradient(x)
        x = x + sigma[:, None, None] ** 2 * score_fn(x, sigma, cond)
        return x

    # ---------------------------------------------------------- train step
    def train_step(self, state: LoraTrainState, batch, key
                   ) -> Tuple[LoraTrainState, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        mix, target = batch[0], batch[1]
        (_, target_n), *_ = self.model.normalize_batch((mix, target))

        def loss_fn(trainable):
            lora, extra = trainable
            params = self.effective_params(lora, extra)
            if cfg.use_partial_diffusion:
                enh = self.partial_diffusion(params, mix, key)
            else:
                enh = self.forward(params, mix, key)
            total, parts = self.losses(enh, target_n, with_dict=True)
            if cfg.use_hifigan_loss:
                mpd, mrd = self.discriminators
                # paired=False: only the enhanced half carries gradients
                rf, gf, fr, fg = mpd.apply(
                    {"params": self.disc_params["mpd"]}, target_n, enh,
                    paired=False)
                lg_f, _ = generator_loss(gf)
                fm_f = feature_loss(fr, fg)
                rs, gs, fr2, fg2 = mrd.apply(
                    {"params": self.disc_params["mrd"]}, target_n, enh,
                    paired=False)
                lg_s, _ = generator_loss(gs)
                fm_s = feature_loss(fr2, fg2)
                gan = lg_f + lg_s + fm_f + fm_s
                total = total + cfg.weight_hifigan_loss * gan
                parts = {**parts, "hifigan": gan}
            return total, parts

        trainable = (state.lora, state.train_extra)
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable)
        grads, gnorm = clip_by_global_norm(grads, cfg.grad_clip)
        tx = self._tx()
        upd, new_opt = tx.update(grads, state.opt, trainable)
        new_lora, new_extra = optax.apply_updates(trainable, upd)
        new_ema = (ema_update(state.ema, (new_lora, new_extra))
                   if state.ema is not None else None)
        metrics = {"train/loss": loss, "grad/norm": gnorm,
                   **{f"train/{k}": v for k, v in parts.items()}}
        return LoraTrainState(lora=new_lora, train_extra=new_extra,
                              opt=new_opt, ema=new_ema,
                              step=state.step + 1), metrics
