"""Original UNIVERSE trainer (score matching + MDN auxiliary losses).

Parity target: reference ``Universe`` training path
(universe.py:472-586 + _old/universe_original.yaml): single AdamW over
score net + conditioner + the two MDN loss heads; loss =
w_score * MSE(sigma*score, -z) + w_signal * MDN(y_est, target)
+ w_latent * MDN(h_latent, unit-norm mel(target)); EMA over the model
(not loss-head) parameters.
"""
import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion.sigma_sampling import adaptive_pr_cum, sample_sigma
from ..losses.mdn import MixtureDensityNetworkLoss
from ..models.universe.model import UniverseModel
from .clipping import clip_global_transform, global_norm
from .ema import EmaState, ema_init, ema_update
from .gan_trainer import _wd_mask
from .schedules import linear_warmup_cosine_annealing


@dataclasses.dataclass(frozen=True)
class MdnTrainConfig:
    weight_score: float = 1.0
    weight_signal: float = 1.0
    weight_latent: float = 1.0
    mdn_n_comp: int = 3
    mdn_alpha_per_sample: bool = True
    audio_len_s: float = 4.0
    lr: float = 2e-4
    betas: Tuple[float, float] = (0.8, 0.99)
    weight_decay: float = 0.01
    grad_clip: float = 1000.0
    t_warmup: int = 50000
    t_cosine: int = 50001
    t_max: int = 300000
    eta_min: float = 1.6e-6
    time_sampling: str = "time_uniform"
    dynamic_mixing: bool = False
    ema_decay: float = 0.999
    with_noise_target: bool = False
    adaptive_n_bins: int = 5  # bins for time_sampling="adaptive"
    accumulate_grad_batches: int = 1  # optimizer applies every k micro-steps
    remat: bool = False  # recompute the forward in backward (HBM for FLOPs)


@struct.dataclass
class MdnTrainState:
    params: Any          # {"score","cond","loss_signal","loss_latent"}
    opt: Any
    ema: EmaState        # over {"score","cond"} only
    step: jnp.ndarray
    sigma_pr_cum: Any = None  # adaptive time-sampling distribution


class MdnTrainer:
    def __init__(self, model: UniverseModel,
                 cfg: MdnTrainConfig = MdnTrainConfig()):
        self.model = model
        self.cfg = cfg
        fs = model.cfg.fs
        num_targets = 2 if cfg.with_noise_target else 1
        # diffusion-domain time length (samples, or STFT frames when a
        # spectral transform is configured)
        diff_len = model.diffusion_len(int(fs * cfg.audio_len_s))
        self.loss_signal = MixtureDensityNetworkLoss(
            est_channels=model.cfg.n_channels,
            tgt_channels=model.cfg.input_channels * num_targets,
            n_comp=cfg.mdn_n_comp,
            sample_len=diff_len,
            alpha_per_sample=cfg.mdn_alpha_per_sample,
        )
        # latent length = diffusion frames / tot_ds; waveform-mel length =
        # samples / (tot_ds * input_channels); they can differ by one frame
        # in the spectral-transform case, so the loss runs on the min
        mel_len = int(fs * cfg.audio_len_s) // (
            model.tot_ds * model.cfg.input_channels)
        self._latent_len = min(diff_len // model.tot_ds, mel_len)
        self.loss_latent = MixtureDensityNetworkLoss(
            est_channels=model.latent_n_channels,
            tgt_channels=model.cfg.n_mels * num_targets,
            n_comp=cfg.mdn_n_comp,
            sample_len=self._latent_len,
            alpha_per_sample=cfg.mdn_alpha_per_sample,
        )

        sched = linear_warmup_cosine_annealing(
            cfg.lr, cfg.t_warmup, cfg.t_cosine, cfg.t_max, cfg.eta_min)
        self._sched = sched
        # clip inside the chain: under accumulation the applied update is
        # clip(mean(g)), not mean(clip(g))
        self.tx = optax.chain(
            clip_global_transform(cfg.grad_clip),
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]),
            optax.add_decayed_weights(cfg.weight_decay, mask=_wd_mask),
            optax.scale_by_learning_rate(sched),
        )
        if cfg.accumulate_grad_batches > 1:
            self.tx = optax.MultiSteps(self.tx, cfg.accumulate_grad_batches)

    def init(self, key, batch: int = 1) -> MdnTrainState:
        fs = self.model.cfg.fs
        t = int(fs * self.cfg.audio_len_s)
        kg, ks, kl = jax.random.split(key, 3)
        gen = self.model.init(kg, example_len=t, batch=batch)
        x_wav = jnp.zeros((batch, t, 1))
        x, _ = self.model.apply_transform(x_wav)
        cond, y_est, h = self.model.apply_cond(gen, x, x_wav=x_wav)
        tl = self._latent_len
        params = {
            "score": gen["score"],
            "cond": gen["cond"],
            "loss_signal": self.loss_signal.init(ks, y_est, x)["params"],
            "loss_latent": self.loss_latent.init(
                kl, h[:, :tl], jnp.zeros((batch, tl,
                                          self.model.cfg.n_mels)))["params"],
        }
        ema_tree = {"score": params["score"], "cond": params["cond"]}
        pr_cum = None
        if self.cfg.time_sampling == "adaptive":
            pr_cum = adaptive_pr_cum(jnp.ones((self.cfg.adaptive_n_bins,)))
        return MdnTrainState(params=params, opt=self.tx.init(params),
                             ema=ema_init(ema_tree, self.cfg.ema_decay),
                             step=jnp.zeros((), jnp.int32),
                             sigma_pr_cum=pr_cum)

    def update_adaptive_sampling(self, state: MdnTrainState, bin_losses
                                 ) -> MdnTrainState:
        """Refresh the adaptive-sigma distribution from per-bin val losses
        (reference universe.py:630-638)."""
        if self.cfg.time_sampling != "adaptive":
            return state
        return state.replace(sigma_pr_cum=adaptive_pr_cum(bin_losses))

    def val_score_losses(self, state: MdnTrainState, batch, key,
                         n_bins: int = 5, use_ema: bool = True):
        """Per-sigma-bin validation score losses (reference
        universe.py:606-650) — feeds val/score, the best-checkpoint
        monitor, and the adaptive-sampling update."""
        model = self.model
        mix, target = batch[0], batch[1]
        if use_ema:
            params = dict(state.params)
            params.update(state.ema.params)  # score/cond from EMA
        else:
            params = state.params
        (mix, target), *_ = model.normalize_batch((mix, target))
        mix, _ = model.pad(mix)
        target, _ = model.pad(target)
        tb = jnp.linspace(0.0, 1.0, n_bins + 1)
        losses = []
        for i in range(n_bins):
            key, kl = jax.random.split(key)
            losses.append(self.compute_losses(
                params, mix, target, kl, time_sampling="time_uniform",
                t_min=float(i) / n_bins, t_max=float(i + 1) / n_bins,
                train=False))
        return jnp.stack(losses), tb

    def compute_losses(self, params, mix, target, key,
                       time_sampling=None, t_min=0.0, t_max=1.0,
                       train: bool = True, sigma_pr_cum=None,
                       fixed_noise=None):
        """Score + MDN losses on a *normalized* (mix, target) pair.

        ``fixed_noise=(sigma, z)`` replaces the PRNG draws for
        identical-noise parity tests vs the reference
        ``Universe.compute_losses`` (universe.py:472-542)."""
        cfg = self.cfg
        model = self.model
        ts = time_sampling or cfg.time_sampling
        ks, kz = jax.random.split(key)

        # spectrogram-domain diffusion (reference universe.py:482-488):
        # diffuse and score in the transformed domain, signal MDN loss on
        # the transformed target, latent MDN loss on the waveform mel
        mix_wav, target_wav = mix, target
        mix, _ = model.apply_transform(mix)
        target, _ = model.apply_transform(target)

        if fixed_noise is not None:
            sigma, z = fixed_noise
        else:
            sigma, _ = sample_sigma(
                ks, mix.shape[0], model.cfg.diffusion, ts, t_min=t_min,
                t_max=t_max, adaptive_pr_cum=sigma_pr_cum,
                adaptive_bins=jnp.linspace(0.0, 1.0, cfg.adaptive_n_bins + 1))
            z = jax.random.normal(kz, target.shape, target.dtype)
        x_t = target + sigma[:, None, None] * z

        gen = {"score": params["score"], "cond": params["cond"]}
        cond, y_est, h_est = model.apply_cond(gen, mix, x_wav=mix_wav)
        score = model.score_fn(gen)(x_t, sigma, cond)
        l_score = jnp.mean((sigma[:, None, None] * score + z) ** 2)
        if not train:
            return l_score

        if cfg.with_noise_target:
            # noise is defined in the waveform domain and transformed
            # (reference universe.py:486-488: cat(tgt_trans, transform(noise)))
            noise_wav = mix_wav - target_wav
            noise_t, _ = model.apply_transform(noise_wav)
            target_aux = jnp.concatenate([target, noise_t], axis=-1)
            target_aux_wav = jnp.concatenate([target_wav, noise_wav], axis=-1)
        else:
            target_aux = target
            target_aux_wav = target_wav

        l_signal = self.loss_signal.apply(
            {"params": params["loss_signal"]}, y_est, target_aux)

        mel_target = model.compute_mel_spec(target_aux_wav)
        mel_norm = jnp.sqrt(jnp.sum(mel_target**2, axis=(-2, -1),
                                    keepdims=True))
        mel_target = mel_target / jnp.maximum(mel_norm, 1e-5)
        # spectral transform: latent frames (tot_ds-padded STFT) and the
        # waveform-mel frame count can differ by the center=True frame —
        # crop both to the common length
        t_common = self._latent_len
        l_latent = self.loss_latent.apply(
            {"params": params["loss_latent"]},
            h_est[:, :t_common], mel_target[:, :t_common])

        loss = (cfg.weight_score * l_score
                + cfg.weight_signal * l_signal
                + cfg.weight_latent * l_latent)
        return loss, (l_score, l_signal, l_latent)

    def train_step(self, state: MdnTrainState, batch, key
                   ) -> Tuple[MdnTrainState, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        mix, target = batch[0], batch[1]
        k_mix, k_loss = jax.random.split(key)

        if cfg.dynamic_mixing:
            noise = mix - target
            perm = jax.random.permutation(k_mix, mix.shape[0])
            mix = target + noise[perm]

        (mix, target), *_ = self.model.normalize_batch((mix, target))

        def loss_fn(params):
            return self.compute_losses(params, mix, target, k_loss,
                                       sigma_pr_cum=state.sigma_pr_cum)

        if cfg.remat:
            loss_fn = jax.checkpoint(loss_fn)
        (loss, (l_score, l_signal, l_latent)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        gnorm = global_norm(grads)  # logging-only; clip is inside self.tx
        upd, new_opt = self.tx.update(grads, state.opt, state.params)
        new_params = optax.apply_updates(state.params, upd)
        new_ema = ema_update(state.ema, {"score": new_params["score"],
                                         "cond": new_params["cond"]})
        metrics = {
            "train/loss": loss,
            "train/score": l_score,
            "train/signal": l_signal,
            "train/latent": l_latent,
            "grad/norm": gnorm,
            "lr": self._sched(state.step
                  // self.cfg.accumulate_grad_batches),
        }
        return MdnTrainState(params=new_params, opt=new_opt, ema=new_ema,
                             step=state.step + 1,
                             sigma_pr_cum=state.sigma_pr_cum), metrics
