"""UNIVERSE++ adversarial trainer (generator + MPD/MRD discriminators).

Parity target: reference ``UniverseGAN.training_step``
(universe_gan.py:153-354) and its two-optimizer manual loop:
  1. forward the generator once (conditioner + score + decoupling head),
  2. update the discriminators on the detached signal estimate,
  3. update the generator through the *updated* discriminators with
     score MSE + 45 x L1-mel + LS-GAN generator/feature-matching terms.

TPU design: the whole step is ONE jit'ed function. The generator forward
is computed once with ``jax.vjp``; after the discriminator update the
generator gradients are pulled back through the saved linearization, so
the expensive U-Net forward is not recomputed (the reference reuses its
autograd graph the same way).

Deliberate fixes of reference bugs (SURVEY.md §7 "hard parts"):
  - the discriminator optimizer receives BOTH MPD and MRD parameters
    (reference passes MRD twice and MPD never, universe_gan.py:417-419);
  - the signal-decoupling head is part of the generator optimizer
    (reference omits it from both optimizers, universe_gan.py:390).
"""
import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion.sigma_sampling import adaptive_pr_cum, sample_sigma
from ..losses.gan import discriminator_loss, feature_loss, generator_loss
from ..models.bigvgan.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
)
from ..models.universe.model import UniverseModel
from .clipping import (
    clip_by_global_norm,
    clip_subtrees_transform,
    global_norm,
)
from .ema import EmaState, ema_init, ema_update
from .schedules import linear_warmup_cosine_annealing


@dataclasses.dataclass(frozen=True)
class GanTrainConfig:
    # losses (config/model/default.yaml:48-64)
    weight_score: float = 1.0
    weight_mel_l1: float = 45.0
    disc_freeze_step: int = 0
    mpd_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    mrd_resolutions: Tuple[Tuple[int, int, int], ...] = (
        (1024, 120, 600), (2048, 240, 1200), (512, 50, 240))
    # optimizer (config/model/default.yaml:82-98)
    lr: float = 2e-4
    betas: Tuple[float, float] = (0.8, 0.99)
    weight_decay: float = 0.01
    grad_clip_score: float = 1000.0
    grad_clip_cond: float = 1000.0
    grad_clip_mpd: float = 1000.0
    grad_clip_mrd: float = 1000.0
    # the signal-decoupling head is OUR addition to the generator
    # optimizer (the reference omits it from both optimizers,
    # universe_gan.py:390, so it also never clips it); None = unclipped
    grad_clip_decoupling: Optional[float] = None
    # scheduler, in scheduler-steps = 2 x batches (see schedules.py note)
    t_warmup: int = 20000
    t_cosine: int = 400000
    t_max: int = 600000
    eta_min: float = 1.6e-6
    # training (config/model/default.yaml:66-70)
    time_sampling: str = "time_normal_0.95"
    adaptive_n_bins: int = 5  # bins for time_sampling="adaptive"
    dynamic_mixing: bool = False
    ema_decay: float = 0.999
    # gradient accumulation (reference accumulate_grad_batches,
    # config/model/default.yaml:83): optimizers apply every k micro-steps
    accumulate_grad_batches: int = 1
    # rematerialize the generator forward during the pullback: trades one
    # extra U-Net forward for not keeping its residuals in HBM, letting the
    # batch (and MXU efficiency) grow on a fixed-HBM chip
    remat: bool = False
    # rematerialize the discriminator forwards (disc update + generator
    # GAN terms): disc activations are the largest train-step tensors
    # (B x T x 128+ per MPD level, B x F x T' x 32 per MRD level); with
    # remat they are recomputed in the backward instead of held in HBM,
    # which is what lets batch 64 fit on a 16 GB chip
    remat_disc: bool = False
    # gradient-attribution diagnostics (~3x step cost: one extra vjp
    # pullback per loss family). Logs, per generator subtree, the
    # pre-clip grad norm contributed by (a) the score MSE, (b) the L1
    # mel term, (c) the GAN generator/feature-matching terms, plus
    # per-submodule conditioner norms and weight-norm parameter
    # magnitudes — the instrumentation used to root-cause the round-4
    # late-run grad/cond explosion
    debug_grads: bool = False


@struct.dataclass
class GanTrainState:
    gen_params: Any
    disc_params: Any
    gen_opt: Any
    disc_opt: Any
    ema: EmaState
    step: jnp.ndarray
    # cumulative per-bin sampling distribution for time_sampling="adaptive"
    # (reference pr_cum, universe.py:630-638); None for other strategies
    sigma_pr_cum: Any = None


def _wd_mask(params):
    """True = apply weight decay; excludes bias/prelu-style params
    (reference weight_decay_exclude [prelu, bias],
    config/model/default.yaml:89)."""
    def keep(path, _):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        leaf = keys[-1] if keys else ""
        if leaf in ("bias", "alpha", "beta", "ln_bias", "b_ih", "b_hh"):
            return False
        if any("prelu" in str(k) or str(k) == "act" for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


class GanTrainer:
    def __init__(self, model: UniverseModel,
                 cfg: GanTrainConfig = GanTrainConfig()):
        self.model = model
        self.cfg = cfg
        self.mpd = MultiPeriodDiscriminator(periods=cfg.mpd_periods)
        self.mrd = MultiResolutionDiscriminator(
            resolutions=cfg.mrd_resolutions)

        sched = linear_warmup_cosine_annealing(
            cfg.lr, cfg.t_warmup, cfg.t_cosine, cfg.t_max, cfg.eta_min)
        # optimizer count advances once per batch; the reference advances its
        # schedulers twice per batch, so scale the count by 2
        self._sched = lambda count: sched(2 * count)

        # clipping lives INSIDE the chains so that under gradient
        # accumulation the applied update is clip(mean(g)), not mean(clip(g))
        self.gen_tx = optax.chain(
            clip_subtrees_transform({"score": cfg.grad_clip_score,
                                     "cond": cfg.grad_clip_cond,
                                     "decoupling": cfg.grad_clip_decoupling}),
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]),
            optax.add_decayed_weights(cfg.weight_decay, mask=_wd_mask),
            optax.scale_by_learning_rate(self._sched),
        )
        self.disc_tx = optax.chain(
            clip_subtrees_transform({"mpd": cfg.grad_clip_mpd,
                                     "mrd": cfg.grad_clip_mrd}),
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]),
            optax.add_decayed_weights(cfg.weight_decay),  # torch AdamW default
            optax.scale_by_learning_rate(self._sched),
        )
        if cfg.accumulate_grad_batches > 1:
            k = cfg.accumulate_grad_batches
            self.gen_tx = optax.MultiSteps(self.gen_tx, k)
            self.disc_tx = optax.MultiSteps(self.disc_tx, k)

    def _lr_metric(self, step):
        """LR actually applied at this micro-step (MultiSteps-aware)."""
        return self._sched(step // self.cfg.accumulate_grad_batches)

    # ----------------------------------------------------------------- init
    def init(self, key, example_len: int = 1600, batch: int = 1
             ) -> GanTrainState:
        kg, kp, kr = jax.random.split(key, 3)
        gen_params = self.model.init(kg, example_len=example_len, batch=batch)
        x = jnp.zeros((batch, example_len, 1))
        disc_params = {
            "mpd": self.mpd.init(kp, x, x)["params"],
            "mrd": self.mrd.init(kr, x, x)["params"],
        }
        ema_tree = {k: gen_params[k] for k in gen_params}
        pr_cum = None
        if self.cfg.time_sampling == "adaptive":
            # uniform until the first validation updates it
            pr_cum = adaptive_pr_cum(jnp.ones((self.cfg.adaptive_n_bins,)))
        return GanTrainState(
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt=self.gen_tx.init(gen_params),
            disc_opt=self.disc_tx.init(disc_params),
            ema=ema_init(ema_tree, self.cfg.ema_decay),
            step=jnp.zeros((), jnp.int32),
            sigma_pr_cum=pr_cum,
        )

    def update_adaptive_sampling(self, state: GanTrainState, bin_losses
                                 ) -> GanTrainState:
        """Refresh the adaptive-sigma distribution from per-bin val losses
        (call after val_score_losses; reference universe.py:630-638)."""
        if self.cfg.time_sampling != "adaptive":
            return state
        return state.replace(sigma_pr_cum=adaptive_pr_cum(bin_losses))

    # ----------------------------------------------------------- train step
    def train_step(self, state: GanTrainState, batch, key,
                   fixed_noise=None
                   ) -> Tuple[GanTrainState, Dict[str, jnp.ndarray]]:
        """One optimization step. batch = (mix, target), each (B, T, 1).

        ``fixed_noise=(sigma, z)`` is the parity-test hook: it replaces
        the PRNG draws so the step can be compared against the
        reference's torch ``training_step`` (universe_gan.py:153-354)
        on identical noise."""
        cfg = self.cfg
        model = self.model
        mix, target = batch[0], batch[1]
        target_original = batch[2] if len(batch) > 2 else target

        k_mix, k_sigma, k_z = jax.random.split(key, 3)

        if cfg.dynamic_mixing:
            noise = mix - target
            perm = jax.random.permutation(k_mix, mix.shape[0])
            mix = target + noise[perm]

        (mix, target, target_original), *_ = model.normalize_batch(
            (mix, target, target_original))

        # spectrogram-domain diffusion (reference universe_gan.py:180-181,
        # 201); identity transform is a no-op. Unlike the reference (which
        # feeds the transformed mix to the mel branch here but the waveform
        # at enhance time) the conditioner always gets the waveform mel.
        mix_wav = mix
        mix, n_frames = model.apply_transform(mix)
        target, _ = model.apply_transform(target)

        if fixed_noise is not None:
            sigma, z = fixed_noise
        else:
            sigma, _ = sample_sigma(
                k_sigma, mix.shape[0], model.cfg.diffusion, cfg.time_sampling,
                adaptive_pr_cum=state.sigma_pr_cum,
                adaptive_bins=jnp.linspace(0.0, 1.0, cfg.adaptive_n_bins + 1))
            z = jax.random.normal(k_z, target.shape, target.dtype)
        x_t = target + sigma[:, None, None] * z

        # one generator forward, saved for the later pullback
        def gen_forward(gen_params):
            cond, y_raw, _ = model.apply_cond(gen_params, mix, x_wav=mix_wav)
            score = model.score_fn(gen_params)(x_t, sigma, cond)
            y_est = model.aux_to_wav(gen_params, y_raw)
            # decouple in the diffusion domain, judge in the waveform
            # domain (reference universe_gan.py:199-201)
            y_est = model.inverse_transform(y_est, n_frames,
                                            mix_wav.shape[-2])
            return score, y_est

        if cfg.remat:
            gen_forward = jax.checkpoint(gen_forward)
        (score, y_est), gen_vjp = jax.vjp(gen_forward, state.gen_params)
        y_det = jax.lax.stop_gradient(y_est)

        mel_target = model.compute_mel_spec(target_original)

        # ---------------- discriminator update (on detached estimate)
        def _mpd_disc_loss(mpd_params, real, fake):
            rf, gf, _, _ = self.mpd.apply({"params": mpd_params}, real, fake)
            return discriminator_loss(rf, gf)[0]

        def _mrd_disc_loss(mrd_params, real, fake):
            rs, gs, _, _ = self.mrd.apply({"params": mrd_params}, real, fake)
            return discriminator_loss(rs, gs)[0]

        if cfg.remat_disc:
            _mpd_disc_loss = jax.checkpoint(_mpd_disc_loss)
            _mrd_disc_loss = jax.checkpoint(_mrd_disc_loss)

        def disc_loss_fn(disc_params):
            loss_f = _mpd_disc_loss(disc_params["mpd"], target_original, y_det)
            loss_s = _mrd_disc_loss(disc_params["mrd"], target_original, y_det)
            return loss_f + loss_s, (loss_f, loss_s)

        (loss_disc, (loss_mpd, loss_mrd)), disc_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params)

        # clipping happens inside disc_tx; norms here are logging-only
        gn_mpd = global_norm(disc_grads["mpd"])
        gn_mrd = global_norm(disc_grads["mrd"])

        disc_active = state.step >= cfg.disc_freeze_step

        def do_disc_update(_):
            upd, new_opt = self.disc_tx.update(disc_grads, state.disc_opt,
                                               state.disc_params)
            return optax.apply_updates(state.disc_params, upd), new_opt

        def skip_disc_update(_):
            return state.disc_params, state.disc_opt

        new_disc_params, new_disc_opt = jax.lax.cond(
            disc_active, do_disc_update, skip_disc_update, None)

        # ---------------- generator update (through updated discriminators)
        gate = disc_active.astype(jnp.float32)

        # paired=False: only the fake half needs input gradients here
        def _mpd_gen_losses(mpd_params, real, fake):
            rf, gf, fr, fg = self.mpd.apply(
                {"params": mpd_params}, real, fake, paired=False)
            return feature_loss(fr, fg), generator_loss(gf)[0]

        def _mrd_gen_losses(mrd_params, real, fake):
            rs, gs, fr2, fg2 = self.mrd.apply(
                {"params": mrd_params}, real, fake, paired=False)
            return feature_loss(fr2, fg2), generator_loss(gs)[0]

        if cfg.remat_disc:
            _mpd_gen_losses = jax.checkpoint(_mpd_gen_losses)
            _mrd_gen_losses = jax.checkpoint(_mrd_gen_losses)

        def downstream_loss(score, y_est):
            l_score = jnp.mean((sigma[:, None, None] * score + z) ** 2)
            mel_y = model.compute_mel_spec(y_est)
            loss_mel = jnp.mean(jnp.abs(mel_y - mel_target))

            loss_fm_f, loss_gen_f = _mpd_gen_losses(
                new_disc_params["mpd"], target_original, y_est)
            loss_fm_s, loss_gen_s = _mrd_gen_losses(
                new_disc_params["mrd"], target_original, y_est)

            loss = (cfg.weight_score * l_score
                    + cfg.weight_mel_l1 * loss_mel
                    + gate * (loss_gen_s + loss_gen_f + loss_fm_s + loss_fm_f))
            aux = {"score": l_score, "mel": loss_mel,
                   "mpd_gen": loss_gen_f, "mrd_gen": loss_gen_s,
                   "mpd_fm": loss_fm_f, "mrd_fm": loss_fm_s}
            return loss, aux

        grad_fn = jax.value_and_grad(downstream_loss, argnums=(0, 1),
                                     has_aux=True)
        (loss_gen, gen_aux), (d_score, d_yest) = grad_fn(score, y_est)
        (gen_grads,) = gen_vjp((d_score, d_yest))

        # clipping happens inside gen_tx; norms here are logging-only
        gn_score = global_norm(gen_grads["score"])
        gn_cond = global_norm(gen_grads["cond"])
        gn_dec = (global_norm(gen_grads["decoupling"])
                  if "decoupling" in gen_grads else jnp.zeros(()))

        debug_metrics = {}
        if cfg.debug_grads:
            # attribute the generator gradient to each loss family by
            # pulling back each family's cotangent separately through the
            # SAME saved linearization (no extra forwards without remat)
            zero_s = jnp.zeros_like(score)
            zero_y = jnp.zeros_like(y_est)
            d_score_term = jax.grad(
                lambda s: cfg.weight_score * jnp.mean(
                    (sigma[:, None, None] * s + z) ** 2))(score)
            d_mel_term = jax.grad(
                lambda y: cfg.weight_mel_l1 * jnp.mean(jnp.abs(
                    model.compute_mel_spec(y) - mel_target)))(y_est)

            def gan_terms(y):
                fm_f, gen_f = _mpd_gen_losses(
                    new_disc_params["mpd"], target_original, y)
                fm_s, gen_s = _mrd_gen_losses(
                    new_disc_params["mrd"], target_original, y)
                return gate * (gen_s + gen_f + fm_s + fm_f)

            d_gan_term = jax.grad(gan_terms)(y_est)
            for name, cot in (("score_mse", (d_score_term, zero_y)),
                              ("mel_l1", (zero_s, d_mel_term)),
                              ("gan", (zero_s, d_gan_term))):
                (g,) = gen_vjp(cot)
                for sub in ("cond", "score", "decoupling"):
                    if sub in g:
                        debug_metrics[f"gdbg/{sub}_from_{name}"] = \
                            global_norm(g[sub])
            # per-submodule conditioner grad norms + weight-norm parameter
            # magnitudes (kernel_v growth rescales effective grads)
            for sub, tree in gen_grads["cond"].items():
                debug_metrics[f"gdbg/cond.{sub}"] = global_norm(tree)
            for sub, tree in state.gen_params["cond"].items():
                debug_metrics[f"pnorm/cond.{sub}"] = global_norm(tree)
            debug_metrics["pnorm/score"] = global_norm(
                state.gen_params["score"])

        upd, new_gen_opt = self.gen_tx.update(gen_grads, state.gen_opt,
                                              state.gen_params)
        new_gen_params = optax.apply_updates(state.gen_params, upd)

        new_ema = ema_update(state.ema, new_gen_params)

        metrics = {
            "train/loss_disc": loss_disc,
            "train/loss_mpd": loss_mpd,
            "train/loss_mrd": loss_mrd,
            "train/loss_gen": loss_gen,
            "train/score": gen_aux["score"],
            "train/signal_mel": gen_aux["mel"],
            "train/mpd_gen": gen_aux["mpd_gen"],
            "train/mrd_gen": gen_aux["mrd_gen"],
            "train/mpd_fm": gen_aux["mpd_fm"],
            "train/mrd_fm": gen_aux["mrd_fm"],
            "grad/score": gn_score,
            "grad/cond": gn_cond,
            "grad/decoupling": gn_dec,
            "grad/mpd": gn_mpd,
            "grad/mrd": gn_mrd,
            "lr": self._lr_metric(state.step),
        }
        metrics.update(debug_metrics)

        new_state = GanTrainState(
            gen_params=new_gen_params,
            disc_params=new_disc_params,
            gen_opt=new_gen_opt,
            disc_opt=new_disc_opt,
            ema=new_ema,
            step=state.step + 1,
            sigma_pr_cum=state.sigma_pr_cum,
        )
        return new_state, metrics

    # ------------------------------------------------------------ val step
    def val_score_losses(self, state: GanTrainState, batch, key,
                         n_bins: int = 5, use_ema: bool = True):
        """Per-sigma-bin score losses (reference universe.py:606-650)."""
        model = self.model
        mix, target = batch[0], batch[1]
        params = state.ema.params if use_ema else state.gen_params
        (mix, target), *_ = model.normalize_batch((mix, target))
        mix, _ = model.pad(mix)
        target, _ = model.pad(target)
        mix_wav = mix
        mix, _ = model.apply_transform(mix)
        target, _ = model.apply_transform(target)
        tb = jnp.linspace(0.0, 1.0, n_bins + 1)
        # ONE conditioner forward (cond does not depend on the sigma bin) —
        # the reference re-runs the whole pipeline 5x (universe.py:613-628).
        # The score forwards run as a lax.map over bins rather than one
        # n_bins*B batch: at production size the folded batch OOMs 16 GB
        # HBM next to the resident train state (observed on v5e).
        cond, _, _ = model.apply_cond(params, mix, x_wav=mix_wav)
        sigmas, zs = [], []
        for i in range(n_bins):
            key, ks, kz = jax.random.split(key, 3)
            sigma, _ = sample_sigma(ks, mix.shape[0], model.cfg.diffusion,
                                    "time_uniform", t_min=float(i) / n_bins,
                                    t_max=float(i + 1) / n_bins)
            sigmas.append(sigma)
            zs.append(jax.random.normal(kz, target.shape, target.dtype))
        sigma = jnp.stack(sigmas)                          # (n_bins, B)
        z = jnp.stack(zs)                                  # (n_bins, B, T, C)
        score_fn = model.score_fn(params)

        def one_bin(args):
            sigma_b, z_b = args
            x_t = target + sigma_b[:, None, None] * z_b
            score = score_fn(x_t, sigma_b, cond)
            per_ex = jnp.mean((sigma_b[:, None, None] * score + z_b) ** 2,
                              axis=tuple(range(1, score.ndim)))
            return jnp.mean(per_ex)

        losses = jax.lax.map(one_bin, (sigma, z))
        return losses, tb
