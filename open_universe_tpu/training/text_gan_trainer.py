"""Text-conditioned UNIVERSE++ adversarial trainer.

Parity target: reference ``UniverseGAN`` 11-May variant
(universe_gan_NS_11May.py): the GAN step of gan_trainer.py plus
  - text conditioning through ``TextUniverseModel`` (tokens from the batch),
  - multi-scale guided-attention loss with linear annealing over
    ``ga_anneal_steps`` (weights: guided_attn 0.25, coverage 0.0,
    config/model/11May_full_film.yaml:69-76),
  - attention head-diversity auxiliary loss,
  - a separate linear LR warmup for the text modules
    (the "text" scheduler, 11May_full_film.yaml:135-142) implemented as a
    per-path gradient scale on ``cond/text_*`` parameters.
"""
import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..diffusion.sigma_sampling import sample_sigma
from ..losses.gan import discriminator_loss, feature_loss, generator_loss
from ..losses.guided_attention import (
    coverage_loss,
    guided_attention_loss,
    phoneme_alignment_loss,
)
from ..models.universe.model_text import TextUniverseModel
from .clipping import global_norm
from .ema import ema_update
from .gan_trainer import GanTrainConfig, GanTrainer, GanTrainState


@dataclasses.dataclass(frozen=True)
class TextGanTrainConfig(GanTrainConfig):
    weight_guided_attn: float = 0.25
    weight_coverage: float = 0.0
    weight_head_diversity: float = 0.0
    ga_anneal_steps: int = 30000
    ga_sigma: float = 0.15
    text_warmup_steps: int = 5000
    # TextGrid forced-alignment supervision (silsp_tg variant,
    # universe_gan_NS_11May_tg.py:595-640); needs batch["text_coords"] +
    # batch["text_coords_valid"]
    weight_align_phoneme: float = 0.0
    align_slack_frames: float = 2.0


class TextGanTrainer(GanTrainer):
    def __init__(self, model: TextUniverseModel,
                 cfg: TextGanTrainConfig = TextGanTrainConfig()):
        super().__init__(model, cfg)

    def _text_grad_scale(self, step):
        """Linear 0->1 warmup factor for text-module gradients."""
        w = self.cfg.text_warmup_steps
        return jnp.minimum(1.0, (step.astype(jnp.float32) + 1.0) / max(w, 1))

    def train_step(self, state: GanTrainState, batch, key
                   ) -> Tuple[GanTrainState, Dict[str, jnp.ndarray]]:
        """batch: dict with mix, target, text_ids, text_mask[, pad_mask]."""
        cfg = self.cfg
        model = self.model
        if isinstance(batch, dict) and "text_ids" in batch:
            mix, target = batch["mix"], batch["target"]
            text = (batch["text_ids"], batch["text_mask"])
            pad_mask = batch.get("pad_mask")
            text_coords = batch.get("text_coords")
            text_coords_valid = batch.get("text_coords_valid")
        else:
            # no-text batch: the plain GAN step (reference dual path)
            if isinstance(batch, dict):
                batch = (batch["mix"], batch["target"])
            return super().train_step(state, batch, key)
        target_original = target

        k_mix, k_sigma, k_z = jax.random.split(key, 3)
        if cfg.dynamic_mixing:
            noise = mix - target
            perm = jax.random.permutation(k_mix, mix.shape[0])
            mix = target + noise[perm]

        (mix, target, target_original), *_ = model.normalize_batch(
            (mix, target, target_original))
        sigma, _ = sample_sigma(
            k_sigma, mix.shape[0], model.cfg.diffusion, cfg.time_sampling,
            adaptive_pr_cum=state.sigma_pr_cum,
            adaptive_bins=jnp.linspace(0.0, 1.0, cfg.adaptive_n_bins + 1))
        z = jax.random.normal(k_z, target.shape, target.dtype)
        x_t = target + sigma[:, None, None] * z

        def gen_forward(gen_params):
            cond, y_raw, h, info = model.apply_cond_with_info(
                gen_params, mix, text=text, pad_mask=pad_mask,
                deterministic=True)
            score = model.score_fn(gen_params)(x_t, sigma, cond)
            y_est = model.aux_to_wav(gen_params, y_raw)
            return score, y_est, (info["attn_map"], info["div_loss"])

        if cfg.remat:
            gen_forward = jax.checkpoint(gen_forward)
        (score, y_est, (attn_map, div_loss)), gen_vjp = jax.vjp(
            gen_forward, state.gen_params)
        y_det = jax.lax.stop_gradient(y_est)
        mel_target = model.compute_mel_spec(target_original)

        def disc_loss_fn(disc_params):
            rf, gf, _, _ = self.mpd.apply({"params": disc_params["mpd"]},
                                          target_original, y_det)
            lf, _, _ = discriminator_loss(rf, gf)
            rs, gs, _, _ = self.mrd.apply({"params": disc_params["mrd"]},
                                          target_original, y_det)
            ls, _, _ = discriminator_loss(rs, gs)
            return lf + ls, (lf, ls)

        (loss_disc, (loss_mpd, loss_mrd)), disc_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params)
        # clipping happens inside disc_tx; norms here are logging-only
        gn_mpd = global_norm(disc_grads["mpd"])
        gn_mrd = global_norm(disc_grads["mrd"])
        disc_active = state.step >= cfg.disc_freeze_step

        def do_upd(_):
            upd, o = self.disc_tx.update(disc_grads, state.disc_opt,
                                         state.disc_params)
            return optax.apply_updates(state.disc_params, upd), o

        new_disc_params, new_disc_opt = jax.lax.cond(
            disc_active, do_upd, lambda _: (state.disc_params,
                                            state.disc_opt), None)

        gate = disc_active.astype(jnp.float32)

        def downstream_loss(score, y_est, attn_map, div_loss):
            l_score = jnp.mean((sigma[:, None, None] * score + z) ** 2)
            mel_y = model.compute_mel_spec(y_est)
            loss_mel = jnp.mean(jnp.abs(mel_y - mel_target))
            # paired=False: only the fake half needs input gradients here
            rf, gf, fr, fg = self.mpd.apply(
                {"params": new_disc_params["mpd"]}, target_original, y_est,
                paired=False)
            fm_f = feature_loss(fr, fg)
            lg_f, _ = generator_loss(gf)
            rs, gs, fr2, fg2 = self.mrd.apply(
                {"params": new_disc_params["mrd"]}, target_original, y_est,
                paired=False)
            fm_s = feature_loss(fr2, fg2)
            lg_s, _ = generator_loss(gs)
            loss = (cfg.weight_score * l_score + cfg.weight_mel_l1 * loss_mel
                    + gate * (lg_s + lg_f + fm_s + fm_f))
            aux = {"score": l_score, "mel": loss_mel, "mpd_gen": lg_f,
                   "mrd_gen": lg_s, "mpd_fm": fm_f, "mrd_fm": fm_s}

            if text is not None and attn_map is not None:
                q_valid = jnp.ones(attn_map.shape[:2], bool) \
                    if pad_mask is None else None
                if pad_mask is not None:
                    from ..text.conditioner import downsample_pad_mask
                    f = -(-pad_mask.shape[-1] // attn_map.shape[1])
                    q_valid = ~downsample_pad_mask(pad_mask, f)[
                        :, : attn_map.shape[1]]
                s_valid = ~text[1]
                ga = guided_attention_loss(attn_map, q_valid, s_valid,
                                           sigma=cfg.ga_sigma)
                cov = coverage_loss(attn_map, s_valid)
                anneal = jnp.maximum(
                    0.0, 1.0 - state.step.astype(jnp.float32)
                    / max(cfg.ga_anneal_steps, 1))
                loss = (loss + cfg.weight_guided_attn * anneal * ga
                        + cfg.weight_coverage * cov
                        + cfg.weight_head_diversity * div_loss)
                aux.update({"ga": ga, "coverage": cov,
                            "head_div": div_loss})
                if (cfg.weight_align_phoneme > 0.0
                        and text_coords is not None):
                    align = phoneme_alignment_loss(
                        attn_map, text_coords, text_coords_valid,
                        slack_frames=cfg.align_slack_frames)
                    loss = loss + cfg.weight_align_phoneme * align
                    aux["align_phoneme"] = align
            return loss, aux

        grad_fn = jax.value_and_grad(downstream_loss, argnums=(0, 1, 2, 3),
                                     has_aux=True)
        (loss_gen, gen_aux), (d_score, d_yest, d_attn, d_div) = grad_fn(
            score, y_est, attn_map, div_loss)
        (gen_grads,) = gen_vjp((d_score, d_yest, (d_attn, d_div)))

        # separate text LR warmup: scale grads of cond/text_* paths
        tscale = self._text_grad_scale(state.step)

        def scale_text(path, g):
            keys = [str(getattr(p, "key", p)) for p in path]
            if any(k.startswith(("text_", "lat_film")) for k in keys):
                return g * tscale
            return g

        gen_grads = jax.tree_util.tree_map_with_path(scale_text, gen_grads)

        # clipping happens inside gen_tx; norms here are logging-only
        gn_score = global_norm(gen_grads["score"])
        gn_cond = global_norm(gen_grads["cond"])
        upd, new_gen_opt = self.gen_tx.update(gen_grads, state.gen_opt,
                                              state.gen_params)
        new_gen_params = optax.apply_updates(state.gen_params, upd)
        new_ema = ema_update(state.ema, new_gen_params)

        metrics = {
            "train/loss_disc": loss_disc, "train/loss_mpd": loss_mpd,
            "train/loss_mrd": loss_mrd, "train/loss_gen": loss_gen,
            **{f"train/{k}": v for k, v in gen_aux.items()},
            "grad/score": gn_score, "grad/cond": gn_cond,
            "grad/mpd": gn_mpd, "grad/mrd": gn_mrd,
        }
        return GanTrainState(
            gen_params=new_gen_params, disc_params=new_disc_params,
            gen_opt=new_gen_opt, disc_opt=new_disc_opt, ema=new_ema,
            step=state.step + 1,
            sigma_pr_cum=state.sigma_pr_cum), metrics
