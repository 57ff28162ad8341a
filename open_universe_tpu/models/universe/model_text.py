"""UNIVERSE++ with text conditioning (the fork's 11-May flagship variant).

Wraps ``TextConditionerNetwork`` in the model-level API: ``apply_cond`` /
``enhance`` accept tokenized text (ids + pad mask). Without text, behaves
like the base model (the reference's dual text/no-text path,
universe_gan_NS_11May.py:307-410).
"""
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ...diffusion.sampler import make_oracle_score_fn, reverse_sde_sample
from .condition_text import TextConditionerNetwork
from .model import UniverseConfig, UniverseModel


@dataclasses.dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 64
    text_hidden: int = 256
    text_layers: int = 3
    film_global_dim: int = 512
    cross_attention_dim: int = 512
    cross_attention_num_heads: int = 8
    attention_temperature: float = 0.6
    text_max_len: int = 128
    # silsp variant: <sil> anchor token id (CharTokenizer(sil_token=True)
    # .sil_id); -1 disables
    sil_id: int = -1


class TextUniverseModel(UniverseModel):
    def __init__(self, config: UniverseConfig = UniverseConfig(),
                 text: TextConfig = TextConfig()):
        super().__init__(config)
        self.text_cfg = text
        self.cond_net = TextConditionerNetwork(
            fb_kernel_size=config.fb_kernel_size,
            rate_factors=tuple(config.rate_factors),
            n_channels=config.n_channels,
            n_mels=config.n_mels,
            n_mel_oversample=config.n_mel_oversample,
            encoder_gru_residual=config.encoder_gru_residual,
            extra_conv_block=config.extra_conv_block,
            input_channels=config.input_channels,
            use_weight_norm=config.use_weight_norm,
            use_antialiasing=config.cond_antialiasing,
            vocab_size=text.vocab_size,
            text_hidden=text.text_hidden,
            text_layers=text.text_layers,
            film_global_dim=text.film_global_dim,
            cross_attention_dim=text.cross_attention_dim,
            cross_attention_num_heads=text.cross_attention_num_heads,
            attention_temperature=text.attention_temperature,
            text_max_len=text.text_max_len,
            text_sil_id=text.sil_id,
        )

    def init(self, key, example_len: int = 1600, batch: int = 1):
        ks, kc, kd = jax.random.split(key, 3)
        x = jnp.zeros((batch, example_len, self.cfg.input_channels))
        tids = jnp.zeros((batch, self.text_cfg.text_max_len), jnp.int32)
        tmask = jnp.ones((batch, self.text_cfg.text_max_len), bool)
        cond_params = self.cond_net.init(kc, x, tids, tmask)
        conditions, y_est, _, _ = self.cond_net.apply(cond_params, x, tids,
                                                      tmask)
        sigma = jnp.full((batch,), 1.0)
        score_params = self.score_net.init(ks, x, sigma, conditions)
        params = {"score": score_params["params"],
                  "cond": cond_params["params"]}
        if self.decoupling_net is not None:
            dp = self.decoupling_net.init(kd, y_est)
            params["decoupling"] = dp["params"]
        return params

    def apply_cond(self, params, x, x_wav=None, train: bool = True,
                   text=None, pad_mask=None, deterministic: bool = True):
        """text: optional (token_ids, text_pad_mask). Returns the base
        triple (conditions, y_est, h); attention info via
        ``apply_cond_with_info``."""
        out = self.apply_cond_with_info(params, x, x_wav=x_wav, text=text,
                                        pad_mask=pad_mask,
                                        deterministic=deterministic)
        return out[0], out[1], out[2]

    def apply_cond_with_info(self, params, x, x_wav=None, text=None,
                             pad_mask=None, deterministic: bool = True):
        tids, tmask = text if text is not None else (None, None)
        return self.cond_net.apply({"params": params["cond"]}, x, tids,
                                   tmask, x_wav=x_wav, pad_mask=pad_mask,
                                   deterministic=deterministic)

    def enhance(self, params, mix, key, text=None, **kwargs):
        """Text-aware enhancement; with text=None matches the base model."""
        if text is None:
            return super().enhance(params, mix, key, **kwargs)
        # minimal text-aware path (no ensembling shortcuts): pad, normalize,
        # condition with text, sample
        x_ndim = mix.ndim
        if x_ndim == 1:
            mix = mix[None, :, None]
        elif x_ndim == 2:
            mix = mix[:, :, None]
        mix_len = mix.shape[-2]
        mix, pad = self.pad(mix)
        (mix, _), *_ = self.normalize_batch((mix, None))
        cond, aux, _ = self.apply_cond(params, mix, text=text)
        cond = self.project_score_cond(params, cond)
        x = reverse_sde_sample(
            self.score_fn(params, cond_projected=True), cond, mix.shape, key,
            self.cfg.diffusion,
            n_steps=kwargs.get("n_steps"), epsilon=kwargs.get("epsilon"))
        x = self.unpad(x, pad)
        t = x.shape[-2]
        if t < mix_len:
            x = jnp.pad(x, ((0, 0), (0, mix_len - t), (0, 0)))
        scale = jnp.max(jnp.abs(x), axis=-2, keepdims=True)
        x = jnp.where(scale > 1.0, x / jnp.maximum(scale, 1e-12), x)
        if x_ndim == 1:
            x = x[0, :, 0]
        elif x_ndim == 2:
            x = x[:, :, 0]
        return x
