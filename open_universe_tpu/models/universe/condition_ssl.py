"""SSL-feature conditioning (the fork's WavLM variant).

Parity target: reference ``WavLMAdapter`` / ``condition_wv2.py``
(universe_wavlm package): frozen SSL encoder features (conv stage or an
early transformer layer) replace the mel branch — interpolated to the
x(total_ds) latent rate, unit-energy normalized like the MelAdapter, then
projected + ConvBlock.

TPU-native: the backbone is a frozen *Flax* wav2vec2 (weights-gated in
this zero-egress image); features can also be precomputed offline and fed
directly, which keeps the train step jit-pure either way.
"""
import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.conv import Conv1d
from .blocks import ConvBlock
from .condition import ConditionerDecoder, ConditionerEncoder


def make_wav2vec2_feature_fn(model_path: str = "microsoft/wavlm-base",
                             feature_stage: str = "conv") -> Callable:
    """Frozen SSL feature extractor: wav (B, T) -> (B, F_t, D).

    Requires local weights (transformers, local_files_only). WavLM
    checkpoints (the reference's backbone, condition_wv2.py:25) load
    through our own JAX WavLM (models/ssl/wavlm.py — parity-tested
    torch->flax converter incl. the gated relative-position-bias
    attention); other paths fall back to transformers' flax wav2vec2.
    """
    try:
        from transformers import AutoConfig
        hf_cfg = AutoConfig.from_pretrained(model_path,
                                            local_files_only=True)
        if hf_cfg.model_type == "wavlm":
            from ..ssl.wavlm import load_wavlm, wavlm_forward
            params, cfg = load_wavlm(model_path)

            def feature_fn(wav):
                hiddens = wavlm_forward(params, wav, cfg,
                                        output_hidden_states=True)
                # "conv" = the projected conv features (pre-transformer);
                # hiddens[0] is post feature-projection + pos-embedding
                # input, the closest analogue of extract_features at the
                # same frame rate; hiddens[1] is the first encoder layer
                return hiddens[0] if feature_stage == "conv" \
                    else hiddens[1]

            return feature_fn
        from transformers import FlaxWav2Vec2Model
        model = FlaxWav2Vec2Model.from_pretrained(model_path,
                                                  local_files_only=True)
    except Exception as e:
        raise RuntimeError(
            f"SSL conditioning needs local pretrained weights at "
            f"'{model_path}': {e}") from e

    def feature_fn(wav):
        if feature_stage == "conv":
            out = model(wav, output_hidden_states=True)
            return out.extract_features
        out = model(wav, output_hidden_states=True)
        return out.hidden_states[1]

    return feature_fn


def interpolate_nearest(x, target_len: int):
    """Nearest-neighbor resize along the time axis: (B, T, C) -> (B, L, C)."""
    t = x.shape[-2]
    idx = jnp.clip((jnp.arange(target_len) * t) // target_len, 0, t - 1)
    return x[:, idx, :]


class SSLFeatureAdapter(nn.Module):
    """Project SSL features to the latent rate/channels (MelAdapter shape)."""
    output_channels: int
    use_weight_norm: bool = False

    @nn.compact
    def __call__(self, features, target_len: int):
        f = interpolate_nearest(features, target_len)
        # unit average frame energy, exactly like the MelAdapter
        norm = jnp.sqrt(jnp.mean(jnp.sum(f**2, axis=-1, keepdims=True),
                                 axis=-2, keepdims=True))
        f = f / jnp.maximum(norm, 1e-5)
        f = Conv1d(self.output_channels, 3, padding="same",
                   use_weight_norm=self.use_weight_norm, name="proj")(f)
        f, *_ = ConvBlock(self.output_channels,
                          use_weight_norm=self.use_weight_norm,
                          name="conv_block")(f)
        return f


class SSLConditionerNetwork(nn.Module):
    """ConditionerNetwork with the mel branch replaced by SSL features.

    __call__(x, ssl_features, x_wav=None, train=True)
      -> (conditions, y_est, h)
    ssl_features: (B, F_t, D) from a frozen SSL encoder (any frame rate —
    interpolated to the latent rate).
    """
    fb_kernel_size: int = 3
    rate_factors: Sequence[int] = (2, 4, 4, 5)
    n_channels: int = 32
    encoder_gru_residual: bool = False
    extra_conv_block: bool = False
    encoder_act_type: str = "prelu"
    decoder_act_type: str = "prelu"
    input_channels: int = 1
    output_channels: Optional[int] = None
    use_weight_norm: bool = False
    use_antialiasing: bool = False

    @property
    def total_ds(self):
        return int(math.prod(self.rate_factors))

    @nn.compact
    def __call__(self, x, ssl_features, x_wav=None, train: bool = True):
        n_samples = x.shape[-2]
        total_channels = 2 ** len(self.rate_factors) * self.n_channels
        latent_len = n_samples // self.total_ds

        x_feat = SSLFeatureAdapter(total_channels,
                                   use_weight_norm=self.use_weight_norm,
                                   name="input_ssl")(ssl_features, latent_len)

        x = Conv1d(self.n_channels, self.fb_kernel_size, padding="same",
                   use_weight_norm=self.use_weight_norm, name="input_conv")(x)
        h, lengths = ConditionerEncoder(
            self.rate_factors, self.n_channels,
            with_gru_residual=self.encoder_gru_residual,
            with_extra_conv_block=self.extra_conv_block,
            act_type=self.encoder_act_type,
            use_weight_norm=self.use_weight_norm,
            use_antialiasing=False,
            name="encoder")(x, x_feat)

        y_hat, conditions = ConditionerDecoder(
            tuple(self.rate_factors[::-1]), self.n_channels,
            with_extra_conv_block=self.extra_conv_block,
            act_type=self.decoder_act_type,
            use_weight_norm=self.use_weight_norm,
            use_antialiasing=self.use_antialiasing,
            name="decoder")(h, lengths)

        if self.output_channels is not None:
            y_hat = Conv1d(self.output_channels, self.fb_kernel_size,
                           padding="same",
                           use_weight_norm=self.use_weight_norm,
                           name="output_conv")(y_hat)

        t = y_hat.shape[-2]
        if t < n_samples:
            y_hat = jnp.pad(y_hat, ((0, 0), (0, n_samples - t), (0, 0)))
        elif t > n_samples:
            y_hat = y_hat[:, :n_samples, :]

        if train:
            return conditions, y_hat, h
        return conditions
