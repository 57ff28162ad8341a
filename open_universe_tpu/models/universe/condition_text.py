"""Text-conditioned conditioner network (the fork's 11-May variant).

Parity target: reference ``ConditionerNetwork`` in condition_11May.py
(875-1248): identical wave/mel U-Net plus (a) a ``TextConditioner``
applied to the mel features right after the MelAdapter (FiLM-global +
RoPE cross-attention over text tokens), (b) ``LatentFiLM`` from the
global text embedding on the encoder latent, (c) waveform padding masks
downsampled to mel/latent rate. Returns the attention map for the
guided-attention loss.
"""
import math
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.conv import Conv1d
from ...text.conditioner import LatentFiLM, TextConditioner, downsample_pad_mask
from ...text.encoder import TextEncoder
from .condition import (
    ConditionerDecoder,
    ConditionerEncoder,
    MelAdapter,
    conditioner_mel_spec,
)


class TextConditionerNetwork(nn.Module):
    """ConditionerNetwork + text conditioning.

    __call__(x, text_ids, text_pad_mask, x_wav=None, pad_mask=None)
      -> (conditions, y_est, h, attn_map)
    """
    fb_kernel_size: int = 3
    rate_factors: Sequence[int] = (2, 4, 4, 5)
    n_channels: int = 32
    n_mels: int = 80
    n_mel_oversample: int = 4
    encoder_gru_residual: bool = False
    extra_conv_block: bool = False
    encoder_act_type: str = "prelu"
    decoder_act_type: str = "prelu"
    input_channels: int = 1
    output_channels: Optional[int] = None
    use_weight_norm: bool = False
    use_antialiasing: bool = False
    mel_sample_rate: int = 24000
    # text config (condition_11May.py:902-907)
    vocab_size: int = 64
    text_hidden: int = 256
    text_layers: int = 3
    film_global_dim: int = 512
    cross_attention_dim: int = 512
    cross_attention_num_heads: int = 8
    attention_temperature: float = 0.6
    text_max_len: int = 128
    # silsp variant: id of the prepended <sil> anchor token, masked out of
    # cross-attention keys (textencoder_11May_silsp.py:262); -1 disables
    text_sil_id: int = -1

    @property
    def total_ds(self):
        return int(math.prod(self.rate_factors))

    def compute_mel_spec(self, x):
        return conditioner_mel_spec(x, self.n_mels,
                                    self.total_ds * self.input_channels,
                                    self.n_mel_oversample,
                                    self.mel_sample_rate)

    @nn.compact
    def __call__(self, x, text_ids=None, text_pad_mask=None, x_wav=None,
                 pad_mask=None, train: bool = True,
                 deterministic: bool = True):
        n_samples = x.shape[-2]
        if x_wav is None:
            x_wav = x
        total_channels = 2 ** len(self.rate_factors) * self.n_channels

        x_mel = MelAdapter(self.n_mels, total_channels,
                           self.total_ds * self.input_channels,
                           self.n_mel_oversample,
                           use_weight_norm=self.use_weight_norm,
                           mel_sample_rate=self.mel_sample_rate,
                           name="input_mel")(x_wav)

        use_text = text_ids is not None
        attn_map = None
        global_emb = None
        div_loss = jnp.zeros(())
        if use_text:
            global_emb, seq_emb, key_mask = TextEncoder(
                vocab_size=self.vocab_size, hidden=self.text_hidden,
                n_layers=self.text_layers, global_dim=self.film_global_dim,
                seq_dim=self.cross_attention_dim,
                max_len=self.text_max_len, sil_id=self.text_sil_id,
                name="text_encoder")(text_ids, text_pad_mask)
            mel_pad = None
            if pad_mask is not None:
                f = -(-pad_mask.shape[-1] // x_mel.shape[-2])
                mel_pad = downsample_pad_mask(pad_mask, f)[:, : x_mel.shape[-2]]
            x_mel, attn_map, div_loss = TextConditioner(
                total_channels=total_channels,
                cross_attention_dim=self.cross_attention_dim,
                num_heads=self.cross_attention_num_heads,
                attention_temperature=self.attention_temperature,
                name="text_cond_mel")(x_mel, global_emb, seq_emb, key_mask,
                                      q_pad_mask=mel_pad,
                                      deterministic=deterministic)

        x = Conv1d(self.n_channels, self.fb_kernel_size, padding="same",
                   use_weight_norm=self.use_weight_norm, name="input_conv")(x)
        h, lengths = ConditionerEncoder(
            self.rate_factors, self.n_channels,
            with_gru_residual=self.encoder_gru_residual,
            with_extra_conv_block=self.extra_conv_block,
            act_type=self.encoder_act_type,
            use_weight_norm=self.use_weight_norm,
            use_antialiasing=False,
            name="encoder")(x, x_mel)

        if use_text:
            h = LatentFiLM(h.shape[-1], name="lat_film")(h, global_emb)

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

        return conditions, y_hat, h, {"attn_map": attn_map,
                                      "div_loss": div_loss}
