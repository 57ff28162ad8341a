"""UNIVERSE conditioner network.

Parity target: reference ``ConditionerNetwork`` (condition.py:273-377):
parallel U-Net encoder over the noisy waveform + a mel branch
(``MelAdapter``, condition.py:68-114), per-level strided "shortcut" convs
projecting each resolution into the x160 latent (``make_st_convs``,
condition.py:33-65), 2-layer BiGRU sandwiched between conv blocks, then a
decoder producing (a) per-level conditioning tensors consumed by the score
decoder and (b) an auxiliary clean-speech estimate ``y_est``.

NOTE (kept for parity): the reference hardcodes ``sample_rate=24000`` in
the MelAdapter regardless of model fs (condition.py:75-81) — configurable
here, defaulting to the same value.
"""
import math
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.antialias import low_pass_filter
from ...ops.conv import Conv1d
from ...ops.gru import GRU
from ...ops.stft import melspectrogram
from .blocks import ConvBlock, PReLUConv

INV_SQRT2 = 1.0 / math.sqrt(2.0)


def conditioner_mel_spec(x, n_mels: int, ds_factor: int, oversample: int,
                         mel_sample_rate: int = 24000):
    """Normalized mel of waveform x (B, T, C) -> (B, T/ds, n_mels).

    Pads like reference MelAdapter.compute_mel_spec (condition.py:92-106):
    symmetric (n_fft-hop)/2 + right-pad to a hop multiple, then global
    normalization to unit average frame energy.
    """
    n_fft = oversample * ds_factor
    hop = ds_factor
    w = x[..., 0]
    t = w.shape[-1]
    r = t % hop
    extra = hop - r if r != 0 else 0
    pad_tot = n_fft - hop
    lo, hi = pad_tot // 2, pad_tot - pad_tot // 2
    w = jnp.pad(w, ((0, 0), (lo, extra + hi)))
    m = melspectrogram(w, n_fft, hop, n_mels, mel_sample_rate)
    norm = jnp.sqrt(jnp.mean(jnp.sum(m**2, axis=-1, keepdims=True),
                             axis=-2, keepdims=True))
    return m / jnp.maximum(norm, 1e-5)


class MelAdapter(nn.Module):
    """Mel spectrogram -> conv -> ConvBlock, at the x(ds_factor) latent rate."""
    n_mels: int
    output_channels: int
    ds_factor: int
    oversample: int = 2
    use_weight_norm: bool = False
    mel_sample_rate: int = 24000  # reference quirk, see module docstring

    @nn.compact
    def __call__(self, x):
        m = conditioner_mel_spec(x, self.n_mels, self.ds_factor,
                                 self.oversample, self.mel_sample_rate)
        m = Conv1d(self.output_channels, 3, padding="same",
                   use_weight_norm=self.use_weight_norm, name="conv")(m)
        m, *_ = ConvBlock(self.output_channels,
                          use_weight_norm=self.use_weight_norm,
                          name="conv_block")(m)
        return m


class ConditionerEncoder(nn.Module):
    ds_factors: Sequence[int]
    input_channels: int
    with_gru_residual: bool = False
    with_extra_conv_block: bool = False
    act_type: str = "prelu"
    use_weight_norm: bool = False
    use_antialiasing: bool = False

    @nn.compact
    def __call__(self, x, x_mel):
        c = self.input_channels
        n = len(self.ds_factors)
        oc = c * 2**n
        # cumulative rates for the latent shortcut convs (condition.py:43-46)
        rates = [int(math.prod(self.ds_factors[i:])) for i in range(n)]
        num_st = n - 1

        outputs, lengths = [], []
        for i, r in enumerate(self.ds_factors):
            lengths.append(x.shape[-2])
            x, res, _ = ConvBlock(c * 2**i, r, "down", act_type=self.act_type,
                                  use_weight_norm=self.use_weight_norm,
                                  antialiasing=self.use_antialiasing,
                                  name=f"ds_{i}")(x)
            if i < num_st:
                if self.use_antialiasing:
                    res = low_pass_filter(res, rates[i] * 2 + 1)
                res = PReLUConv(oc, kernel_size=rates[i], stride=rates[i],
                                use_weight_norm=self.use_weight_norm,
                                name=f"st_conv_{i}")(res)
                outputs.append(res)
        if self.with_extra_conv_block:
            lengths.append(x.shape[-2])
            x, _, _ = ConvBlock(oc, act_type=self.act_type,
                                use_weight_norm=self.use_weight_norm,
                                name="ds_extra")(x)
        outputs.append(x)

        norm = 1.0 / math.sqrt(len(outputs) + 1)
        out = x_mel
        for o in outputs:
            out = out + o
        out = out * norm

        out, *_ = ConvBlock(oc, act_type=self.act_type,
                            use_weight_norm=self.use_weight_norm,
                            name="conv_block1")(out)
        if self.with_gru_residual:
            res = out
        out = GRU(hidden_size=oc // 2, num_layers=2, bidirectional=True,
                  name="gru")(out)
        if self.with_gru_residual:
            out = (out + res) * INV_SQRT2
        out, *_ = ConvBlock(oc, act_type=self.act_type,
                            use_weight_norm=self.use_weight_norm,
                            name="conv_block2")(out)
        return out, lengths[::-1]


class ConditionerDecoder(nn.Module):
    up_factors: Sequence[int]  # reversed rate factors
    input_channels: int
    with_extra_conv_block: bool = False
    act_type: str = "prelu"
    use_weight_norm: bool = False
    use_antialiasing: bool = False

    @nn.compact
    def __call__(self, x, lengths):
        c = self.input_channels
        n = len(self.up_factors)
        x, *_ = ConvBlock(c * 2**n, act_type=self.act_type,
                          use_weight_norm=self.use_weight_norm,
                          name="input_conv_block")(x)
        blocks = []
        if self.with_extra_conv_block:
            blocks.append(("extra", c * 2**n, None))
        for i, r in enumerate(self.up_factors):
            blocks.append((f"up_{i}", c * 2 ** (n - i - 1), r))

        conditions = []
        for (name, ch, r), length in zip(blocks, lengths):
            if r is None:
                x, _, cond = ConvBlock(ch, act_type=self.act_type,
                                       use_weight_norm=self.use_weight_norm,
                                       name=name)(x, length=length)
            else:
                x, _, cond = ConvBlock(ch, r, "up", act_type=self.act_type,
                                       use_weight_norm=self.use_weight_norm,
                                       antialiasing=self.use_antialiasing,
                                       name=name)(x, length=length)
            conditions.append(cond)
        return x, conditions


class ConditionerNetwork(nn.Module):
    """Produces per-level conditioning + auxiliary clean estimate.

    __call__(x) -> (conditions: list[(B, T_l, C_l)], y_est (B, T, C_out), h)
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

    @property
    def total_ds(self):
        return int(math.prod(self.rate_factors))

    def mel_adapter(self, name=None):
        total_channels = 2 ** len(self.rate_factors) * self.n_channels
        kwargs = {} if name is None else {"name": name}
        return MelAdapter(self.n_mels, total_channels,
                          self.total_ds * self.input_channels,
                          self.n_mel_oversample,
                          use_weight_norm=self.use_weight_norm,
                          mel_sample_rate=self.mel_sample_rate, **kwargs)

    def compute_mel_spec(self, x):
        """Normalized mel of waveform (B, T, C) — used by training losses."""
        return conditioner_mel_spec(x, self.n_mels,
                                    self.total_ds * self.input_channels,
                                    self.n_mel_oversample,
                                    self.mel_sample_rate)

    @nn.compact
    def __call__(self, x, x_wav=None, train: bool = True):
        n_samples = x.shape[-2]
        if x_wav is None:
            x_wav = x

        x_mel = self.mel_adapter(name="input_mel")(x_wav)

        # spectral-transform mode: x is STFT frames padded to a total_ds
        # multiple while x_mel comes from the raw waveform, so the latent
        # lengths can differ by one — zero-pad/crop the mel branch to the
        # encoder's latent rate (identity mode: always an exact match)
        latent_len = n_samples // self.total_ds
        if x_mel.shape[-2] < latent_len:
            x_mel = jnp.pad(
                x_mel, ((0, 0), (0, latent_len - x_mel.shape[-2]), (0, 0)))
        elif x_mel.shape[-2] > latent_len:
            x_mel = x_mel[:, :latent_len]

        x = Conv1d(self.n_channels, self.fb_kernel_size, padding="same",
                   use_weight_norm=self.use_weight_norm, name="input_conv")(x)
        h, lengths = ConditionerEncoder(
            self.rate_factors, self.n_channels,
            with_gru_residual=self.encoder_gru_residual,
            with_extra_conv_block=self.extra_conv_block,
            act_type=self.encoder_act_type,
            use_weight_norm=self.use_weight_norm,
            use_antialiasing=False,  # reference hardcodes False (condition.py:333)
            name="encoder")(x, x_mel)

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
