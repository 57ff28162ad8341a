"""HiFi-GAN / BigVGAN discriminators (multi-period + multi-resolution).

Parity targets: reference ``DiscriminatorP`` / ``MultiPeriodDiscriminator``
(bigvgan/gan.py:21-127, periods [2,3,5,7,11]) and ``DiscriminatorR`` /
``MultiResolutionDiscriminator`` (gan.py:130-284, resolutions
[[1024,120,600],[2048,240,1200],[512,50,240]]). LeakyReLU slope 0.1;
weight-normalized 2-D convs.

TPU notes: the period reshape is a pure reshape; the STFT magnitude uses
the XLA FFT; all convs are NHWC so channels ride the lane dimension.
"""
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.conv import get_compute_dtype
from ...ops.conv2d import Conv2d
from ...ops.stft import stft_magnitude

LRELU_SLOPE = 0.1


def _lrelu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _get_padding(kernel_size, dilation=1):
    return (kernel_size * dilation - dilation) // 2


class DiscriminatorP(nn.Module):
    """Period discriminator: waveform folded to (T/period, period) + 2D convs."""
    period: int
    kernel_size: int = 5
    stride: int = 3
    channel_mult: int = 1

    @nn.compact
    def __call__(self, x):
        # x: (B, T, 1) -> reflect-pad to period multiple -> (B, T/p, p, 1).
        # Every conv has a width-1 kernel/stride on the period axis, i.e. the
        # period columns are independent 1-D conv problems with shared
        # weights — so fold the period into BATCH once up front: (B, H, p, C)
        # -> (B*p, H, 1, C). Measured ~20% faster than the (5,1) 2-D conv
        # over a tiny W axis (scripts/bench_discp.py); exact same math, and
        # the Conv2d param shapes are unchanged.
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, c)
        x = x.transpose(0, 2, 1, 3).reshape(b * self.period,
                                            t // self.period, 1, c)

        def unfold(h):  # (B*p, H, 1, C) -> (B, p, H, C), batch-split-safe
            return h.reshape(b, self.period, h.shape[1], h.shape[3])

        fmap = []
        pad = _get_padding(5, 1)
        chans = [32, 128, 512, 1024]
        for i, ch in enumerate(chans):
            x = Conv2d(ch * self.channel_mult, (self.kernel_size, 1),
                       strides=(self.stride, 1),
                       padding=((pad, pad), (0, 0)),
                       use_weight_norm=True, name=f"conv_{i}")(x)
            x = _lrelu(x)
            fmap.append(unfold(x))
        x = Conv2d(1024 * self.channel_mult, (self.kernel_size, 1),
                   strides=(1, 1), padding=((2, 2), (0, 0)),
                   use_weight_norm=True, name="conv_4")(x)
        x = _lrelu(x)
        fmap.append(unfold(x))
        x = Conv2d(1, (3, 1), strides=(1, 1), padding=((1, 1), (0, 0)),
                   use_weight_norm=True, name="conv_post")(x)
        fmap.append(unfold(x))
        return x.reshape(b, -1), fmap


class DiscriminatorR(nn.Module):
    """STFT-magnitude discriminator at one (n_fft, hop, win) resolution."""
    resolution: Sequence[int]  # (n_fft, hop, win)
    channel_mult: int = 1

    def _spectrogram(self, x):
        n_fft, hop, win = self.resolution
        w = x[..., 0]
        p = (n_fft - hop) // 2
        w = jnp.pad(w, ((0, 0), (p, p)), mode="reflect")
        # magnitude via the windowed-DFT matmul (MXU, compute dtype) — ~1.6x
        # the TPU FFT path for these sizes (scripts/bench_discr.py)
        # torch.stft with window=None is a RECTANGULAR window of
        # win_length zero-padded to n_fft (reference bigvgan/gan.py:238-245)
        mag = stft_magnitude(w, n_fft, hop, win_length=win, center=False,
                             dtype=get_compute_dtype(), window="ones")
        # (B, frames, F) -> (B, F, frames, 1): freq is H, time is W
        return jnp.swapaxes(mag, 1, 2)[..., None]

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        x = self._spectrogram(x)
        fmap = []
        specs = [((1, 1), ((1, 1), (4, 4))),
                 ((1, 2), ((1, 1), (4, 4))),
                 ((1, 2), ((1, 1), (4, 4))),
                 ((1, 2), ((1, 1), (4, 4)))]
        x = Conv2d(32 * self.channel_mult, (3, 9), strides=specs[0][0],
                   padding=specs[0][1], use_weight_norm=True, name="conv_0")(x)
        x = _lrelu(x)
        fmap.append(x)
        for i in range(1, 4):
            x = Conv2d(32 * self.channel_mult, (3, 9), strides=specs[i][0],
                       padding=specs[i][1], use_weight_norm=True,
                       name=f"conv_{i}")(x)
            x = _lrelu(x)
            fmap.append(x)
        x = Conv2d(32 * self.channel_mult, (3, 3), strides=(1, 1),
                   padding=((1, 1), (1, 1)), use_weight_norm=True,
                   name="conv_4")(x)
        x = _lrelu(x)
        fmap.append(x)
        x = Conv2d(1, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                   use_weight_norm=True, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


def _apply_paired(d, y, y_hat, paired: bool):
    """Run real and fake through the discriminator, optionally as ONE batch.

    Every op in DiscriminatorP/R is batch-parallel (pad/reshape/STFT/conv),
    so concatenating along batch is exact — it halves the kernel-launch
    count and doubles the per-conv batch, which keeps the MXU fed at
    training batch sizes (the discriminators dominate the GAN step cost).
    Use ``paired=False`` when only the FAKE half needs input gradients
    (the generator update): with a concatenated batch the conv input-VJPs
    would be computed for the real half too, only to be sliced away."""
    if not paired:
        r, fr = d(y)
        g, fg = d(y_hat)
        return r, g, fr, fg
    b = y.shape[0]
    out, fmap = d(jnp.concatenate([y, y_hat], axis=0))
    return out[:b], out[b:], [f[:b] for f in fmap], [f[b:] for f in fmap]


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channel_mult: int = 1

    @nn.compact
    def __call__(self, y, y_hat, paired: bool = True):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(period=p, channel_mult=self.channel_mult,
                               name=f"p{p}")
            r, g, fr, fg = _apply_paired(d, y, y_hat, paired)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class MultiResolutionDiscriminator(nn.Module):
    resolutions: Sequence[Sequence[int]] = ((1024, 120, 600), (2048, 240, 1200),
                                            (512, 50, 240))
    channel_mult: int = 1

    @nn.compact
    def __call__(self, y, y_hat, paired: bool = True):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for res in self.resolutions:
            d = DiscriminatorR(resolution=tuple(res),
                               channel_mult=self.channel_mult,
                               name=f"r{res[0]}_{res[1]}")
            r, g, fr, fg = _apply_paired(d, y, y_hat, paired)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
