"""UNIVERSE score network: waveform U-Net with GRU bottleneck.

Parity target: reference ``ScoreNetwork`` (score.py:214-298) —
input conv -> 4 strided-conv down blocks (rates [2,4,4,5] => x160,
channels 32->512) -> optional extra conv block -> BiGRU bottleneck ->
mirrored transposed-conv up blocks with skip connections; FiLM noise
conditioning at every block; per-level signal conditioning injected from
the conditioner network.

TPU design: static shapes throughout (input length must be a multiple of
prod(rate_factors)); the only sequential op is the bottleneck BiGRU
(~T/160 steps) implemented as a lax.scan with hoisted input projections.
"""
import math
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.conv import Conv1d, Dense, PReLU
from ...ops.embeddings import SigmaBlock, SimpleTimeEmbedding
from ...ops.gru import GRU
from .blocks import ConvBlock, PReLUConv, fold_signal_cond_enabled


class ScoreEncoder(nn.Module):
    ds_factors: Sequence[int]
    input_channels: int
    noise_cond_dim: int
    with_gru_conv_sandwich: bool = False
    with_extra_conv_block: bool = False
    act_type: str = "prelu"
    use_weight_norm: bool = False
    seq_model: str = "gru"
    use_antialiasing: bool = False

    @nn.compact
    def __call__(self, x, noise_cond):
        c = self.input_channels
        residuals, lengths = [], []
        for i, r in enumerate(self.ds_factors):
            nc = Dense(c * 2 ** (i + 1), use_weight_norm=self.use_weight_norm,
                       name=f"cond_proj_{i}")(noise_cond)
            lengths.append(x.shape[-2])
            x, res, _ = ConvBlock(c * 2**i, r, "down", act_type=self.act_type,
                                  use_weight_norm=self.use_weight_norm,
                                  antialiasing=self.use_antialiasing,
                                  name=f"ds_{i}")(x, noise_cond=nc)
            residuals.append(res)

        oc = c * 2 ** len(self.ds_factors)
        if self.with_extra_conv_block:
            nc = Dense(2 * oc, use_weight_norm=self.use_weight_norm,
                       name="cond_proj_extra")(noise_cond)
            lengths.append(x.shape[-2])
            x, res, _ = ConvBlock(oc, act_type=self.act_type,
                                  use_weight_norm=self.use_weight_norm,
                                  name="ds_extra")(x, noise_cond=nc)
            residuals.append(res)

        if self.seq_model == "gru":
            if self.with_gru_conv_sandwich:
                x, *_ = ConvBlock(oc, act_type=self.act_type,
                                  use_weight_norm=self.use_weight_norm,
                                  name="gru_conv1")(x)
            x = GRU(hidden_size=oc // 2, bidirectional=True, name="gru")(x)
            if self.with_gru_conv_sandwich:
                x, *_ = ConvBlock(oc, act_type=self.act_type,
                                  use_weight_norm=self.use_weight_norm,
                                  name="gru_conv2")(x)
        elif self.seq_model != "none":
            raise ValueError("seq_model must be gru|none")

        return x, residuals[::-1], lengths[::-1]


class ScoreDecoder(nn.Module):
    """Setup-style (not ``nn.compact``) so the per-level signal-conditioning
    1x1 convs can ALSO be applied on their own via ``project_cond``: the
    conditioner output is fixed across all sampler steps, so ``enhance()``
    projects it ONCE per utterance instead of once per score call — at the
    two highest-resolution levels that removes HBM traffic from the 8-step
    loop. Param paths are unchanged vs the previous compact version."""
    up_factors: Sequence[int]  # reversed rate factors
    input_channels: int
    noise_cond_dim: int
    with_extra_conv_block: bool = False
    act_type: str = "prelu"
    use_weight_norm: bool = False
    use_antialiasing: bool = False

    def setup(self):
        c = self.input_channels
        n = len(self.up_factors)
        blocks = []
        if self.with_extra_conv_block:
            blocks.append(("extra", c * 2**n, None))
        for i, r in enumerate(self.up_factors):
            blocks.append((f"up_{i}", c * 2 ** (n - i - 1), r))
        self.blocks = tuple(blocks)
        for name, ch, r in blocks:
            setattr(self, f"noise_cond_proj_{name}",
                    Dense(2 * ch, use_weight_norm=self.use_weight_norm))
            setattr(self, f"signal_cond_proj_{name}",
                    Conv1d(ch, 1, use_weight_norm=self.use_weight_norm))
            if r is None:
                blk = ConvBlock(ch, act_type=self.act_type,
                                use_weight_norm=self.use_weight_norm)
            else:
                blk = ConvBlock(ch, r, "up", act_type=self.act_type,
                                use_weight_norm=self.use_weight_norm,
                                antialiasing=self.use_antialiasing)
            setattr(self, name, blk)

    def project_cond(self, input_cond):
        """Per-level 1x1 signal-cond projections (sampler-loop-invariant)."""
        return [getattr(self, f"signal_cond_proj_{name}")(cond)
                for (name, _, _), cond in zip(self.blocks, input_cond)]

    def __call__(self, x, noise_cond, input_cond, residuals, lengths,
                 cond_projected: bool = False):
        # fold the per-level 1x1 projection into each block's conv1 when
        # enabled (training path only — the serving path hoists the
        # projection out of the sampler loop instead, project_cond)
        fold = fold_signal_cond_enabled() and not cond_projected
        if not cond_projected and not fold:
            input_cond = self.project_cond(input_cond)
        for (name, ch, r), sc, res, length in zip(self.blocks, input_cond,
                                                  residuals, lengths):
            nc = getattr(self, f"noise_cond_proj_{name}")(noise_cond)
            cond_fold = None
            if fold:
                proj = getattr(self, f"signal_cond_proj_{name}")
                dummy = jnp.zeros((1, 8, sc.shape[-1]), sc.dtype)
                _, cond_fold = proj(dummy, with_params=True)
            x, *_ = getattr(self, name)(x, noise_cond=nc, input_cond=sc,
                                        res=res, length=length,
                                        cond_fold=cond_fold)
        return x


class ScoreNetwork(nn.Module):
    """Score s(x_t, sigma | cond). Input/output (B, T, input_channels)."""
    fb_kernel_size: int = 3
    rate_factors: Sequence[int] = (2, 4, 4, 5)
    n_channels: int = 32
    n_rff: int = 32
    noise_cond_dim: int = 512
    encoder_gru_conv_sandwich: bool = False
    extra_conv_block: bool = False
    encoder_act_type: str = "prelu"
    decoder_act_type: str = "prelu"
    input_channels: int = 1
    output_channels: int = 1
    use_weight_norm: bool = False
    seq_model: str = "gru"
    use_antialiasing: bool = False
    time_embedding: str = "rff"  # rff | simple

    def setup(self):
        if self.time_embedding == "simple":
            self.sigma_block = SimpleTimeEmbedding(n_dim=self.noise_cond_dim)
        else:
            self.sigma_block = SigmaBlock(self.n_rff, self.noise_cond_dim)
        self.input_conv = Conv1d(self.n_channels, self.fb_kernel_size,
                                 padding="same")
        self.encoder = ScoreEncoder(
            ds_factors=self.rate_factors,
            input_channels=self.n_channels,
            noise_cond_dim=self.noise_cond_dim,
            with_gru_conv_sandwich=self.encoder_gru_conv_sandwich,
            with_extra_conv_block=self.extra_conv_block,
            act_type=self.encoder_act_type,
            use_weight_norm=self.use_weight_norm,
            seq_model=self.seq_model,
            use_antialiasing=self.use_antialiasing)
        self.decoder = ScoreDecoder(
            up_factors=tuple(self.rate_factors[::-1]),
            input_channels=self.n_channels,
            noise_cond_dim=self.noise_cond_dim,
            with_extra_conv_block=self.extra_conv_block,
            act_type=self.decoder_act_type,
            use_weight_norm=self.use_weight_norm,
            use_antialiasing=self.use_antialiasing)
        self.prelu = PReLU()
        self.output_conv = PReLUConv(
            self.output_channels, kernel_size=self.fb_kernel_size,
            padding="same", use_weight_norm=self.use_weight_norm)

    def project_cond(self, cond):
        """Hoistable per-level signal-cond projections (see ScoreDecoder)."""
        return self.decoder.project_cond(cond)

    def __call__(self, x, sigma, cond, cond_projected: bool = False):
        n_samples = x.shape[-2]

        g = self.sigma_block(jnp.log10(sigma))
        x = self.input_conv(x)
        h, residuals, lengths = self.encoder(x, noise_cond=g)
        s = self.decoder(h, noise_cond=g, input_cond=cond,
                         residuals=residuals, lengths=lengths,
                         cond_projected=cond_projected)
        s = self.prelu(s)
        s = self.output_conv(s)
        t = s.shape[-2]
        if t < n_samples:
            s = jnp.pad(s, ((0, 0), (0, n_samples - t), (0, 0)))
        elif t > n_samples:
            s = s[:, :n_samples, :]
        return s
