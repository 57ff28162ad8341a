"""UNIVERSE network building blocks (flax, channels-last).

Behavioral parity targets (structure re-designed for TPU, not translated):
  - ``PReLU_Conv`` (reference blocks.py:137-231): activation -> optional
    anti-alias low-pass -> (transposed) conv, with right-padding of the
    input to a stride multiple and a manual bias when anti-aliasing.
  - ``ConvBlock`` (reference blocks.py:234-416): the Appendix-D block —
    optional rate-change conv, residual stack conv5/conv3/conv3, FiLM
    noise conditioning, per-level signal-conditioning injection.
  - ``LinearProj`` (reference blocks.py:95-105).

All tensors are (B, T, C); all length arithmetic is static Python ints so
XLA sees fixed shapes.
"""
import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ...ops.activations import SnakeAlias
from ...ops.antialias import low_pass_filter
from ...ops.conv import Conv1d, ConvTranspose1d, PReLU
from ...ops.film import film

INV_SQRT2 = 1.0 / math.sqrt(2.0)


class PReLUConv(nn.Module):
    """act -> (anti-alias) -> conv / convT -> (anti-alias) [+ manual bias]."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: str = "valid"
    use_transpose: bool = False
    act_type: str = "prelu"       # prelu | snake | snakebeta | none
    use_weight_norm: bool = False
    use_antialiasing: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # pad the time axis up to a stride multiple (reference blocks.py:209-213)
        if not self.use_transpose and self.stride > 1:
            r = x.shape[-2] % self.stride
            if r != 0:
                x = jnp.pad(x, ((0, 0), (0, self.stride - r), (0, 0)))

        if self.act_type == "prelu":
            x = PReLU(name="act")(x)
        elif self.act_type in ("snake", "snakebeta"):
            x = SnakeAlias(features=in_ch, with_beta=self.act_type == "snakebeta",
                           name="act")(x)
        elif self.act_type != "none":
            raise ValueError(f"unknown act_type {self.act_type}")

        aa_kernel = 2 * self.kernel_size + 1
        if self.use_antialiasing and not self.use_transpose:
            x = low_pass_filter(x, aa_kernel)

        conv_bias = not self.use_antialiasing
        if self.use_transpose:
            x = ConvTranspose1d(self.features, self.kernel_size,
                                stride=self.stride, use_bias=conv_bias,
                                use_weight_norm=self.use_weight_norm,
                                name="conv")(x)
        else:
            x = Conv1d(self.features, self.kernel_size, stride=self.stride,
                       padding=self.padding, use_bias=conv_bias,
                       use_weight_norm=self.use_weight_norm, name="conv")(x)

        if self.use_antialiasing and self.use_transpose:
            x = low_pass_filter(x, aa_kernel)

        if self.use_antialiasing:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            x = x + bias
        return x


class LinearProj(nn.Module):
    """(proj(c) + x) / sqrt(2) — 1x1-conv conditioning mixer."""
    features: int
    use_weight_norm: bool = False

    @nn.compact
    def __call__(self, x, c):
        p = Conv1d(self.features, 1, use_weight_norm=self.use_weight_norm,
                   name="proj")(c)
        return (p + x) * INV_SQRT2


class ConvBlock(nn.Module):
    """UNIVERSE Appendix-D conv block.

    Returns (next_stage, skip_residual, cond_out) like the reference.
    ``rate_change_dir``: "down" halves the rate AFTER the residual stack,
    "up" doubles it BEFORE (transposed conv), "none" keeps it.
    """
    n_channels: int
    rate_change: Optional[int] = None
    rate_change_dir: str = "none"  # up | down | none
    act_type: str = "prelu"
    antialiasing: bool = False
    use_weight_norm: bool = False
    signal_cond_type: Optional[str] = None  # linear | none

    @nn.compact
    def __call__(self, h, noise_cond=None, input_cond=None, res=None,
                 length: Optional[int] = None):
        c = self.n_channels

        if self.rate_change_dir == "up":
            r = self.rate_change
            if length is not None and r * h.shape[-2] < length:
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 0)))
            h = PReLUConv(c, kernel_size=r, stride=r, use_transpose=True,
                          use_weight_norm=self.use_weight_norm,
                          use_antialiasing=self.antialiasing,
                          name="rate_change_conv")(h)
            if length is not None:
                t = h.shape[-2]
                if t < length:
                    h = jnp.pad(h, ((0, 0), (0, length - t), (0, 0)))
                elif t > length:
                    h = h[:, :length, :]

        if res is not None:
            if self.rate_change_dir == "down":
                raise ValueError("residual input not allowed for down blocks")
            h = (h + res) * INV_SQRT2

        cond_out = PReLUConv(c, kernel_size=5, padding="same",
                             act_type=self.act_type,
                             use_weight_norm=self.use_weight_norm,
                             name="conv1")(h)
        if input_cond is not None:
            if self.signal_cond_type == "linear":
                x = LinearProj(c, use_weight_norm=self.use_weight_norm,
                               name="signal_cond_proj")(cond_out, input_cond)
            else:
                x = (cond_out + input_cond) * INV_SQRT2
        else:
            x = cond_out

        if noise_cond is not None:
            x = film(x, noise_cond)
        x = PReLUConv(c, kernel_size=3, padding="same", act_type=self.act_type,
                      use_weight_norm=self.use_weight_norm, name="conv2")(x)
        x = PReLUConv(c, kernel_size=3, padding="same", act_type=self.act_type,
                      use_weight_norm=self.use_weight_norm, name="conv3")(x)

        v_out = (h + x) * INV_SQRT2

        if self.rate_change_dir == "down":
            r = self.rate_change
            rem = v_out.shape[-2] % r
            v_pad = (jnp.pad(v_out, ((0, 0), (0, r - rem), (0, 0)))
                     if rem != 0 else v_out)
            h_out = PReLUConv(2 * c, kernel_size=r, stride=r,
                              use_weight_norm=self.use_weight_norm,
                              use_antialiasing=self.antialiasing,
                              name="rate_change_conv")(v_pad)
            return h_out, v_out, cond_out
        return v_out, v_out, cond_out
