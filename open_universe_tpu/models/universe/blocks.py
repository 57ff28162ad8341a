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
from ...ops.antialias import binomial_filter
from ...ops.conv import (
    Conv1d,
    ConvTranspose1d,
    PReLU,
    _same_pads,
    conv1d,
    get_compute_dtype,
    prelu,
)
from ...ops.film import film

# ---------------------------------------------------------------- fold flag
# Decoder signal-cond projection fold (PERF.md "next levers"): compute the
# per-level 1x1 signal-cond projection INSIDE the block's conv1 as a
# channel-concat conv — conv5([act(h); cond], [W1; center-tap Wp]) ==
# conv5(act(h), W1) + conv1x1(cond, Wp) exactly — removing the separate
# projection conv's HBM round-trip (one read of cond + one write of sc)
# at every decoder level of every score call. Costs extra MXU FLOPs on
# the widened conv1; profitable only where the step is bytes-bound.
# Default OFF; flip with set_fold_signal_cond for measurement
# (scripts/profile_train.py --fold-cond).
_FOLD_SIGNAL_COND = False


def set_fold_signal_cond(enabled: bool):
    global _FOLD_SIGNAL_COND
    _FOLD_SIGNAL_COND = bool(enabled)


def fold_signal_cond_enabled() -> bool:
    return _FOLD_SIGNAL_COND
from ...ops.pallas_conv_block import (
    fused_conv_stack,
    fusion_profitable,
    pallas_conv_block_interpret,
    use_pallas_conv_block,
)

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
    def __call__(self, x, *, with_params: bool = False):
        in_ch = x.shape[-1]
        # pad the time axis up to a stride multiple (reference blocks.py:209-213)
        if not self.use_transpose and self.stride > 1:
            r = x.shape[-2] % self.stride
            if r != 0:
                x = jnp.pad(x, ((0, 0), (0, self.stride - r), (0, 0)))

        alpha = None
        if self.act_type == "prelu":
            x, alpha = PReLU(name="act")(x, with_params=True)
        elif self.act_type in ("snake", "snakebeta"):
            x = SnakeAlias(features=in_ch, with_beta=self.act_type == "snakebeta",
                           name="act")(x)
        elif self.act_type != "none":
            raise ValueError(f"unknown act_type {self.act_type}")

        # Anti-aliased strided convs run as ONE conv: the binomial FIR is
        # folded into the conv kernel (ops/conv.py:fold_fir_into_kernel) —
        # exact, and removes a full HBM round-trip at the block's highest
        # resolution (these convs are memory-bound on TPU).
        aa_kernel = 2 * self.kernel_size + 1
        fir = (tuple(binomial_filter(aa_kernel).tolist())
               if self.use_antialiasing else None)

        conv_bias = not self.use_antialiasing
        kernel = bias = None
        if self.use_transpose:
            x = ConvTranspose1d(self.features, self.kernel_size,
                                stride=self.stride, use_bias=conv_bias,
                                use_weight_norm=self.use_weight_norm,
                                fir_taps=fir, name="conv")(x)
        else:
            x, (kernel, bias) = Conv1d(
                self.features, self.kernel_size, stride=self.stride,
                padding=self.padding, use_bias=conv_bias,
                use_weight_norm=self.use_weight_norm,
                fir_taps=fir, name="conv")(x, with_params=True)

        if self.use_antialiasing:
            aa_bias = self.param("bias", nn.initializers.zeros,
                                 (self.features,))
            x = x + aa_bias
        if with_params:
            return x, (kernel, bias, alpha)
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
                 length: Optional[int] = None, cond_fold=None):
        """``cond_fold``: optional (wp, bp) effective params of the
        caller's 1x1 signal-cond projection; when given, ``input_cond``
        is the RAW conditioner output and the projection is folded into
        conv1 (see set_fold_signal_cond)."""
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

        conv1 = PReLUConv(c, kernel_size=5, padding="same",
                          act_type=self.act_type,
                          use_weight_norm=self.use_weight_norm, name="conv1")
        conv2 = PReLUConv(c, kernel_size=3, padding="same",
                          act_type=self.act_type,
                          use_weight_norm=self.use_weight_norm, name="conv2")
        conv3 = PReLUConv(c, kernel_size=3, padding="same",
                          act_type=self.act_type,
                          use_weight_norm=self.use_weight_norm, name="conv3")

        # Fused Pallas path (serving): the whole act/conv/FiLM/residual
        # stack in ONE HBM pass (ops/pallas_conv_block.py). Params are
        # materialized through the standard submodules on a dummy slice
        # (dead code after XLA DCE), so the param tree is identical to the
        # unfused path and checkpoints are interchangeable.
        fuse = (use_pallas_conv_block()
                and self.act_type == "prelu"
                and (input_cond is None or self.signal_cond_type != "linear")
                and (noise_cond is None or noise_cond.ndim == 2)
                and fusion_profitable(h.shape[-2], c))
        def _apply_fold_proj(cond):
            # fallback for branches that need the PROJECTED cond: apply
            # the caller's 1x1 projection here (same math, not folded)
            wp, bp = cond_fold
            cd = get_compute_dtype()
            y = conv1d(cond.astype(cd), wp.astype(cd))
            return y + bp.astype(cd) if bp is not None else y

        if fuse:
            if cond_fold is not None and input_cond is not None:
                input_cond = _apply_fold_proj(input_cond)
            dummy = jnp.zeros((1, 8, c), h.dtype)
            _, (w1, b1, a1) = conv1(dummy, with_params=True)
            _, (w2, b2, a2) = conv2(dummy, with_params=True)
            _, (w3, b3, a3) = conv3(dummy, with_params=True)
            v_out, cond_out = fused_conv_stack(
                h, w1, b1, w2, b2, w3, b3, jnp.stack([a1, a2, a3]),
                film_gb=noise_cond, input_cond=input_cond, res=res,
                interpret=pallas_conv_block_interpret())
        elif (cond_fold is not None and input_cond is not None
              and self.act_type == "prelu"
              and self.signal_cond_type != "linear"):
            # folded path: one widened conv replaces conv1 + the 1x1
            # signal-cond projection + the add (exact algebra; see
            # set_fold_signal_cond)
            if res is not None:
                h = (h + res) * INV_SQRT2
            wp, bp = cond_fold
            dummy = jnp.zeros((1, 8, c), h.dtype)
            _, (w1, b1, a1) = conv1(dummy, with_params=True)
            hact = prelu(h, a1)
            xcat = jnp.concatenate([hact, input_cond], axis=-1)
            wp_pad = jnp.pad(wp, ((2, 2), (0, 0), (0, 0)))
            wcat = jnp.concatenate([w1, wp_pad], axis=1)  # (5, 2C, C)
            bias = b1 if b1 is not None else jnp.zeros((c,), h.dtype)
            if bp is not None:
                bias = bias + bp
            cd = get_compute_dtype()
            cond_out = conv1d(xcat.astype(cd), wcat.astype(cd),
                              padding=_same_pads(5)) + bias.astype(cd)
            x = cond_out * INV_SQRT2
            if noise_cond is not None:
                x = film(x, noise_cond)
            x = conv2(x)
            x = conv3(x)
            v_out = (h + x) * INV_SQRT2
        else:
            if cond_fold is not None and input_cond is not None:
                input_cond = _apply_fold_proj(input_cond)
            if res is not None:
                h = (h + res) * INV_SQRT2
            cond_out = conv1(h)
            if input_cond is not None:
                if self.signal_cond_type == "linear":
                    x = LinearProj(c, use_weight_norm=self.use_weight_norm,
                                   name="signal_cond_proj")(cond_out,
                                                            input_cond)
                else:
                    x = (cond_out + input_cond) * INV_SQRT2
            else:
                x = cond_out

            if noise_cond is not None:
                x = film(x, noise_cond)
            x = conv2(x)
            x = conv3(x)

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
