"""1-D convolutions with optional weight normalization, channels-last.

Behavioral parity targets (for checkpoint/numerics parity with the
reference, NOT a code translation):
  - reference ``PReLU_Conv`` (open_universe/networks/universe/blocks.py:137-231)
    pads the input on the right to a multiple of the stride before a strided
    conv, and uses ``kernel_size == stride`` "patch" convolutions for rate
    changes.
  - torch ``Conv1d(padding="same")`` for odd kernels == symmetric zero pad.
  - weight norm: w = g * v / ||v||, norm taken per output channel.

TPU notes: a stride-R kernel-R conv is a pure reshape + matmul; XLA lowers
``lax.conv_general_dilated`` with NWC/WIO dimension numbers onto the MXU.
"""
import contextlib
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# -------------------------------------------------------- compute precision
# Global compute dtype for the heavy ops (convs/dense/GRU): params stay
# float32, matmul operands are cast at use. bf16 halves HBM traffic on TPU
# (the usual bottleneck) with negligible quality impact for this model.
_COMPUTE_DTYPE = [jnp.float32]


def set_compute_dtype(dtype):
    """Set globally (affects subsequent traces). Use 'bfloat16' for prod."""
    _COMPUTE_DTYPE[0] = jnp.dtype(dtype)


def get_compute_dtype():
    return _COMPUTE_DTYPE[0]


@contextlib.contextmanager
def compute_dtype(dtype):
    old = _COMPUTE_DTYPE[0]
    set_compute_dtype(dtype)
    try:
        yield
    finally:
        set_compute_dtype(old)


def _same_pads(kernel_size: int, dilation: int = 1) -> tuple:
    """Symmetric padding identical to torch Conv1d(padding="same")."""
    eff = dilation * (kernel_size - 1)
    lo = eff // 2
    return (lo, eff - lo)


def conv1d(x, kernel, stride: int = 1, padding="VALID", dilation: int = 1,
           groups: int = 1):
    """Convolve ``x (B, T, Cin)`` with ``kernel (W, Cin//groups, Cout)``."""
    if isinstance(padding, str):
        pad = padding
    else:
        pad = [tuple(padding)]
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride,),
        padding=pad if not isinstance(pad, str) else pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )


def conv_transpose1d(x, kernel, stride: int = 1):
    """Transposed conv, torch ConvTranspose1d semantics with padding=0.

    ``x (B, T, Cin)``, ``kernel (W, Cin, Cout)`` -> ``(B, (T-1)*stride + W, Cout)``.
    Implemented as input-dilated convolution with a spatially-flipped kernel,
    which XLA fuses into a single MXU-friendly conv.
    """
    w = kernel[::-1]  # flip taps: transposed conv correlates with flipped kernel
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def prelu(x, alpha):
    """PReLU with scalar or per-channel alpha (torch.nn.PReLU semantics)."""
    return jnp.where(x >= 0, x, alpha * x)


class PReLU(nn.Module):
    """Parametric ReLU; ``num_parameters=1`` scalar slope like torch default."""
    num_parameters: int = 1
    init: float = 0.25

    @nn.compact
    def __call__(self, x, *, with_params: bool = False):
        alpha = self.param(
            "alpha", lambda k: jnp.full((self.num_parameters,), self.init, jnp.float32)
        )
        if self.num_parameters == 1:
            a = alpha[0]
        else:
            a = alpha  # broadcast over trailing channel dim
        y = prelu(x, a)
        if with_params:
            return y, a
        return y


def _torch_conv_init(key, shape, fan_in):
    """torch Conv default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def fold_fir_into_kernel(kernel, taps):
    """Fold a symmetric depthwise FIR into a conv kernel (exact fusion).

    ``lowpass(K taps, same-pad)`` then ``conv(kernel k)`` — or the
    transposed conv then lowpass — equals ONE conv whose taps are the full
    1-D convolution of the kernel taps with the FIR taps along the tap
    axis (length k + K - 1). On TPU this removes a whole HBM round-trip
    per rate change: the reference's anti-aliased strided convs
    (blocks.py:137-231) are two conv passes; fused they are one,
    and since these convs are memory-bound the extra taps are free.
    """
    k = kernel.shape[0]
    n = k + taps.shape[0] - 1
    out = jnp.zeros((n,) + kernel.shape[1:], kernel.dtype)
    for i in range(k):
        out = out.at[i : i + taps.shape[0]].add(kernel[i] * taps[:, None, None])
    return out


class Conv1d(nn.Module):
    """Channels-last Conv1d with optional weight normalization.

    padding: "same" | "valid" | int pair semantics as torch.
    When ``use_weight_norm`` the kernel is parameterized as (v, g) with
    w = g * v / ||v||_{W,I} and v initialized N(0, 0.01) to mirror the
    reference's ``cond_weight_norm`` + ``init_weights``
    (blocks.py:34-46).
    ``fir_taps``: symmetric anti-alias FIR (length 2*kernel_size+1,
    same-padded) applied BEFORE the conv, folded into the conv kernel
    (see fold_fir_into_kernel). Requires padding == "valid".
    """
    features: int
    kernel_size: int
    stride: int = 1
    padding: str = "valid"  # "same" | "valid"
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    use_weight_norm: bool = False
    fir_taps: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, *, with_params: bool = False):
        in_ch = x.shape[-1]
        w_shape = (self.kernel_size, in_ch // self.groups, self.features)
        fan_in = (in_ch // self.groups) * self.kernel_size

        if self.use_weight_norm:
            v = self.param("kernel_v",
                           lambda k: 0.01 * jax.random.normal(k, w_shape, jnp.float32))
            g = self.param("kernel_g",
                           lambda k: jnp.sqrt(jnp.sum(v * v, axis=(0, 1))))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
            kernel = v * (g[None, None, :] / norm)
        else:
            kernel = self.param("kernel",
                                lambda k: _torch_conv_init(k, w_shape, fan_in))
        raw_kernel = kernel  # pre-FIR, post-weight-norm (for fused kernels)

        if self.fir_taps is not None:
            assert self.padding == "valid" and self.dilation == 1 \
                and self.groups == 1, "fir_taps requires plain valid conv"
            taps = jnp.asarray(self.fir_taps, kernel.dtype)
            half = (taps.shape[0] - 1) // 2
            kernel = fold_fir_into_kernel(kernel, taps)
            pad = (half, taps.shape[0] - 1 - half)
        elif self.padding == "same":
            pad = _same_pads(self.kernel_size, self.dilation)
        elif self.padding == "valid":
            pad = (0, 0)
        else:
            pad = self.padding
        cd = get_compute_dtype()
        y = conv1d(x.astype(cd), kernel.astype(cd), stride=self.stride,
                   padding=pad, dilation=self.dilation, groups=self.groups)
        b = None
        if self.use_bias:
            b = self.param("bias",
                           lambda k: _torch_conv_init(k, (self.features,), fan_in))
            y = y + b.astype(cd)
        if with_params:
            return y, (raw_kernel, b)
        return y


class ConvTranspose1d(nn.Module):
    """Channels-last transposed conv (torch semantics, padding=0).

    ``fir_taps``: symmetric anti-alias FIR (same-padded) applied AFTER the
    transposed conv, folded into the kernel (one HBM pass instead of two;
    exact because the FIR is symmetric — see fold_fir_into_kernel).
    """
    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    use_weight_norm: bool = False
    fir_taps: Optional[tuple] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # stored in WIO with I=in, O=out (flip + swap handled by conv_transpose1d)
        w_shape = (self.kernel_size, in_ch, self.features)
        # torch ConvTranspose1d fan_in = out_channels * kernel (weight (I, O, W))
        fan_in = self.features * self.kernel_size

        if self.use_weight_norm:
            v = self.param("kernel_v",
                           lambda k: 0.01 * jax.random.normal(k, w_shape, jnp.float32))
            # torch weight_norm on ConvTranspose1d normalizes per *input*
            # channel (dim=0 of (I, O, W)); we normalize per output channel
            # for consistency across conv types (documented deviation; only
            # affects the parameterization, not the function class).
            g = self.param("kernel_g",
                           lambda k: jnp.sqrt(jnp.sum(v * v, axis=(0, 1))))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
            kernel = v * (g[None, None, :] / norm)
        else:
            kernel = self.param("kernel",
                                lambda k: _torch_conv_init(k, w_shape, fan_in))
        cd = get_compute_dtype()
        if self.fir_taps is not None:
            taps = jnp.asarray(self.fir_taps, kernel.dtype)
            half = (taps.shape[0] - 1) // 2
            kernel = fold_fir_into_kernel(kernel, taps)
            y = conv_transpose1d(x.astype(cd), kernel.astype(cd),
                                 stride=self.stride)
            hi = taps.shape[0] - 1 - half
            y = y[:, half : y.shape[1] - hi, :]
        else:
            y = conv_transpose1d(x.astype(cd), kernel.astype(cd),
                                 stride=self.stride)
        if self.use_bias:
            b = self.param("bias",
                           lambda k: _torch_conv_init(k, (self.features,), fan_in))
            y = y + b.astype(cd)
        return y


class Dense(nn.Module):
    """Linear layer with torch init and optional weight norm."""
    features: int
    use_bias: bool = True
    use_weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w_shape = (in_dim, self.features)
        if self.use_weight_norm:
            v = self.param("kernel_v",
                           lambda k: 0.01 * jax.random.normal(k, w_shape, jnp.float32))
            g = self.param("kernel_g",
                           lambda k: jnp.sqrt(jnp.sum(v * v, axis=0)))
            norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True) + 1e-12)
            kernel = v * (g[None, :] / norm)
        else:
            kernel = self.param("kernel",
                                lambda k: _torch_conv_init(k, w_shape, in_dim))
        cd = get_compute_dtype()
        y = x.astype(cd) @ kernel.astype(cd)
        if self.use_bias:
            b = self.param("bias",
                           lambda k: _torch_conv_init(k, (self.features,), in_dim))
            y = y + b.astype(cd)
        return y
