"""2-D convolution with optional weight normalization (NHWC).

Used by the HiFi-GAN/BigVGAN discriminators (reference bigvgan/gan.py).
"""
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import _torch_conv_init, get_compute_dtype


class Conv2d(nn.Module):
    """NHWC Conv2d, torch-compatible semantics, optional weight norm."""
    features: int
    kernel_size: tuple  # (kh, kw)
    strides: tuple = (1, 1)
    padding: tuple = ((0, 0), (0, 0))  # ((top,bottom),(left,right))
    use_bias: bool = True
    use_weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        w_shape = (kh, kw, in_ch, self.features)
        fan_in = in_ch * kh * kw
        if self.use_weight_norm:
            # weight-norm init g = ||v|| so w == v initially; reference
            # additionally re-inits v ~ N(0, 0.01) (blocks.py:34-46)
            v = self.param("kernel_v",
                           lambda k: 0.01 * jax.random.normal(k, w_shape,
                                                              jnp.float32))
            g = self.param("kernel_g",
                           lambda k: jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2))))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
            kernel = v * (g[None, None, None, :] / norm)
        else:
            kernel = self.param("kernel",
                                lambda k: _torch_conv_init(k, w_shape, fan_in))
        cd = get_compute_dtype()
        y = jax.lax.conv_general_dilated(
            x.astype(cd), kernel.astype(cd),
            window_strides=self.strides,
            padding=[tuple(p) for p in self.padding],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", lambda k: _torch_conv_init(k, (self.features,),
                                                              fan_in))
            y = y + b.astype(cd)
        return y
