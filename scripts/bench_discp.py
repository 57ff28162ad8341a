"""Microbench: DiscriminatorP conv formulations (2-D (5,1) vs folded 1-D).

The period discriminator's convs are kernel (5,1) stride (3,1) over
(B, frames, period, C): the W axis (period) is pointwise, so the SAME
math is a 1-D conv over frames with period folded into batch:
(B, H, W, C) -> transpose -> (B*W, H, C) -> conv1d k5 s3.
This measures whether XLA tiles the tiny-W 2-D conv badly on the MXU.
"""
import sys
import time

import jax
import jax.numpy as jnp


def timed(fn, *args, n=3):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    b, t = 16, 64160
    n_inner = 4
    dt = jnp.bfloat16
    periods = (2, 3, 5, 7, 11)
    chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
    strides = [3, 3, 3, 3, 1]

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2 * b, t, 1), dt)  # real+fake batch

    def weights(p_key):
        ws = []
        for (ci, co), _ in zip(chans, strides):
            p_key, k = jax.random.split(p_key)
            ws.append(jax.random.normal(k, (5, 1, ci, co), dt) * 0.02)
        return ws

    ws = weights(jax.random.PRNGKey(1))

    def fold(x, p):
        tt = x.shape[1]
        if tt % p:
            x = jnp.pad(x, ((0, 0), (0, p - tt % p), (0, 0)), mode="reflect")
        return x.reshape(x.shape[0], -1, p, x.shape[-1])

    @jax.jit
    def conv2d_path(x):
        def one(c, i):
            acc = c
            for p in periods:
                h = fold(x * (1 + 1e-6 * c).astype(x.dtype), p)
                for w, s in zip(ws, strides):
                    h = jax.lax.conv_general_dilated(
                        h, w, window_strides=(s, 1),
                        padding=[(2, 2), (0, 0)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    h = jnp.where(h >= 0, h, 0.1 * h)
                acc = acc + h.astype(jnp.float32).sum()
            return acc, None
        acc, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(n_inner))
        return acc

    @jax.jit
    def conv1d_path(x):
        def one(c, i):
            acc = c
            for p in periods:
                h = fold(x * (1 + 1e-6 * c).astype(x.dtype), p)  # (B, H, p, C)
                bb, hh, pp, cc = h.shape
                h = h.transpose(0, 2, 1, 3).reshape(bb * pp, hh, cc)
                for w, s in zip(ws, strides):
                    h = jax.lax.conv_general_dilated(
                        h, w[:, 0], window_strides=(s,), padding=[(2, 2)],
                        dimension_numbers=("NWC", "WIO", "NWC"))
                    h = jnp.where(h >= 0, h, 0.1 * h)
                acc = acc + h.astype(jnp.float32).sum()
            return acc, None
        acc, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(n_inner))
        return acc

    # grad variants (the disc update cost is fwd+bwd)
    @jax.jit
    def conv2d_grad(x):
        def loss(ws_):
            s = jnp.zeros(())
            for p in periods:
                h = fold(x, p)
                for w, st in zip(ws_, strides):
                    h = jax.lax.conv_general_dilated(
                        h, w, window_strides=(st, 1),
                        padding=[(2, 2), (0, 0)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    h = jnp.where(h >= 0, h, 0.1 * h)
                s = s + (h.astype(jnp.float32) ** 2).mean()
            return s
        g = jax.grad(loss)(ws)
        return sum(v.astype(jnp.float32).sum() for v in g)

    @jax.jit
    def conv1d_grad(x):
        def loss(ws_):
            s = jnp.zeros(())
            for p in periods:
                h = fold(x, p)
                bb, hh, pp, cc = h.shape
                h = h.transpose(0, 2, 1, 3).reshape(bb * pp, hh, cc)
                for w, st in zip(ws_, strides):
                    h = jax.lax.conv_general_dilated(
                        h, w[:, 0], window_strides=(st,), padding=[(2, 2)],
                        dimension_numbers=("NWC", "WIO", "NWC"))
                    h = jnp.where(h >= 0, h, 0.1 * h)
                s = s + (h.astype(jnp.float32) ** 2).mean()
            return s
        g = jax.grad(loss)(ws)
        return sum(v.astype(jnp.float32).sum() for v in g)

    flops = 0
    for p in periods:
        h = t // p + (p - t % p if t % p else 0)
        for (ci, co), s in zip(chans, strides):
            h = -(-h // s) if s > 1 else h
            flops += h * p * 5 * ci * co * 2
    flops *= 2 * b  # real+fake

    for name, fn, mult in [("conv2d (5,1) fwd", conv2d_path, n_inner),
                           ("conv1d fold fwd", conv1d_path, n_inner),
                           ("conv2d (5,1) fwd+bwd", conv2d_grad, 3),
                           ("conv1d fold fwd+bwd", conv1d_grad, 3)]:
        dt_s = timed(fn, x0) / (n_inner if "fwd+" not in name else 1)
        eff = flops * (1 if "fwd+" not in name else 3) / dt_s / 1e12
        print(f"{name:22s}: {dt_s*1e3:8.1f} ms   ~{eff:6.1f} TF/s eff",
              flush=True)


if __name__ == "__main__":
    main()
