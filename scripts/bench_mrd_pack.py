"""Experiment: frequency space-to-depth packing for the MRD 2-D convs.

DiscriminatorR's convs are 32->32 channels: the MXU output (N) dim uses
32/128 lanes. Packing 4 frequency rows into channels makes every conv
128->128 (full lanes) at the cost of 4x the nominal FLOPs (the packed
weight matrix is 1/4-dense: each output sub-row only consumes 3 of the
12 (tap, sub-row) input combinations). If the unpacked conv is
utilization-bound rather than FLOPs-bound, the packed form wins despite
the extra MACs. This measures both directions (fwd + input-grad) on the
real chip and checks exactness.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

P = 4  # pack factor on the frequency (H) axis


def pack_weights(w):
    """(3, kw, C, C) -> (3, kw, P*C, P*C) block-sparse packed equivalent."""
    kf, kw, ci, co = w.shape
    assert kf == 3
    wp = np.zeros((3, kw, P * ci, P * co), w.dtype)
    for o_sub in range(P):
        for k in range(kf):
            f_rel = o_sub + k - 1          # input row relative to pack start
            kp = (f_rel // P) + 1          # packed tap index (pad 1)
            i_sub = f_rel % P
            wp[kp, :, i_sub * ci:(i_sub + 1) * ci,
               o_sub * co:(o_sub + 1) * co] = w[k]
    return jnp.asarray(wp)


def conv(x, w, stride_w, pad_h=1, pad_w=4):
    # output dtype follows the operands (bf16) so the VJP cotangent dtype
    # matches the kernel dtype; MXU still accumulates f32 internally
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, stride_w),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    dtype = jnp.bfloat16
    b, f, t, c = 32, 512, 428, 32
    stride_w = 2
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, f, t, c), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 9, c, c), dtype) * 0.05

    xp = x.reshape(b, f // P, P, t, c).transpose(0, 1, 3, 2, 4).reshape(
        b, f // P, t, P * c)
    wp = pack_weights(np.asarray(w))

    # exactness
    y = conv(x, w, stride_w)
    yp = conv(xp, wp, stride_w)
    tw = yp.shape[2]
    y_ref = y.reshape(b, f // P, P, tw, c).transpose(0, 1, 3, 2, 4).reshape(
        b, f // P, tw, P * c)
    err = float(jnp.max(jnp.abs(y_ref - yp)) / (jnp.max(jnp.abs(y_ref)) + 1e-9))
    print(f"packed conv relative max err: {err:.2e}", flush=True)

    n_iter = 8

    def bench(fn, *args, tag=""):
        @jax.jit
        def loop(*a):
            def body(carry, i):
                # perturb the first operand per-iteration so XLA can't hoist
                # the conv out of the while-loop (invariant code motion)
                eps = jax.random.normal(
                    jax.random.fold_in(jax.random.PRNGKey(0), i),
                    a[0].shape, a[0].dtype) * 1e-6
                out = fn(a[0] + eps, *a[1:])
                return carry + out.astype(jnp.float32).sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_iter))
            return acc
        float(loop(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: {best / n_iter * 1e3:.2f} ms/iter", flush=True)
        return best / n_iter

    tu = bench(lambda a: conv(a, w, stride_w), x, tag="unpacked fwd")
    tp = bench(lambda a: conv(a, wp, stride_w), xp, tag="packed   fwd")

    # input-gradient direction (the generator update needs conv input VJPs)
    def g_u(a):
        return jax.grad(lambda z: conv(z, w, stride_w).astype(
            jnp.float32).sum())(a)

    def g_p(a):
        return jax.grad(lambda z: conv(z, wp, stride_w).astype(
            jnp.float32).sum())(a)

    tug = bench(g_u, x, tag="unpacked in-grad")
    tpg = bench(g_p, xp, tag="packed   in-grad")
    print(f"fwd speedup {tu / tp:.2f}x, in-grad speedup {tug / tpg:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
