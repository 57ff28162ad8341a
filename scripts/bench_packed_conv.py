"""Microbenchmark: direct conv1d vs space-to-depth packed conv.

A stride-1 kernel-k conv over (B, T, C) with small C wastes the MXU (XLA
pads channels to the 128-lane tile). Packing p consecutive samples into
channels, (B, T/p, p*C), turns it into a kernel-3 conv over p*C >= 128
channels: p^2 * 3/k more FLOPs but ~ (128/C)^2 better MXU packing.

Validates exactness vs conv1d, then times both chained (carry = output so
nothing hoists out of the scan).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from open_universe_tpu.ops.conv import conv1d, _same_pads


def pack_kernel(w, p, n_taps=3):
    """(k, C, C) stride-1 same-pad conv kernel -> (n_taps, p*C, p*C) packed.

    y[p*f + j] = sum_k' x[p*f + j + k' - lo] w[k']  with lo = (k-1)//2.
    Packed: Y[f, j*C:(j+1)*C] = sum_m sum_ji X[f+m-1, ji] W'[m, ji, j]
    where the input sample index is (f+m-1)*p + ji = p*f + j + k' - lo.
    """
    k, cin, cout = w.shape
    lo = (k - 1) // 2
    wp = np.zeros((n_taps, p * cin, p * cout), np.float32)
    for m in range(n_taps):
        for ji in range(p):
            for jo in range(p):
                kp = lo + ji + (m - 1) * p - jo
                if 0 <= kp < k:
                    wp[m, ji * cin : (ji + 1) * cin,
                       jo * cout : (jo + 1) * cout] = w[kp]
    return jnp.asarray(wp)


def conv1d_packed(xp, wp):
    """xp (B, F, p*C), wp (3, p*C, p*C): same-pad kernel-3 conv."""
    return jax.lax.conv_general_dilated(
        xp, wp, window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"))


def timed(fn, *args, n_outer=3):
    jax.block_until_ready(fn(*args))
    float(jnp.sum(fn(*args)))
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def bench(batch, t, c, k, p, n_inner=8, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (batch, t, c)) * 0.1).astype(dtype)
    w = (jax.random.normal(jax.random.fold_in(key, 1), (k, c, c)) * 0.1)
    w = w.astype(dtype)
    wp = pack_kernel(np.asarray(w, np.float32), p).astype(dtype)

    # --- exactness
    y_ref = conv1d(x.astype(jnp.float32),
                   w.astype(jnp.float32), padding=_same_pads(k))
    xp = x.astype(jnp.float32).reshape(batch, t // p, p * c)
    y_pk = conv1d_packed(xp, wp.astype(jnp.float32)).reshape(batch, t, c)
    err = float(jnp.max(jnp.abs(y_ref - y_pk)))
    print(f"  exactness max|err| = {err:.2e}")
    assert err < 1e-4

    @jax.jit
    def direct(x, w):
        def body(h, i):
            return conv1d(h, w, padding=_same_pads(k)), None
        h, _ = jax.lax.scan(body, x, jnp.arange(n_inner))
        return h.astype(jnp.float32).sum()

    @jax.jit
    def packed(x, wp):
        xp = x.reshape(batch, t // p, p * c)
        def body(h, i):
            return conv1d_packed(h, wp), None
        h, _ = jax.lax.scan(body, xp, jnp.arange(n_inner))
        return h.astype(jnp.float32).sum()

    td = timed(direct, x, w) / n_inner
    tp = timed(packed, x, wp) / n_inner
    gf = 2 * batch * t * k * c * c / 1e9
    print(f"  direct: {td*1e3:7.2f} ms ({gf/td:7.0f} GF/s)   "
          f"packed: {tp*1e3:7.2f} ms   speedup {td/tp:.2f}x")


def main():
    batch = 128
    for t, c, k, p in [(64160, 32, 5, 4), (64160, 32, 3, 4),
                       (32080, 64, 5, 2), (32080, 64, 3, 2),
                       (8020, 128, 5, 1)]:
        if p == 1:
            print(f"T={t} C={c} k={k}: (no packing; direct only)")
            key = jax.random.PRNGKey(0)
            x = (jax.random.normal(key, (batch, t, c)) * 0.1
                 ).astype(jnp.bfloat16)
            w = (jax.random.normal(key, (k, c, c)) * 0.1).astype(jnp.bfloat16)

            @jax.jit
            def direct(x, w):
                def body(h, i):
                    return conv1d(h, w, padding=_same_pads(k)), None
                h, _ = jax.lax.scan(body, x, jnp.arange(8))
                return h.astype(jnp.float32).sum()
            td = timed(direct, x, w) / 8
            gf = 2 * batch * t * k * c * c / 1e9
            print(f"  direct: {td*1e3:7.2f} ms ({gf/td:7.0f} GF/s)")
            continue
        print(f"T={t} C={c} k={k} p={p}:")
        bench(batch, t, c, k, p)


if __name__ == "__main__":
    main()
