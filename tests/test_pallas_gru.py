"""Pallas fused GRU kernel vs the lax.scan reference (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from open_universe_tpu.ops.gru import GRU, set_use_pallas_gru
from open_universe_tpu.ops.pallas_gru import pallas_bigru_sequence


def _scan_ref(xp, whh, bhh):
    t, b2, h3 = xp.shape
    h = h3 // 3
    b = b2 // 2

    def step(hc, inp):
        h2 = hc.reshape(2, b, h)
        gh = jnp.einsum("dbh,dhg->dbg", h2, whh) + bhh[:, None, :]
        gh = gh.reshape(b2, h3)
        hr, hz, hn = jnp.split(gh, 3, -1)
        xr, xz, xn = jnp.split(inp, 3, -1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1 - z) * n + z * hc, (1 - z) * n + z * hc

    _, ys = jax.lax.scan(step, jnp.zeros((b2, h)), xp)
    return ys


def test_pallas_gru_matches_scan():
    rng = np.random.default_rng(0)
    t, b2, h = 12, 4, 8
    xp = jnp.asarray(rng.standard_normal((t, b2, 3 * h)), jnp.float32)
    whh = jnp.asarray(rng.standard_normal((2, h, 3 * h)) * 0.1, jnp.float32)
    bhh = jnp.asarray(rng.standard_normal((2, 3 * h)) * 0.1, jnp.float32)
    ref = _scan_ref(xp, whh, bhh)
    out = pallas_bigru_sequence(xp, whh, bhh, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_gru_module_pallas_toggle():
    """GRU module output identical with the pallas path (interpret on CPU
    isn't wired through the module; just verify the toggle plumbing runs
    the scan path deterministically)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 6))
    m = GRU(hidden_size=4)
    p = m.init(jax.random.PRNGKey(1), x)
    y1 = m.apply(p, x)
    # pallas path requires a TPU; on CPU the interpret flag isn't set by
    # the module, so keep the toggle off here and just check determinism
    set_use_pallas_gru(False)
    y2 = m.apply(p, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
