"""Loss function tests (MDN NLL math, GAN losses, multires STFT)."""
import numpy as np
import jax
import jax.numpy as jnp

from open_universe_tpu.losses import (
    MixtureDensityNetworkLoss,
    MultiLoss,
    MultiResL1SpecLoss,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from open_universe_tpu.losses.mdn import mdn_nll, mdn_sample
from open_universe_tpu.losses.sisdr import si_sdr


def test_mdn_nll_prefers_correct_mean():
    b, k, c, t = 2, 3, 1, 32
    tgt = jnp.ones((b, c, t)) * 0.5
    sigma = jnp.ones((b, k, c, t)) * 0.1
    alpha = jnp.zeros((b, k, 1, 1))
    good = jnp.ones((b, k, c, t)) * 0.5
    bad = jnp.zeros((b, k, c, t))
    nll_good = mdn_nll(tgt, good, sigma, alpha)
    nll_bad = mdn_nll(tgt, bad, sigma, alpha)
    assert float(nll_good.mean()) < float(nll_bad.mean())


def test_mdn_nll_gaussian_value():
    """Single component, exact Gaussian NLL check."""
    b, c, t = 1, 1, 8
    tgt = jnp.zeros((b, c, t))
    mean = jnp.zeros((b, 1, c, t))
    sigma = jnp.ones((b, 1, c, t))
    alpha = jnp.zeros((b, 1, 1, 1))
    nll = float(mdn_nll(tgt, mean, sigma, alpha)[0])
    expected = 0.5 * np.log(2 * np.pi)  # per-element NLL of N(0,1) at 0
    np.testing.assert_allclose(nll, expected, rtol=1e-5)


def test_mdn_module():
    m = MixtureDensityNetworkLoss(est_channels=8, tgt_channels=1, n_comp=3,
                                  sample_len=64)
    est = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 8))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 1))
    p = m.init(jax.random.PRNGKey(2), est, tgt)
    loss = m.apply(p, est, tgt)
    assert loss.shape == ()
    assert bool(jnp.isfinite(loss))


def test_mdn_sample():
    """Parity target: reference mdn.py:127-157 (mixture sampling).

    - deterministic mode returns the argmax component's mean exactly
    - random mode concentrates on the dominant component: with one huge
      logit the draws must track that component's mean/sigma
    """
    b, k, c, t = 2, 3, 1, 64
    rng = jax.random.PRNGKey(0)
    mean = jnp.stack([jnp.full((b, c, t), v) for v in (-1.0, 0.0, 2.0)], 1)
    sigma = jnp.full((b, k, c, t), 0.01)
    # component 2 dominates at every time step
    alpha = jnp.array([0.0, 0.0, 20.0]).reshape(1, k, 1) * jnp.ones((b, 1, t))

    det = mdn_sample(rng, alpha, mean, sigma, random=False)
    np.testing.assert_allclose(np.asarray(det), 2.0, atol=1e-6)

    rnd = mdn_sample(rng, alpha, mean, sigma, random=True)
    assert rnd.shape == (b, c, t)
    np.testing.assert_allclose(np.asarray(rnd).mean(), 2.0, atol=0.05)

    # broadcast alpha (B, K, 1) over time also works
    rnd2 = mdn_sample(rng, jnp.array([0.0, 0.0, 20.0]).reshape(1, k, 1)
                      * jnp.ones((b, k, 1)), mean, sigma)
    np.testing.assert_allclose(np.asarray(rnd2).mean(), 2.0, atol=0.05)


def test_gan_losses():
    real = [jnp.ones((2, 10))]
    fake = [jnp.zeros((2, 10))]
    l, r, g = discriminator_loss(real, fake)
    np.testing.assert_allclose(float(l), 0.0, atol=1e-6)  # perfect disc
    l2, _ = generator_loss(fake)
    np.testing.assert_allclose(float(l2), 1.0, atol=1e-6)
    fm = feature_loss([[jnp.ones((2, 4))]], [[jnp.zeros((2, 4))]])
    np.testing.assert_allclose(float(fm), 2.0, atol=1e-6)


def test_multires_stft_loss():
    loss = MultiResL1SpecLoss(window_sz=(64, 128))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 512))
    assert float(loss(x, x)) < 1e-6
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    assert float(loss(x, y)) > 0.01


def test_multiloss():
    ml = MultiLoss({"a": (2.0, lambda yh, y: jnp.mean((yh - y) ** 2)),
                    "b": (1.0, lambda yh, y: jnp.mean(jnp.abs(yh - y)))})
    yh, y = jnp.ones((2, 4)), jnp.zeros((2, 4))
    total, d = ml(yh, y, with_dict=True)
    np.testing.assert_allclose(float(total), 3.0, atol=1e-6)
    assert set(d) == {"a", "b"}


def test_si_sdr():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 1000))
    # clean vs itself: very high; scaled copy: identical (scale invariant)
    v1 = si_sdr(x, x)
    assert float(v1.min()) > 50
    noisy = x + 0.1 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    v3 = si_sdr(noisy, x)
    assert 10 < float(v3.mean()) < 30
    # scale invariance at moderate SNR (eps floor dominates at extreme SNR)
    v4 = si_sdr(3.0 * noisy, x)
    np.testing.assert_allclose(np.asarray(v3), np.asarray(v4), atol=1e-3)


def test_ssl_feature_loss():
    """LMOS (ref wavlm_loss.py:8-76): w*MSE(phi) + L1(|STFT|)."""
    from open_universe_tpu.losses import SSLFeatureLoss

    # cheap stand-in feature fn: strided frame-energy features (B, F, D)
    def feat(wav):
        f = wav.reshape(wav.shape[0], -1, 80)
        return jnp.stack([f.mean(-1), f.std(-1), jnp.abs(f).mean(-1)], -1)

    loss = SSLFeatureLoss(feature_fn=feat, stft_n_fft=256, stft_hop=64,
                          feat_weight=100.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4000))
    assert float(loss(x, x)) < 1e-6
    y = x + 0.3 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    v = float(loss(y, x))
    assert v > 0.01
    # feat term carries the configured weight
    hi = SSLFeatureLoss(feature_fn=feat, stft_n_fft=256, stft_hop=64,
                        feat_weight=1000.0)
    assert float(hi(y, x)) > v
    # gradient flows to the estimate, jit-compatible
    g = jax.grad(lambda e: SSLFeatureLoss(
        feature_fn=feat, stft_n_fft=256, stft_hop=64)(e, x))(y)
    assert float(jnp.abs(g).max()) > 0
