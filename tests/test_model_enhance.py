"""End-to-end UniverseModel.enhance tests (tiny config, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_universe_tpu.diffusion import DiffusionConfig, EDMConfig
from open_universe_tpu.models.universe.model import (
    NormalizationConfig,
    UniverseConfig,
    UniverseModel,
)

TINY = UniverseConfig(
    rate_factors=(2, 4), n_channels=4, noise_cond_dim=32, n_rff=8,
    n_mels=8, n_mel_oversample=4, extra_conv_block=True,
    use_weight_norm=True, time_embedding="simple",
    diffusion=DiffusionConfig(n_steps=4),
)


@pytest.fixture(scope="module")
def model_and_params():
    model = UniverseModel(TINY)
    params = model.init(jax.random.PRNGKey(0), example_len=80)
    return model, params


def test_enhance_shapes(model_and_params):
    model, params = model_and_params
    key = jax.random.PRNGKey(1)
    # 1D input
    y = model.enhance(params, jnp.zeros((100,)), key)
    assert y.shape == (100,)
    # 2D input (batch)
    y = model.enhance(params, jnp.zeros((2, 100)), key)
    assert y.shape == (2, 100)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_enhance_jit(model_and_params):
    model, params = model_and_params

    @jax.jit
    def enh(p, m, k):
        return model.enhance(p, m, k)

    y = enh(params, jnp.zeros((2, 104)), jax.random.PRNGKey(2))
    assert y.shape == (2, 104)


def test_enhance_oracle_mode(model_and_params):
    """target + fake_score_snr replaces the network with the true score."""
    model, params = model_and_params
    rng = np.random.default_rng(0)
    clean = 0.05 * np.sin(2 * np.pi * 5 * np.linspace(0, 1, 160))
    noisy = clean + 0.02 * rng.standard_normal(160)
    mix = jnp.asarray(noisy, dtype=jnp.float32)[None, :, None]
    tgt = jnp.asarray(clean, dtype=jnp.float32)[None, :, None]
    out = model.enhance(params, mix, jax.random.PRNGKey(3), target=tgt,
                        fake_score_snr=40.0)
    # output approximates the *normalized* target; check correlation
    o = np.asarray(out[0, :, 0])
    t = np.asarray(tgt[0, :, 0])
    corr = np.corrcoef(o, t)[0, 1]
    assert corr > 0.99, corr


def test_enhance_ensemble(model_and_params):
    model, params = model_and_params
    for stat in ["mean", "median", "signal_median"]:
        y = model.enhance(params, jnp.zeros((1, 100)), jax.random.PRNGKey(4),
                          ensemble=3, ensemble_stat=stat)
        assert y.shape == (1, 100)


def test_enhance_aux_signal(model_and_params):
    model, params = model_and_params
    y = model.enhance(params, jnp.zeros((1, 100)), jax.random.PRNGKey(5),
                      use_aux_signal=True)
    assert y.shape == (1, 100)


def test_pad_unpad_inverse(model_and_params):
    model, params = model_and_params
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 100, 1)),
                    dtype=jnp.float32)
    xp, pad = model.pad(x)
    assert xp.shape[-2] % model.tot_ds == 0
    xr = model.unpad(xp, pad)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x))


def test_normalize_denormalize_property():
    """denormalize(normalize(x)) == x for every norm mode/ref (property
    test over random batches; reference utils/norm.py:31-91 semantics)."""
    from open_universe_tpu.utils.norm import (
        denormalize_batch,
        normalize_batch,
    )

    rng = np.random.default_rng(0)
    for trial in range(5):
        b = int(rng.integers(1, 4))
        t = int(rng.integers(64, 257))
        scale = 10.0 ** rng.uniform(-3, 2)
        mix = jnp.asarray(
            rng.standard_normal((b, t, 1)) * scale + rng.uniform(-1, 1))
        tgt = jnp.asarray(rng.standard_normal((b, t, 1)) * scale * 0.5)
        for norm in (2, "max", "2-max"):
            for ref in ("noisy", "both"):
                (mx, tg), mean, inv_gain = normalize_batch(
                    (mix, tgt), norm=norm, level_db=-26.0, ref=ref)
                rec = denormalize_batch(mx, mean, inv_gain)
                np.testing.assert_allclose(np.asarray(rec), np.asarray(mix),
                                           rtol=1e-4, atol=1e-5 * scale)
                # normalized mix is zero-mean and hits the target level
                m = np.asarray(mx)
                assert abs(m.mean()) < 1e-3
                if norm in (2, "2"):
                    # unbiased std (torch semantics, utils/norm.py)
                    np.testing.assert_allclose(
                        m.std(axis=(1, 2), ddof=1), 10 ** (-26 / 20),
                        rtol=1e-3)
                if ref == "noisy":
                    # target shares the mix statistics -> mix-target
                    # alignment is preserved exactly up to the gain
                    rec_t = denormalize_batch(tg, mean, inv_gain)
                    np.testing.assert_allclose(np.asarray(rec_t),
                                               np.asarray(tgt),
                                               rtol=1e-4, atol=1e-5 * scale)
