"""Score / conditioner network structural tests (UNIVERSE++ default config)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_universe_tpu.models import (
    ConditionerNetwork,
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    ScoreNetwork,
)

B, T = 2, 1600  # multiple of 160 (= prod(rate_factors))


def default_models():
    score = ScoreNetwork(
        rate_factors=(2, 4, 4, 5), n_channels=32, noise_cond_dim=512,
        extra_conv_block=True, use_weight_norm=True, use_antialiasing=True,
        time_embedding="simple",
    )
    cond = ConditionerNetwork(
        rate_factors=(2, 4, 4, 5), n_channels=32, n_mels=80,
        n_mel_oversample=4, encoder_gru_residual=True, extra_conv_block=True,
        use_weight_norm=True, use_antialiasing=False,
    )
    return score, cond


@pytest.fixture(scope="module")
def nets():
    score, cond = default_models()
    x = jnp.zeros((B, T, 1))
    cond_params = cond.init(jax.random.PRNGKey(0), x)
    conditions, y_est, h = cond.apply(cond_params, x)
    sigma = jnp.full((B,), 0.5)
    score_params = score.init(jax.random.PRNGKey(1), x, sigma, conditions)
    return score, cond, score_params, cond_params


def test_conditioner_shapes(nets):
    score, cond, score_params, cond_params = nets
    x = jnp.zeros((B, T, 1))
    conditions, y_est, h = cond.apply(cond_params, x)
    # 5 conditioning levels: latent + 4 upsampled (extra_conv_block=True)
    assert len(conditions) == 5
    shapes = [c.shape for c in conditions]
    assert shapes == [(B, 10, 512), (B, 50, 256), (B, 200, 128),
                      (B, 800, 64), (B, 1600, 32)]
    assert y_est.shape == (B, T, 32)  # output_channels=None keeps n_channels
    assert h.shape == (B, 10, 512)


def test_score_shapes(nets):
    score, cond, score_params, cond_params = nets
    x = jnp.zeros((B, T, 1))
    conditions, _, _ = cond.apply(cond_params, x)
    sigma = jnp.full((B,), 0.5)
    s = score.apply(score_params, x, sigma, conditions)
    assert s.shape == (B, T, 1)
    assert bool(jnp.all(jnp.isfinite(s)))


def test_score_jit_and_param_count(nets):
    score, cond, score_params, cond_params = nets

    n_score = sum(np.prod(p.shape) for p in
                  jax.tree_util.tree_leaves(score_params))
    n_cond = sum(np.prod(p.shape) for p in
                 jax.tree_util.tree_leaves(cond_params))
    # reference UNIVERSE++ is ~100M total; sanity band
    assert 10e6 < n_score < 200e6
    assert 10e6 < n_cond < 200e6

    @jax.jit
    def fwd(sp, cp, x, sigma):
        conditions, y_est, _ = cond.apply(cp, x)
        return score.apply(sp, x, sigma, conditions)

    x = jnp.zeros((B, T, 1))
    s = fwd(score_params, cond_params, x, jnp.full((B,), 0.1))
    assert s.shape == (B, T, 1)


def test_sigma_conditioning_changes_output():
    # NOTE: with time_embedding="simple" the embedding is sigma-independent
    # at init (zero weights, reference sigma_block.py:69-70), so use RFF here
    score = ScoreNetwork(rate_factors=(2, 4), n_channels=4, noise_cond_dim=32,
                         n_rff=8, time_embedding="rff")
    cond = ConditionerNetwork(rate_factors=(2, 4), n_channels=4, n_mels=8,
                              n_mel_oversample=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 80, 1))
    cp = cond.init(jax.random.PRNGKey(0), x)
    conditions, _, _ = cond.apply(cp, x)
    sp = score.init(jax.random.PRNGKey(1), x, jnp.asarray([0.5]), conditions)
    s1 = score.apply(sp, x, jnp.asarray([0.001]), conditions)
    s2 = score.apply(sp, x, jnp.asarray([5.0]), conditions)
    assert float(jnp.abs(s1 - s2).max()) > 1e-6


@pytest.mark.slow
def test_discriminators():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2000, 1))
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 2000, 1))
    mpd = MultiPeriodDiscriminator(channel_mult=1)
    p = mpd.init(jax.random.PRNGKey(2), x, y)
    rs, gs, fr, fg = mpd.apply(p, x, y)
    assert len(rs) == len(gs) == 5
    assert len(fr[0]) == 6  # 5 conv fmaps + post

    mrd = MultiResolutionDiscriminator()
    p2 = mrd.init(jax.random.PRNGKey(3), x, y)
    rs2, gs2, fr2, fg2 = mrd.apply(p2, x, y)
    assert len(rs2) == 3
    assert len(fr2[0]) == 6


def test_discriminator_paired_batch_exact():
    """The concat-real+fake single pass must equal separate passes
    (the split in _apply_paired is pure batch indexing)."""
    from open_universe_tpu.models.bigvgan import (
        MultiPeriodDiscriminator,
        MultiResolutionDiscriminator,
    )
    y = jax.random.normal(jax.random.PRNGKey(0), (2, 400, 1)) * 0.1
    yh = jax.random.normal(jax.random.PRNGKey(1), (2, 400, 1)) * 0.1
    for d in (MultiPeriodDiscriminator(periods=(2, 3)),
              MultiResolutionDiscriminator(resolutions=((64, 16, 32),))):
        p = d.init(jax.random.PRNGKey(2), y, yh)
        r, g, fr, fg = d.apply(p, y, yh)
        # real outputs must not depend on what rides in the fake half
        r2, g2, fr2, fg2 = d.apply(p, y, y)  # fake half := real input
        for a, b in zip(r, r2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        for a, b in zip(g2, r2):  # identical halves -> identical outputs
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        r3, g3, fr3, _ = d.apply(p, yh, yh)
        for a, b in zip(g, r3):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        for fa, fb in zip(fg[0], fr3[0]):  # fmaps split the same way
            np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                       rtol=1e-6, atol=1e-7)


def test_hoisted_signal_cond_projection(nets):
    """project_cond + cond_projected=True == inline projection (the
    sampler-loop hoist in UniverseModel.enhance must be a no-op math-wise)."""
    score, cond, score_params, cond_params = nets
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, 1)) * 0.1
    conditions, *_ = cond.apply(cond_params, x)
    sigma = jnp.full((B,), 0.3)
    s_ref = score.apply(score_params, x, sigma, conditions)
    proj = score.apply(score_params, conditions, method="project_cond")
    assert len(proj) == len(conditions)
    s_new = score.apply(score_params, x, sigma, proj, cond_projected=True)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_new),
                               rtol=1e-5, atol=1e-6)


def test_fold_signal_cond_exact():
    """set_fold_signal_cond folds the decoder's per-level 1x1 signal-cond
    projection into conv1 as a channel-concat conv (PERF.md lever). Must
    be numerically equivalent to the unfused path on the same params."""
    import jax
    import jax.numpy as jnp

    from open_universe_tpu.models.universe.blocks import (
        set_fold_signal_cond,
    )
    from open_universe_tpu.runtime import build_model

    model = build_model({"fs": 16000, "n_channels": 8, "noise_cond_dim": 64,
                         "n_rff": 8, "n_mels": 16})
    params = model.init(jax.random.PRNGKey(0), example_len=1600)
    mix = jax.random.normal(jax.random.PRNGKey(1), (2, 1600, 1)) * 0.1
    x_t = jax.random.normal(jax.random.PRNGKey(2), (2, 1600, 1))
    sigma = jnp.asarray([0.3, 1.1])
    cond, _aux, _ = model.apply_cond(params, mix)

    ref = model.score_fn(params)(x_t, sigma, cond)
    set_fold_signal_cond(True)
    try:
        out = model.score_fn(params)(x_t, sigma, cond)
    finally:
        set_fold_signal_cond(False)
    assert jnp.max(jnp.abs(out - ref)) < 1e-4, float(
        jnp.max(jnp.abs(out - ref)))
