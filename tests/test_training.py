"""Training step tests: GAN two-optimizer step + MDN step (tiny configs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_universe_tpu.diffusion import DiffusionConfig, EDMConfig
from open_universe_tpu.models.universe.model import UniverseConfig, UniverseModel
from open_universe_tpu.training import (
    GanTrainConfig,
    GanTrainer,
    MdnTrainConfig,
    MdnTrainer,
)

T = 160  # samples; tot_ds = 8 with rate_factors (2, 4)

TINY_MODEL = UniverseConfig(
    fs=800, rate_factors=(2, 4), n_channels=4, noise_cond_dim=32, n_rff=8,
    n_mels=8, n_mel_oversample=4, extra_conv_block=True, use_weight_norm=True,
    time_embedding="simple", diffusion=DiffusionConfig(n_steps=4),
    edm=EDMConfig(),
)

TINY_GAN = GanTrainConfig(
    mpd_periods=(2, 3), mrd_resolutions=((64, 16, 32), (128, 32, 64)),
    t_warmup=10, t_cosine=50, t_max=100,
)


def _batch(key, b=2):
    k1, k2 = jax.random.split(key)
    clean = 0.1 * jax.random.normal(k1, (b, T, 1))
    noise = 0.05 * jax.random.normal(k2, (b, T, 1))
    return clean + noise, clean


@pytest.fixture(scope="module")
def gan_setup():
    model = UniverseModel(TINY_MODEL)
    trainer = GanTrainer(model, TINY_GAN)
    state = trainer.init(jax.random.PRNGKey(0), example_len=T, batch=2)
    return trainer, state


def test_gan_train_step(gan_setup):
    trainer, state = gan_setup
    mix, clean = _batch(jax.random.PRNGKey(1))
    step = jax.jit(trainer.train_step)
    new_state, metrics = step(state, (mix, clean), jax.random.PRNGKey(2))
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), k
    assert int(new_state.step) == 1
    # params must have moved
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               state.gen_params, new_state.gen_params)
    assert max(jax.tree_util.tree_leaves(d)) > 0
    dd = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                state.disc_params, new_state.disc_params)
    assert max(jax.tree_util.tree_leaves(dd)) > 0
    # EMA close to params early on (ramped decay)
    assert int(new_state.ema.num_updates) == 1


def test_gan_disc_freeze(gan_setup):
    trainer, state = gan_setup
    frozen_trainer = GanTrainer(trainer.model,
                                TINY_GAN.__class__(**{
                                    **TINY_GAN.__dict__,
                                    "disc_freeze_step": 100}))
    mix, clean = _batch(jax.random.PRNGKey(3))
    new_state, metrics = jax.jit(frozen_trainer.train_step)(
        state, (mix, clean), jax.random.PRNGKey(4))
    dd = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                state.disc_params, new_state.disc_params)
    assert max(jax.tree_util.tree_leaves(dd)) == 0.0  # disc frozen
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               state.gen_params, new_state.gen_params)
    assert max(jax.tree_util.tree_leaves(d)) > 0  # gen still trains


@pytest.mark.slow
def test_gan_loss_decreases(gan_setup):
    """A few steps on a fixed batch should reduce the generator loss."""
    trainer, state = gan_setup
    mix, clean = _batch(jax.random.PRNGKey(5))
    step = jax.jit(trainer.train_step)
    losses = []
    for i in range(8):
        state, metrics = step(state, (mix, clean), jax.random.PRNGKey(10))
        losses.append(float(metrics["train/signal_mel"]))
    # mel reconstruction of the aux head should improve on a fixed batch
    assert losses[-1] < losses[0], losses


def test_mdn_train_step():
    model = UniverseModel(TINY_MODEL)
    cfg = MdnTrainConfig(audio_len_s=T / TINY_MODEL.fs, t_warmup=10,
                         t_cosine=11, t_max=100)
    trainer = MdnTrainer(model, cfg)
    state = trainer.init(jax.random.PRNGKey(0), batch=2)
    mix, clean = _batch(jax.random.PRNGKey(1))
    step = jax.jit(trainer.train_step)
    losses = []
    for i in range(5):
        state, metrics = step(state, (mix, clean), jax.random.PRNGKey(7))
        for k, v in metrics.items():
            assert bool(jnp.isfinite(v)), (k, float(v))
        losses.append(float(metrics["train/loss"]))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_gan_grad_accumulation(gan_setup):
    """accumulate_grad_batches=2: no param change after step 1, change
    after step 2 (reference accumulate_grad_batches,
    config/model/default.yaml:83)."""
    trainer, _ = gan_setup
    acc_trainer = GanTrainer(trainer.model, GanTrainConfig(**{
        **TINY_GAN.__dict__, "accumulate_grad_batches": 2}))
    state = acc_trainer.init(jax.random.PRNGKey(0), example_len=T, batch=2)
    mix, clean = _batch(jax.random.PRNGKey(11))
    step = jax.jit(acc_trainer.train_step)
    s1, m1 = step(state, (mix, clean), jax.random.PRNGKey(12))
    d1 = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                state.gen_params, s1.gen_params)
    assert max(jax.tree_util.tree_leaves(d1)) == 0.0  # accumulating
    s2, m2 = step(s1, (mix, clean), jax.random.PRNGKey(13))
    d2 = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                state.gen_params, s2.gen_params)
    assert max(jax.tree_util.tree_leaves(d2)) > 0  # applied
    dd = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                state.disc_params, s2.disc_params)
    assert max(jax.tree_util.tree_leaves(dd)) > 0
    for k, v in m2.items():
        assert bool(jnp.isfinite(v)), k


@pytest.mark.slow
def test_gan_remat_matches(gan_setup):
    """remat=True recomputes the generator forward in the pullback —
    results must be bit-compatible with the residual-saving path."""
    trainer, state = gan_setup
    remat_trainer = GanTrainer(trainer.model, GanTrainConfig(**{
        **TINY_GAN.__dict__, "remat": True}))
    mix, clean = _batch(jax.random.PRNGKey(14))
    key = jax.random.PRNGKey(15)
    disc_remat_trainer = GanTrainer(trainer.model, GanTrainConfig(**{
        **TINY_GAN.__dict__, "remat": True, "remat_disc": True}))
    s_ref, m_ref = jax.jit(trainer.train_step)(state, (mix, clean), key)
    for other in (remat_trainer, disc_remat_trainer):
        s_new, m_new = jax.jit(other.train_step)(state, (mix, clean), key)
        for k in m_ref:
            np.testing.assert_allclose(float(m_ref[k]), float(m_new[k]),
                                       rtol=1e-4, atol=1e-6, err_msg=k)
        a = jax.tree_util.tree_leaves(s_ref.gen_params)
        b = jax.tree_util.tree_leaves(s_new.gen_params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-5)
        d = jax.tree_util.tree_leaves(s_ref.disc_params)
        e = jax.tree_util.tree_leaves(s_new.disc_params)
        for x, y in zip(d, e):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_mdn_accum_and_remat():
    model = UniverseModel(TINY_MODEL)
    base = dict(audio_len_s=T / TINY_MODEL.fs, t_warmup=10, t_cosine=11,
                t_max=100)
    mix, clean = _batch(jax.random.PRNGKey(16))
    key = jax.random.PRNGKey(17)

    tr = MdnTrainer(model, MdnTrainConfig(**base))
    st = tr.init(jax.random.PRNGKey(0), batch=2)
    _, m_ref = jax.jit(tr.train_step)(st, (mix, clean), key)

    tr_r = MdnTrainer(model, MdnTrainConfig(remat=True, **base))
    _, m_new = jax.jit(tr_r.train_step)(st, (mix, clean), key)
    np.testing.assert_allclose(float(m_ref["train/loss"]),
                               float(m_new["train/loss"]), rtol=1e-5)

    tr_a = MdnTrainer(model, MdnTrainConfig(accumulate_grad_batches=2, **base))
    st_a = tr_a.init(jax.random.PRNGKey(0), batch=2)
    s1, _ = jax.jit(tr_a.train_step)(st_a, (mix, clean), key)
    d1 = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                st_a.params, s1.params)
    assert max(jax.tree_util.tree_leaves(d1)) == 0.0
    s2, _ = jax.jit(tr_a.train_step)(s1, (mix, clean), key)
    d2 = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                st_a.params, s2.params)
    assert max(jax.tree_util.tree_leaves(d2)) > 0


def test_gan_val_score_losses(gan_setup):
    trainer, state = gan_setup
    mix, clean = _batch(jax.random.PRNGKey(8))
    losses, bins = trainer.val_score_losses(state, (mix, clean),
                                            jax.random.PRNGKey(9), n_bins=3)
    assert losses.shape == (3,)
    assert bool(jnp.all(jnp.isfinite(losses)))


def test_adaptive_sigma_sampling_feedback():
    """time_sampling='adaptive': pr_cum carried in state, updated from
    per-bin val losses, and the sampler concentrates where losses are
    high (reference adapt_time_sampling, universe.py:391-412, 630-638)."""
    from open_universe_tpu.diffusion.sigma_sampling import (
        adaptive_pr_cum,
        sample_sigma,
    )

    # reference update semantics: clamp, normalized cumsum, last 1+1e-5
    pr = adaptive_pr_cum(jnp.array([1.0, 1.0, 2.0, 0.0]))
    np.testing.assert_allclose(np.asarray(pr[:-1]),
                               [0.0, 0.25, 0.5, 0.99987],
                               rtol=1e-3, atol=1e-4)
    assert float(pr[-1]) > 1.0

    # heavy mass in bin 2 of 4 -> times mostly in [0.5, 0.75)
    pr_skew = adaptive_pr_cum(jnp.array([1e-9, 1e-9, 1.0, 1e-9]))
    bins = jnp.linspace(0.0, 1.0, 5)
    model = UniverseModel(TINY_MODEL)
    _, time = sample_sigma(jax.random.PRNGKey(0), 512,
                           model.cfg.diffusion, "adaptive",
                           adaptive_pr_cum=pr_skew, adaptive_bins=bins)
    frac = float(jnp.mean((time >= 0.5) & (time < 0.75)))
    assert frac > 0.98, frac

    # trainer carries + updates the distribution
    trainer = GanTrainer(model, GanTrainConfig(**{
        **TINY_GAN.__dict__, "time_sampling": "adaptive",
        "adaptive_n_bins": 4}))
    state = trainer.init(jax.random.PRNGKey(0), example_len=T, batch=2)
    assert state.sigma_pr_cum is not None
    mix, clean = _batch(jax.random.PRNGKey(20))
    state2, metrics = jax.jit(trainer.train_step)(
        state, (mix, clean), jax.random.PRNGKey(21))
    assert bool(jnp.isfinite(metrics["train/loss_gen"]))
    state3 = trainer.update_adaptive_sampling(
        state2, np.array([0.1, 0.9, 0.2, 0.05]))
    assert float(jnp.abs(state3.sigma_pr_cum
                         - state2.sigma_pr_cum).max()) > 0
    # next step runs with the refreshed distribution (same jit cache)
    state4, m4 = jax.jit(trainer.train_step)(
        state3, (mix, clean), jax.random.PRNGKey(22))
    assert bool(jnp.isfinite(m4["train/loss_gen"]))


def test_best_checkpoint_roundtrip(gan_setup, tmp_path):
    """save_best_checkpoint keeps only improvements; restore(step='best')
    loads it (reference ModelCheckpoint save_top_k=1 semantics)."""
    from open_universe_tpu.training.checkpoint import (
        restore_checkpoint,
        save_best_checkpoint,
    )

    trainer, state = gan_setup
    host = jax.device_get(state)
    assert save_best_checkpoint(tmp_path, 10, host, 0.5)
    assert not save_best_checkpoint(tmp_path, 20, host, 0.7)  # worse
    mix, clean = _batch(jax.random.PRNGKey(30))
    s2, _ = jax.jit(trainer.train_step)(state, (mix, clean),
                                        jax.random.PRNGKey(31))
    assert save_best_checkpoint(tmp_path, 30, jax.device_get(s2), 0.2)
    restored, step = restore_checkpoint(tmp_path, state, step="best")
    assert step == 30
    a = jax.tree_util.tree_leaves(restored.gen_params)
    b = jax.tree_util.tree_leaves(s2.gen_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_lr_schedule_clamps_past_t_max():
    """Past t_max the schedule must hold at eta_min — the unclamped
    cosine silently CYCLED the lr back toward base_lr in the round-4
    quality run (observed: lr 0 -> 1e-4 between batches 15000-17500
    after the schedule horizon had been exhausted)."""
    from open_universe_tpu.training.schedules import (
        linear_warmup_cosine_annealing,
    )

    sched = linear_warmup_cosine_annealing(
        2e-4, t_warmup=10, t_cosine=50, t_max=100, eta_min=1e-6)
    assert float(sched(100)) == pytest.approx(1e-6, rel=1e-3)
    for step in (101, 150, 200, 1000):
        assert float(sched(step)) == pytest.approx(1e-6, rel=1e-3), step
    # pre-t_max shape unchanged: plateau then anneal
    assert float(sched(30)) == pytest.approx(2e-4, rel=1e-5)
    assert float(sched(75)) < 2e-4


def test_gan_debug_grad_attribution(gan_setup):
    """debug_grads decomposes the generator gradient by loss family;
    the per-family cotangents are linear in the pullback, so their
    tree-sum must equal the total gradient."""
    _, state = gan_setup
    model = UniverseModel(TINY_MODEL)
    import dataclasses as _dc

    trainer = GanTrainer(model, _dc.replace(TINY_GAN, debug_grads=True))
    batch = _batch(jax.random.PRNGKey(3))
    _, metrics = jax.jit(trainer.train_step)(
        state, batch, jax.random.PRNGKey(4))
    for fam in ("score_mse", "mel_l1", "gan"):
        assert f"gdbg/cond_from_{fam}" in metrics
        assert np.isfinite(float(metrics[f"gdbg/cond_from_{fam}"]))
    # submodule norms + weight-magnitude diagnostics present
    assert any(k.startswith("gdbg/cond.") for k in metrics)
    assert any(k.startswith("pnorm/cond.") for k in metrics)
    # the score network receives no gradient from the waveform-domain
    # mel/GAN terms (y_est does not depend on the score net)
    assert float(metrics["gdbg/score_from_mel_l1"]) == pytest.approx(0.0)
    assert float(metrics["gdbg/score_from_gan"]) == pytest.approx(0.0)
    # attribution is exhaustive: families sum (in norm, via triangle
    # equality on the actual trees) to the logged total
    total = float(metrics["grad/cond"])
    assert total > 0


def test_gan_decoupling_clip(gan_setup):
    """grad/decoupling is logged, and grad_clip_decoupling caps the
    decoupling-head update without changing optimizer state structure
    (resume-safe: the clip transform is stateless)."""
    _, state = gan_setup
    model = UniverseModel(TINY_MODEL)
    import dataclasses as _dc

    trainer = GanTrainer(model,
                         _dc.replace(TINY_GAN, grad_clip_decoupling=1e-9))
    batch = _batch(jax.random.PRNGKey(5))
    new_state, metrics = jax.jit(trainer.train_step)(
        state, batch, jax.random.PRNGKey(6))
    assert "grad/decoupling" in metrics
    # with a ~zero clip the decoupling params move only by weight decay
    # of the lr-scaled update; the clipped grad contribution is ~0
    if "decoupling" in state.gen_params:
        before = state.gen_params["decoupling"]
        after = new_state.gen_params["decoupling"]
        for b, a in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after)):
            assert np.all(np.isfinite(np.asarray(a)))
    # optimizer state structure identical to the unclipped trainer's
    ref_trainer = GanTrainer(model, TINY_GAN)
    s0 = jax.tree_util.tree_structure(ref_trainer.gen_tx.init(
        state.gen_params))
    s1 = jax.tree_util.tree_structure(trainer.gen_tx.init(state.gen_params))
    assert s0 == s1
