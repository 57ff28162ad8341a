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


def test_gan_val_score_losses(gan_setup):
    trainer, state = gan_setup
    mix, clean = _batch(jax.random.PRNGKey(8))
    losses, bins = trainer.val_score_losses(state, (mix, clean),
                                            jax.random.PRNGKey(9), n_bins=3)
    assert losses.shape == (3,)
    assert bool(jnp.all(jnp.isfinite(losses)))
