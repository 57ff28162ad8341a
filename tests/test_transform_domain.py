"""Spectrogram-domain diffusion (transform plumbing).

Parity target: reference ``Universe(transform=...)`` (universe.py:112-115,
274-276, 345-346, 482-488) and ``UniverseGAN`` (universe_gan.py:180-201)
with ``CompressedMagSTFT`` — diffusion runs on compressed complex STFT
frames and the result is inverse-transformed to a waveform. The reference
ships this plumbing unused (default IdentityTransform); here it is wired
and exercised end to end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_universe_tpu.models.universe.model import (
    TransformConfig,
    UniverseConfig,
    UniverseModel,
)
from open_universe_tpu.diffusion.schedule import DiffusionConfig

FS = 800
N_FFT = 32
IC = 2 * (N_FFT // 2 + 1)  # 34 channels, hop == IC aligns mel/latent rates
T = (4 * IC) * 8           # samples; mel hop = tot_ds * IC = 136


def tiny_cfg(**kw):
    base = dict(
        fs=FS, rate_factors=(2, 2), n_channels=4, n_rff=8,
        noise_cond_dim=32, n_mels=8, n_mel_oversample=4,
        extra_conv_block=False, use_weight_norm=False,
        time_embedding="simple", input_channels=IC, output_channels=IC,
        diffusion=DiffusionConfig(n_steps=4),
        transform=TransformConfig(n_fft=N_FFT, hop_length=IC))
    base.update(kw)
    return UniverseConfig(**base)


@pytest.fixture(scope="module")
def spec_model_and_params():
    model = UniverseModel(tiny_cfg())
    params = model.init(jax.random.PRNGKey(0), example_len=T, batch=1)
    return model, params


def test_transform_channel_check():
    with pytest.raises(ValueError):
        UniverseModel(tiny_cfg(input_channels=7))


def test_diffusion_len():
    model = UniverseModel(tiny_cfg())
    nf = model.transform.n_frames(T)
    assert nf == 1 + T // IC
    assert model.diffusion_len(T) % model.tot_ds == 0
    assert model.diffusion_len(T) >= nf


def test_spectral_enhance(spec_model_and_params):
    model, params = spec_model_and_params
    mix = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, T))
    out = jax.jit(lambda p, m, k: model.enhance(p, m, k))(
        params, mix, jax.random.PRNGKey(2))
    assert out.shape == (2, T)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_spectral_enhance_oracle_recovers_target(spec_model_and_params):
    """Oracle mode (fake score) must work in the transformed domain: with
    a high-SNR fake score the sampler should land near the transformed
    target, i.e. the inverse-transformed output correlates strongly with
    the (normalized) target waveform."""
    model, params = spec_model_and_params
    t = jnp.linspace(0.0, T / FS, T)
    target = (0.1 * jnp.sin(2 * jnp.pi * 50.0 * t))[None]
    mix = target + 0.02 * jax.random.normal(jax.random.PRNGKey(3), (1, T))
    out = model.enhance(params, mix, jax.random.PRNGKey(4),
                        target=target[..., None], fake_score_snr=40.0)
    out = np.asarray(out)[0]
    ref = np.asarray(target)[0]
    corr = np.dot(out, ref) / (np.linalg.norm(out) * np.linalg.norm(ref))
    assert corr > 0.9


def test_spectral_aux_signal(spec_model_and_params):
    model, params = spec_model_and_params
    mix = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (1, T))
    out = model.enhance(params, mix, jax.random.PRNGKey(6),
                        use_aux_signal=True)
    assert out.shape == (1, T)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_spectral_gan_train_step():
    from open_universe_tpu.training.gan_trainer import (
        GanTrainConfig,
        GanTrainer,
    )

    model = UniverseModel(tiny_cfg())
    trainer = GanTrainer(model, GanTrainConfig(
        mpd_periods=(2,), mrd_resolutions=((64, 16, 32),),
        t_warmup=10, t_cosine=20, t_max=40))
    state = trainer.init(jax.random.PRNGKey(0), example_len=T, batch=2)
    mix = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, T, 1))
    target = 0.9 * mix
    state2, metrics = jax.jit(trainer.train_step)(
        state, (mix, target), jax.random.PRNGKey(2))
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), k
    # params actually moved
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            state.gen_params, state2.gen_params))
    assert diff > 0

    # per-sigma-bin validation losses in the transformed domain
    losses, _ = trainer.val_score_losses(state2, (mix, target),
                                         jax.random.PRNGKey(3), n_bins=2)
    assert bool(jnp.all(jnp.isfinite(losses)))


def test_spectral_mdn_train_step():
    from open_universe_tpu.training.universe_trainer import (
        MdnTrainConfig,
        MdnTrainer,
    )

    model = UniverseModel(tiny_cfg(use_signal_decoupling=False, edm=None))
    trainer = MdnTrainer(model, MdnTrainConfig(
        audio_len_s=T / FS, t_warmup=10, t_cosine=20, t_max=40))
    state = trainer.init(jax.random.PRNGKey(0), batch=2)
    mix = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, T, 1))
    target = 0.9 * mix
    state2, metrics = jax.jit(trainer.train_step)(
        state, (mix, target), jax.random.PRNGKey(2))
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), k
