"""Text-conditioning stack tests: tokenizer, encoder, conditioner,
guided attention, text GAN trainer."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_universe_tpu.diffusion import DiffusionConfig
from open_universe_tpu.losses.guided_attention import (
    coverage_loss,
    guided_attention_loss,
)
from open_universe_tpu.models.universe.model import UniverseConfig
from open_universe_tpu.models.universe.model_text import (
    TextConfig,
    TextUniverseModel,
)
from open_universe_tpu.text import CharTokenizer, TextEncoder
from open_universe_tpu.text.conditioner import downsample_pad_mask, rope

T = 160
TINY = UniverseConfig(
    fs=800, rate_factors=(2, 4), n_channels=4, noise_cond_dim=32, n_rff=8,
    n_mels=8, extra_conv_block=True, use_weight_norm=True,
    time_embedding="simple", diffusion=DiffusionConfig(n_steps=4),
)
TXT = TextConfig(vocab_size=CharTokenizer(max_len=16).vocab_size, text_hidden=32, text_layers=1,
                 film_global_dim=64, cross_attention_dim=64,
                 cross_attention_num_heads=2, text_max_len=16)


def test_tokenizer():
    tok = CharTokenizer(max_len=16)
    ids, mask = tok(["hello world", ""])
    assert ids.shape == (2, 16)
    assert mask.shape == (2, 16)
    assert not mask[0, :11].any()  # "hello world" = 11 chars valid
    assert mask[0, 11:].all()
    assert mask[1].all()  # empty text all pad


def test_text_encoder_shapes():
    enc = TextEncoder(vocab_size=40, hidden=32, n_layers=1, global_dim=64,
                      seq_dim=48, max_len=16)
    ids = jnp.zeros((2, 16), jnp.int32).at[0, :5].set(3)
    mask = ids == 0
    p = enc.init(jax.random.PRNGKey(0), ids, mask)
    g, s, m = enc.apply(p, ids, mask)
    assert g.shape == (2, 64)
    assert s.shape == (2, 16, 48)


def test_rope_properties():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16))
    y = rope(x)
    assert y.shape == x.shape
    # norms preserved per position (rotation)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1), rtol=1e-4)


def test_downsample_pad_mask():
    m = jnp.asarray([[False] * 6 + [True] * 4])
    d = downsample_pad_mask(m, 2)
    np.testing.assert_array_equal(np.asarray(d),
                                  [[False, False, False, True, True]])


def test_guided_attention_prefers_diagonal():
    q, s = 20, 10
    diag = np.zeros((1, q, s), np.float32)
    for i in range(q):
        diag[0, i, min(int(i * s / q), s - 1)] = 1.0
    anti = diag[:, ::-1, :].copy()
    valid_q = jnp.ones((1, q), bool)
    valid_s = jnp.ones((1, s), bool)
    l_diag = float(guided_attention_loss(jnp.asarray(diag), valid_q, valid_s))
    l_anti = float(guided_attention_loss(jnp.asarray(anti), valid_q, valid_s))
    assert l_diag < l_anti


def test_coverage_loss():
    # uniform attention: each of S tokens gets Q/S total -> |Q/S - 1|
    attn = jnp.full((1, 10, 10), 0.1)
    v = jnp.ones((1, 10), bool)
    assert abs(float(coverage_loss(attn, v)) - 0.0) < 1e-5


@pytest.fixture(scope="module")
def text_model():
    model = TextUniverseModel(TINY, TXT)
    params = model.init(jax.random.PRNGKey(0), example_len=T, batch=2)
    return model, params


def test_text_cond_forward(text_model):
    model, params = text_model
    tok = CharTokenizer(max_len=16)
    ids, mask = tok(["hello", "abc def"])
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, T, 1))
    cond, y, h, info = model.apply_cond_with_info(
        params, x, text=(jnp.asarray(ids), jnp.asarray(mask)))
    assert info["attn_map"].shape == (2, 20, 16)  # latent frames x tokens
    assert y.shape == (2, T, 4)
    # no-text path also works with same params
    cond2, y2, h2, info2 = model.apply_cond_with_info(params, x)
    assert info2["attn_map"] is None


def test_text_changes_conditioning(text_model):
    model, params = text_model
    tok = CharTokenizer(max_len=16)
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (1, T, 1))
    ids1, m1 = tok(["aaaa"])
    ids2, m2 = tok(["zzzz zzzz zzz"])
    _, y1, _, _ = model.apply_cond_with_info(
        params, x, text=(jnp.asarray(ids1), jnp.asarray(m1)))
    _, y2, _, _ = model.apply_cond_with_info(
        params, x, text=(jnp.asarray(ids2), jnp.asarray(m2)))
    assert float(jnp.abs(y1 - y2).max()) > 1e-7


@pytest.mark.slow
def test_text_gan_trainer(text_model):
    from open_universe_tpu.training.text_gan_trainer import (
        TextGanTrainConfig,
        TextGanTrainer,
    )

    model, _ = text_model
    cfg = TextGanTrainConfig(
        mpd_periods=(2, 3), mrd_resolutions=((64, 16, 32),),
        t_warmup=10, t_cosine=50, t_max=100, weight_coverage=0.1,
        weight_head_diversity=0.01)
    trainer = TextGanTrainer(model, cfg)
    state = trainer.init(jax.random.PRNGKey(0), example_len=T, batch=2)
    tok = CharTokenizer(max_len=16)
    ids, mask = tok(["hello", "world!"])
    batch = {
        "mix": 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, T, 1)),
        "target": 0.1 * jax.random.normal(jax.random.PRNGKey(2), (2, T, 1)),
        "text_ids": jnp.asarray(ids),
        "text_mask": jnp.asarray(mask),
    }
    step = jax.jit(trainer.train_step)
    state, m = step(state, batch, jax.random.PRNGKey(3))
    for k, v in m.items():
        assert bool(jnp.isfinite(v)), k
    assert "train/ga" in m and "train/coverage" in m

    # no-text fallback path
    state, m2 = jax.jit(trainer.train_step)(
        state, (batch["mix"], batch["target"]), jax.random.PRNGKey(4))
    assert "train/ga" not in m2
    assert int(state.step) == 2
