"""LoRA adapters/trainer, predictive trainer, and transforms tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_universe_tpu.diffusion import DiffusionConfig, EDMConfig
from open_universe_tpu.lora import (
    apply_lora,
    combine_params,
    fold_weight_norm,
    init_lora,
    merge_lora,
    partition_trainable,
)
from open_universe_tpu.models.universe.model import UniverseConfig, UniverseModel

T = 160

TINY = UniverseConfig(
    fs=800, rate_factors=(2, 4), n_channels=4, noise_cond_dim=32, n_rff=8,
    n_mels=8, extra_conv_block=True, use_weight_norm=True,
    time_embedding="simple", diffusion=DiffusionConfig(n_steps=4),
)


def test_fold_weight_norm_preserves_function():
    model = UniverseModel(TINY)
    params = model.init(jax.random.PRNGKey(0), example_len=T)
    folded = fold_weight_norm(params)

    import dataclasses
    model_nown = UniverseModel(dataclasses.replace(TINY,
                                                   use_weight_norm=False))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, 1)) * 0.1
    c1, y1, _ = model.apply_cond(params, x)
    c2, y2, _ = model_nown.apply_cond(folded, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-5)


def test_lora_zero_delta_at_init():
    model = UniverseModel(TINY)
    params = fold_weight_norm(model.init(jax.random.PRNGKey(0),
                                         example_len=T))
    lora = init_lora(jax.random.PRNGKey(1), params, rank=2)
    assert len(lora) > 0
    merged = apply_lora(params, lora, rank=2)
    # a == 0 at init -> no change
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               params, merged)
    assert max(jax.tree_util.tree_leaves(d)) == 0.0


def test_lora_nonzero_after_update():
    model = UniverseModel(TINY)
    params = fold_weight_norm(model.init(jax.random.PRNGKey(0),
                                         example_len=T))
    lora = init_lora(jax.random.PRNGKey(1), params, rank=2)
    # set a != 0
    for k in lora:
        lora[k]["a"] = jnp.ones_like(lora[k]["a"])
    merged = merge_lora(params, lora, rank=2)
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               params, merged)
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_partition_combine_roundtrip():
    model = UniverseModel(TINY)
    params = fold_weight_norm(model.init(jax.random.PRNGKey(0),
                                         example_len=T))
    train, frozen = partition_trainable(params)
    back = combine_params(train, frozen)
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               params, back)
    assert max(jax.tree_util.tree_leaves(d)) == 0.0
    # some biases must be trainable
    n_train = sum(x is not None and hasattr(x, "shape")
                  for x in jax.tree_util.tree_leaves(
                      train, is_leaf=lambda x: x is None) if x is not None)
    assert n_train > 0


def test_lora_trainer_step():
    from open_universe_tpu.losses import MultiResL1SpecLoss
    from open_universe_tpu.losses.combine import MultiLoss
    from open_universe_tpu.training.lora_trainer import (
        LoraTrainConfig,
        UniverseLoRATrainer,
    )

    base_model = UniverseModel(TINY)
    pre = base_model.init(jax.random.PRNGKey(0), example_len=T)
    model = UniverseLoRATrainer.lora_ready_model(base_model)
    losses = MultiLoss({"multires": (1.0, MultiResL1SpecLoss(
        window_sz=(32,), hop_sz=(16,)))})
    # lr high enough that 3 steps move the loss decisively (at 1e-4 the
    # movement is ~1e-8/step — within float32 noise of the assertion)
    trainer = UniverseLoRATrainer(model, pre, losses,
                                  LoraTrainConfig(lora_rank=2,
                                                  n_steps_backprop=1,
                                                  lr=1e-2))
    state = trainer.init(jax.random.PRNGKey(1))
    mix = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (2, T, 1))
    tgt = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (2, T, 1))
    step = jax.jit(trainer.train_step)
    losses_seen = []
    for i in range(3):
        state, m = step(state, (mix, tgt), jax.random.PRNGKey(10))
        assert bool(jnp.isfinite(m["train/loss"]))
        losses_seen.append(float(m["train/loss"]))
    # lora factors must have moved
    moved = jax.tree_util.tree_map(lambda x: float(jnp.abs(x).max()),
                                   state.lora)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    assert losses_seen[-1] < losses_seen[0]


def test_lora_partial_diffusion():
    from open_universe_tpu.losses.combine import MultiLoss
    from open_universe_tpu.training.lora_trainer import (
        LoraTrainConfig,
        UniverseLoRATrainer,
    )

    base_model = UniverseModel(TINY)
    pre = base_model.init(jax.random.PRNGKey(0), example_len=T)
    model = UniverseLoRATrainer.lora_ready_model(base_model)
    losses = MultiLoss({"l1": (1.0, lambda e, t: jnp.mean(jnp.abs(e - t)))})
    trainer = UniverseLoRATrainer(
        model, pre, losses,
        LoraTrainConfig(lora_rank=2, use_partial_diffusion=True))
    state = trainer.init(jax.random.PRNGKey(1))
    mix = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (2, T, 1))
    tgt = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (2, T, 1))
    state, m = jax.jit(trainer.train_step)(state, (mix, tgt),
                                           jax.random.PRNGKey(4))
    assert bool(jnp.isfinite(m["train/loss"]))


def test_predictive_trainer():
    from open_universe_tpu.losses.combine import MultiLoss
    from open_universe_tpu.training.predictive import (
        PredictiveTrainConfig,
        PredictiveTrainer,
    )

    # trivial predictive "model": learned global gain
    def model_fn(params, mix, key):
        return params["gain"] * mix

    losses = MultiLoss({"l2": (1.0, lambda e, t: jnp.mean((e - t) ** 2))})
    trainer = PredictiveTrainer(model_fn, losses,
                                PredictiveTrainConfig(t_warmup=2, t_cosine=3,
                                                      t_max=100, lr=0.1))
    state = trainer.init_state({"gain": jnp.asarray(0.1)})
    tgt = jax.random.normal(jax.random.PRNGKey(0), (4, 100, 1))
    mix = tgt  # gain should go to 1
    step = jax.jit(trainer.train_step)
    for i in range(30):
        state, m = step(state, (mix, tgt), jax.random.PRNGKey(i))
    assert abs(float(state.params["gain"]) - 1.0) < 0.3


def test_compressed_mag_stft_roundtrip():
    from open_universe_tpu.ops.transforms import CompressedMagSTFT

    tr = CompressedMagSTFT(n_fft=64, hop_length=16, transform_type="exponent",
                           abs_exponent=0.5, factor=0.15)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (2, 512, 1))
    spec = tr(x)
    assert spec.shape == (2, 512 // 16 + 1, 2 * 33)
    back = tr.inv(spec, length=512)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-3, atol=1e-4)

    tr_log = CompressedMagSTFT(n_fft=64, hop_length=16, transform_type="log",
                               factor=0.3)
    back2 = tr_log.inv(tr_log(x), length=512)
    np.testing.assert_allclose(np.asarray(back2), np.asarray(x),
                               rtol=1e-3, atol=1e-4)
