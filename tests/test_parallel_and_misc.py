"""SSL conditioner, multihost helpers, logging, DNSMOS gating, parallel step."""
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_ssl_conditioner():
    from open_universe_tpu.models.universe.condition_ssl import (
        SSLConditionerNetwork,
        interpolate_nearest,
    )

    x = jnp.arange(8.0).reshape(1, 8, 1)
    y = interpolate_nearest(x, 4)
    np.testing.assert_allclose(np.asarray(y)[0, :, 0], [0, 2, 4, 6])

    net = SSLConditionerNetwork(rate_factors=(2, 4), n_channels=4,
                                extra_conv_block=True)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 160, 1)) * 0.1
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 13, 24))  # odd rate
    p = net.init(jax.random.PRNGKey(2), wav, feats)
    conds, y_est, h = net.apply(p, wav, feats)
    assert len(conds) == 3  # extra + 2 ups
    assert y_est.shape == (2, 160, 4)
    assert h.shape == (2, 20, 16)  # 160 / (2*4) latent frames


def test_ssl_backbone_gated():
    from open_universe_tpu.models.universe.condition_ssl import (
        make_wav2vec2_feature_fn,
    )

    with pytest.raises(RuntimeError, match="local pretrained weights"):
        make_wav2vec2_feature_fn("/nonexistent/wavlm")


def test_multihost_single_process():
    from open_universe_tpu.parallel.multihost import (
        all_mean_scalar_dict,
        is_rank_zero,
        worker_seed,
    )

    assert is_rank_zero()
    out = all_mean_scalar_dict({"a": jnp.asarray(2.0), "b": 3})
    assert out == {"a": 2.0, "b": 3.0}
    assert worker_seed(5) != worker_seed(6)


def test_metrics_logger(tmp_path):
    from open_universe_tpu.utils.logging import MetricsLogger

    lg = MetricsLogger(tmp_path, use_wandb=False)
    lg.log(1, {"loss": 0.5})
    lg.log(2, {"loss": jnp.asarray(0.25)})
    lg.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[1])["loss"] == 0.25


def test_dnsmos_gated(tmp_path):
    from open_universe_tpu.metrics.dnsmos import ComputeDNSMOS

    with pytest.raises(RuntimeError):
        ComputeDNSMOS(tmp_path)  # onnxruntime or model files missing


@pytest.mark.slow
def test_bench_scaling_harness(capsys):
    """Scaling benchmark runs on the virtual mesh and reports efficiency."""
    import json as _json

    from open_universe_tpu.bin.bench_scaling import main

    main(["--tiny", "--sizes", "1", "2", "--batch-per-device", "1",
          "--audio-len", "0.2", "--steps", "1"])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) == 2
    recs = [_json.loads(l) for l in lines]
    assert recs[0]["devices"] == 1 and recs[1]["devices"] == 2
    assert recs[0]["efficiency_vs_1dev"] == 1.0
    assert recs[1]["audio_s_per_s"] > 0


@pytest.mark.slow
def test_tensor_sharded_train_step():
    """dp x tp mesh: large weights column-sharded over `model`, step runs,
    and the result matches the replicated (dp-only) step numerically."""
    from open_universe_tpu.diffusion import DiffusionConfig
    from open_universe_tpu.models.universe.model import (
        UniverseConfig,
        UniverseModel,
    )
    from open_universe_tpu.parallel import (
        default_mesh,
        make_mesh,
        make_parallel_train_step,
        param_sharding_rules,
    )
    from open_universe_tpu.training import GanTrainConfig, GanTrainer

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    t = 160
    model = UniverseModel(UniverseConfig(
        fs=800, rate_factors=(2, 4), n_channels=4, noise_cond_dim=32,
        n_rff=8, n_mels=8, diffusion=DiffusionConfig(n_steps=4)))
    trainer = GanTrainer(model, GanTrainConfig(
        mpd_periods=(2, 3), mrd_resolutions=((64, 16, 32),),
        t_warmup=10, t_cosine=50, t_max=100))
    state = trainer.init(jax.random.PRNGKey(0), example_len=t, batch=4)

    mesh2d = make_mesh((2, 2), ("data", "model"))
    # the rule must actually shard something at this scale
    shardings = param_sharding_rules(mesh2d, state.gen_params, min_size=64)
    n_sharded = sum(1 for s in jax.tree_util.tree_leaves(shardings)
                    if s.spec != jax.sharding.PartitionSpec())
    assert n_sharded > 0

    mix = jax.random.normal(jax.random.PRNGKey(1), (4, t, 1)) * 0.1
    clean = mix * 0.9
    key = jax.random.PRNGKey(2)

    # the parallel step donates its input state — keep a copy for the
    # second (replicated) run
    state_copy = jax.tree_util.tree_map(jnp.array, state)

    step_tp = make_parallel_train_step(trainer, mesh2d, model_sharding=True,
                                       shard_min_size=64)
    s_tp, m_tp = step_tp(state, (mix, clean), key)
    # a large weight in the NEW state must still be sharded over `model`
    big = [x for x in jax.tree_util.tree_leaves(s_tp.gen_params)
           if hasattr(x, "sharding") and x.ndim >= 2 and x.size >= 64]
    assert any("model" in str(x.sharding.spec) for x in big), \
        [str(x.sharding.spec) for x in big[:5]]

    step_dp = make_parallel_train_step(trainer, default_mesh(4))
    s_dp, m_dp = step_dp(state_copy, (mix, clean), key)
    for k in m_dp:
        np.testing.assert_allclose(float(m_tp[k]), float(m_dp[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_data_parallel_loss_batch_invariance():
    """Weak-scaling correctness (SURVEY §2.8 / round-2 VERDICT item 6):
    the SAME global batch stepped on a 1-device mesh and on a 4-device
    `data` mesh must produce identical losses/metrics and identical
    updated parameters — the mesh only changes where shards live, never
    the math."""
    from open_universe_tpu.diffusion import DiffusionConfig
    from open_universe_tpu.models.universe.model import (
        UniverseConfig,
        UniverseModel,
    )
    from open_universe_tpu.parallel import default_mesh, make_parallel_train_step
    from open_universe_tpu.training import GanTrainConfig, GanTrainer

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    t = 160
    model = UniverseModel(UniverseConfig(
        fs=800, rate_factors=(2, 4), n_channels=4, noise_cond_dim=32,
        n_rff=8, n_mels=8, diffusion=DiffusionConfig(n_steps=4)))
    trainer = GanTrainer(model, GanTrainConfig(
        mpd_periods=(2, 3), mrd_resolutions=((64, 16, 32),),
        t_warmup=10, t_cosine=50, t_max=100))
    state = trainer.init(jax.random.PRNGKey(0), example_len=t, batch=4)
    state_copy = jax.tree_util.tree_map(jnp.array, state)

    mix = jax.random.normal(jax.random.PRNGKey(1), (8, t, 1)) * 0.1
    clean = mix * 0.9
    key = jax.random.PRNGKey(2)

    s1, m1 = make_parallel_train_step(trainer, default_mesh(1))(
        state, (mix, clean), key)
    s4, m4 = make_parallel_train_step(trainer, default_mesh(4))(
        state_copy, (mix, clean), key)
    for k in m1:
        np.testing.assert_allclose(float(m4[k]), float(m1[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    p1 = jax.tree_util.tree_leaves(jax.device_get(s1.gen_params))
    p4 = jax.tree_util.tree_leaves(jax.device_get(s4.gen_params))
    for a, b in zip(p1, p4):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
