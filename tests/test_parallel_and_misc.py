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
