"""Aux subsystems: native audio runtime, TextGrid, streaming, profiling,
prepare tool, cloud sync gating, 24k config build."""
import subprocess
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_universe_tpu.data.wavio import read_wav, write_wav


NATIVE_DIR = Path(__file__).parent.parent / "open_universe_tpu" / "native"


@pytest.fixture(scope="module")
def native_lib():
    import open_universe_tpu.native as nat
    if not nat.is_available():
        try:
            nat.build()
        except Exception:
            pytest.skip("native toolchain unavailable")
    return nat


def test_native_wav_roundtrip(native_lib, tmp_path):
    x = np.clip(0.3 * np.random.default_rng(0).standard_normal(4000),
                -1, 1).astype(np.float32)
    native_lib.write_wav(tmp_path / "a.wav", x, 16000)
    y, fs = native_lib.read_wav(tmp_path / "a.wav")
    assert fs == 16000
    np.testing.assert_allclose(y[:, 0], x, atol=1.0 / 16000)
    info = native_lib.wav_info(tmp_path / "a.wav")
    assert info["num_frames"] == 4000


def test_native_resample_tone(native_lib):
    t = np.arange(48000) / 48000
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    r = native_lib.resample(tone, 48000, 16000)
    assert len(r) == 16000
    ref = np.sin(2 * np.pi * 440 * np.arange(len(r)) / 16000)
    assert np.abs(r[100:-100] - ref[100:-100]).max() < 1e-3


def test_python_wavio_uses_native(native_lib, tmp_path):
    # write via python API (falls through to wave module), read via unified
    x = np.clip(0.1 * np.random.default_rng(1).standard_normal(1000),
                -1, 1).astype(np.float32)
    write_wav(tmp_path / "b.wav", x, 8000)
    y, fs = read_wav(tmp_path / "b.wav")
    assert fs == 8000 and y.shape == (1000, 1)


def test_textgrid_parse(tmp_path):
    from open_universe_tpu.data.textgrid import (
        alignment_to_frames,
        parse_textgrid,
    )

    tg = tmp_path / "u0.TextGrid"
    tg.write_text('''File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 2.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2.0
        intervals: size = 3
        intervals [1]:
            xmin = 0.0
            xmax = 0.5
            text = ""
        intervals [2]:
            xmin = 0.5
            xmax = 1.2
            text = "hello"
        intervals [3]:
            xmin = 1.2
            xmax = 2.0
            text = "world"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 2.0
        intervals: size = 2
        intervals [1]:
            xmin = 0.0
            xmax = 1.0
            text = "HH"
        intervals [2]:
            xmin = 1.0
            xmax = 2.0
            text = "W"
''')
    tiers = parse_textgrid(tg)
    assert [w for _, _, w in tiers["words"]] == ["", "hello", "world"]
    assert len(tiers["phones"]) == 2
    ids = alignment_to_frames(tiers["words"], 20, 10.0)
    assert ids[:5].sum() == 0  # silence
    assert ids[6:11].all()


@pytest.mark.slow
def test_streaming_enhance():
    from open_universe_tpu.diffusion import DiffusionConfig
    from open_universe_tpu.inference import enhance_streaming
    from open_universe_tpu.models.universe.model import (
        UniverseConfig,
        UniverseModel,
    )

    model = UniverseModel(UniverseConfig(
        fs=800, rate_factors=(2, 4), n_channels=4, noise_cond_dim=32,
        n_rff=8, n_mels=8, diffusion=DiffusionConfig(n_steps=3)))
    params = model.init(jax.random.PRNGKey(0), example_len=80)
    mix = 0.1 * np.random.default_rng(0).standard_normal(2000).astype(
        np.float32)
    out = enhance_streaming(model, params, mix, jax.random.PRNGKey(1),
                            chunk_seconds=1.0, overlap_seconds=0.25)
    assert out.shape == (2000,)
    assert np.isfinite(out).all()


def test_streaming_enhance_sharded_matches_unsharded():
    """Chunk-parallel streaming over an 8-device mesh == same batched math
    on one device (sharding must not change the audio)."""
    from open_universe_tpu.diffusion import DiffusionConfig
    from open_universe_tpu.inference import enhance_streaming_sharded
    from open_universe_tpu.models.universe.model import (
        UniverseConfig,
        UniverseModel,
    )
    from open_universe_tpu.parallel import default_mesh

    model = UniverseModel(UniverseConfig(
        fs=800, rate_factors=(2, 4), n_channels=4, noise_cond_dim=32,
        n_rff=8, n_mels=8, diffusion=DiffusionConfig(n_steps=3)))
    params = model.init(jax.random.PRNGKey(0), example_len=80)
    mix = 0.1 * np.random.default_rng(0).standard_normal(7000).astype(
        np.float32)
    kwargs = dict(chunk_seconds=1.0, overlap_seconds=0.25)
    mesh = default_mesh(8)
    out_sh = enhance_streaming_sharded(model, params, mix,
                                       jax.random.PRNGKey(1), mesh=mesh,
                                       **kwargs)
    out_ref = enhance_streaming_sharded(model, params, mix,
                                        jax.random.PRNGKey(1), mesh=None,
                                        chunks_per_device=8, **kwargs)
    assert out_sh.shape == (7000,)
    assert np.isfinite(out_sh).all()
    np.testing.assert_allclose(out_sh, out_ref, atol=2e-4, rtol=1e-3)


def test_profiling_flops():
    from open_universe_tpu.utils.profiling import (
        enhance_flops,
        score_network_flops,
        speed_of_light_report,
    )

    f = score_network_flops(64000)
    assert 1e9 < f < 1e12  # ~tens of GFLOP for the full model
    e = enhance_flops(64000, n_steps=8)
    assert e > 8 * f * 0.9
    rep = speed_of_light_report(0.1, e)
    assert 0 < rep["sol_fraction"] < 1.5


def test_prepare_resample_cli(tmp_path):
    from open_universe_tpu.prepare.resample import main as resample_main

    src = tmp_path / "src"
    src.mkdir()
    t = np.arange(4800) / 48000
    write_wav(src / "a.wav", np.sin(2 * np.pi * 440 * t), 48000)
    resample_main([str(src), str(tmp_path / "dst"), "--fs", "16000"])
    y, fs = read_wav(tmp_path / "dst" / "a.wav")
    assert fs == 16000
    assert abs(y.shape[0] - 1600) <= 1


def test_cloud_sync_gating(tmp_path):
    from open_universe_tpu.training.cloud_sync import CloudBackup

    cb = CloudBackup(tmp_path, remote_root=None)
    assert not cb.enabled
    assert cb.trigger() is False
    cb2 = CloudBackup(tmp_path, remote_root="remote:exp",
                      tool="definitely-not-a-tool")
    assert not cb2.enabled


def test_24k_config_builds():
    from open_universe_tpu.config import load_config
    from open_universe_tpu.runtime import build_model, build_trainer

    cfg_path = (Path(__file__).parent.parent / "open_universe_tpu" / "config"
                / "universepp_24k.yaml")
    cfg = load_config(cfg_path)
    model = build_model(cfg["model"])
    assert model.tot_ds == 240
    assert model.latent_n_channels == 16 * 48
    trainer = build_trainer(model, cfg["trainer"])
    assert trainer.cfg.t_max == 600000


def test_phoneme_loss_gating():
    from open_universe_tpu.losses.phoneme import PhonemeLoss

    with pytest.raises(RuntimeError, match="local pretrained weights"):
        PhonemeLoss(model_path="/nonexistent/wav2vec2")


@pytest.mark.slow
def test_profile_tool_sol_accounting(tmp_path, capsys):
    """bin/profile: trace + speed-of-light accounting (SURVEY §5 — the
    reference ships no profiler at all). Asserts the XLA cost analysis
    and roofline fields are populated and internally consistent."""
    import json

    import yaml

    from open_universe_tpu.bin.profile import main as profile_main

    cfg = {"model": {"fs": 800, "rate_factors": [2, 4], "n_channels": 4,
                     "n_rff": 8, "noise_cond_dim": 32, "n_mels": 8,
                     "diffusion": {"n_steps": 4}},
           "trainer": {"kind": "gan", "mpd_periods": [2, 3],
                       "mrd_resolutions": [[64, 16, 32]]},
           "datamodule": {"batch_size": 2},
           "run": {"max_steps": 1, "ckpt_dir": str(tmp_path)}}
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    profile_main(["--config", str(p), "--mode", "train", "--steps", "1",
                  "--audio-len", "0.2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["xla_gflops_per_step"] > 0
    assert out["xla_gbytes_per_step"] > 0
    assert out["sol_bound"] in ("MXU", "HBM")
    assert out["sol_floor_ms"] == max(out["mxu_floor_ms"],
                                      out["hbm_floor_ms"])
    assert out["ms_per_step"] > 0
