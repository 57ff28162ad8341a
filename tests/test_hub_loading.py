"""Hub-layout model loading: serve a reference-published checkpoint dir
(weights.ckpt + hydra config.yaml) directly through bin/enhance.

Parity target: reference ``inference_utils/model_loader.py:33-133`` /
``bin/enhance.py:142`` (HF model spec). The zero-egress path: the two
files are pre-placed (hub cache or local dir); conversion to our
servable format happens once and is cached.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = [
    pytest.mark.skipif(
        not Path("/root/reference/open_universe").exists(),
        reason="reference tree not mounted"),
    pytest.mark.slow,
]

import torch  # noqa: E402
import yaml  # noqa: E402

sys.path.insert(0, str(Path(__file__).parent))
from ref_harness import ad, load_reference  # noqa: E402
from test_pipeline_parity import _ref_cfg  # noqa: E402

from open_universe_tpu.data.wavio import read_wav, write_wav  # noqa: E402


def _hub_dir(tmp_path):
    """Reference-format hub dir: weights.ckpt + hydra config.yaml."""
    mods = load_reference()
    torch.manual_seed(60)
    fs, t = 800, 320
    kw = _ref_cfg(tiny=True, gan=True, fs=fs)
    kw["training"]["audio_len"] = t / fs
    kw["edm"] = ad({"noise": 0.25, "data_level_db": -26.0})
    ref = mods["universe_gan"].UniverseGAN(**kw)

    hub = tmp_path / "hub_model"
    hub.mkdir()
    torch.save({"state_dict": ref.state_dict(), "global_step": 7},
               hub / "weights.ckpt")
    ref_cfg = {"model": {
        "fs": fs,
        "normalization_norm": 2,
        "normalization_kwargs": {"ref": "both", "level_db": -26.0},
        "edm": {"noise": 0.25, "data_level_db": -26.0},
        "score_model": dict(kw["score_model"]),
        "condition_model": dict(kw["condition_model"]),
        "diffusion": dict(kw["diffusion"]),
        "losses": {"use_signal_decoupling": True,
                   "signal_decoupling_act": "snake",
                   "weights": {"mel_l1": 45.0, "score": 1.0}},
        "training": {"ema_decay": 0.0},
    }}
    with open(hub / "config.yaml", "w") as f:
        yaml.safe_dump(ref_cfg, f)
    return hub


def test_enhance_cli_on_hub_layout_dir(tmp_path):
    from open_universe_tpu.bin.enhance import main as enh_main

    hub = _hub_dir(tmp_path)
    rng = np.random.default_rng(61)
    wav_in = tmp_path / "in"
    wav_in.mkdir()
    write_wav(wav_in / "a.wav",
              (rng.standard_normal(800) * 0.05).astype(np.float32), 800)
    out = tmp_path / "out"
    enh_main([str(wav_in), str(out), "--ckpt", str(hub), "--n-steps", "2"])
    est, fs = read_wav(out / "a.wav")
    assert fs == 800 and est.shape[0] == 800
    assert np.all(np.isfinite(est))

    # second resolve hits the conversion cache (same dir returned)
    from open_universe_tpu.inference.model_hub import resolve_model_source
    d1 = resolve_model_source(hub)
    d2 = resolve_model_source(hub)
    assert d1 == d2 and (d1 / ".source_mtime").exists()


def test_resolve_hub_spec_from_cache(tmp_path, monkeypatch):
    """repo_id:revision resolves against the offline cache dir."""
    from open_universe_tpu.inference.model_hub import (
        CACHE_ENV,
        resolve_model_source,
    )

    hub = _hub_dir(tmp_path)
    cache = tmp_path / "cache" / "line-corporation--open-universe" / \
        "plusplus"
    cache.mkdir(parents=True)
    (cache / "weights.ckpt").write_bytes(
        (hub / "weights.ckpt").read_bytes())
    (cache / "config.yaml").write_bytes((hub / "config.yaml").read_bytes())
    monkeypatch.setenv(CACHE_ENV, str(tmp_path / "cache"))

    d = resolve_model_source("line-corporation/open-universe:plusplus")
    assert (d / "config.yaml").exists()

    with pytest.raises(FileNotFoundError):
        resolve_model_source("nonexistent/repo:rev")
