"""End-to-end CLI test: train -> checkpoint -> resume -> enhance -> eval.

This mirrors the reference's product workflow (README.md:70-96):
    train.py experiment=... ; bin/enhance ; bin/eval_metrics ; make_table
on a tiny synthetic corpus and a tiny model, all on CPU.
"""
import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import yaml

from open_universe_tpu.data.wavio import write_wav

FS = 800
T_CLIP = 320  # 0.4 s


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = root / "data"
    rng = np.random.default_rng(0)
    for split, n in [("train", 8), ("val", 2), ("test", 2)]:
        for d in ["noisy", "clean"]:
            (data / split / d).mkdir(parents=True)
        for i in range(n):
            t = np.arange(T_CLIP) / FS
            clean = 0.1 * np.sin(2 * np.pi * (30 + 10 * i) * t)
            noisy = clean + 0.03 * rng.standard_normal(T_CLIP)
            write_wav(data / split / "clean" / f"u{i}.wav", clean, FS)
            write_wav(data / split / "noisy" / f"u{i}.wav", noisy, FS)

    cfg = {
        "name": "tiny",
        "model": {
            "fs": FS, "rate_factors": [2, 4], "n_channels": 4,
            "n_rff": 8, "noise_cond_dim": 32, "n_mels": 8,
            "n_mel_oversample": 4, "extra_conv_block": True,
            "use_weight_norm": True, "time_embedding": "simple",
            "use_signal_decoupling": True,
            "diffusion": {"n_steps": 4},
            "edm": {"noise": 0.25, "data_level_db": -26.0},
            "normalization": {"norm": 2, "level_db": -26.0, "ref": "both"},
        },
        "trainer": {
            "kind": "gan", "mpd_periods": [2, 3],
            "mrd_resolutions": [[64, 16, 32]],
            "t_warmup": 10, "t_cosine": 50, "t_max": 100,
        },
        "datamodule": {
            "audio_path": str(data), "fs": FS, "audio_len": 0.2,
            "length_mode": "crop", "batch_size": 2, "num_workers": 2,
        },
        "run": {
            "max_steps": 4, "val_every": 4, "log_every": 2,
            "ckpt_every": 4, "ckpt_dir": str(root / "exp"), "seed": 0,
            "n_bins": 2, "max_enh_batches": 1,
        },
    }
    cfg_path = root / "tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root, cfg_path, data


def test_train_and_resume(workdir):
    from open_universe_tpu.bin.train import main as train_main

    root, cfg_path, data = workdir
    train_main(["--config", str(cfg_path)])
    ckpt = root / "exp"
    assert (ckpt / "last.json").exists()
    assert json.loads((ckpt / "last.json").read_text())["step"] == 4
    assert (ckpt / "config.yaml").exists()
    assert (ckpt / "metrics.jsonl").exists()

    # resume for 2 more steps
    train_main(["--config", str(cfg_path), "--max-steps", "6"])
    assert json.loads((ckpt / "last.json").read_text())["step"] == 6


def test_enhance_cli(workdir):
    from open_universe_tpu.bin.enhance import main as enhance_main

    root, cfg_path, data = workdir
    out = root / "enhanced"
    enhance_main([str(data / "test" / "noisy"), str(out),
                  "--ckpt", str(root / "exp")])
    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 2
    from open_universe_tpu.data.wavio import read_wav
    y, fs = read_wav(wavs[0])
    assert fs == FS
    assert y.shape[0] == T_CLIP  # length preserved


def test_enhance_cli_batched(workdir):
    """--batch folder mode: same-bucket files run through one sampler
    call; outputs keep per-file lengths and carry provenance metadata."""
    from open_universe_tpu.bin.enhance import main as enhance_main

    root, cfg_path, data = workdir
    out = root / "enhanced_batched"
    enhance_main([str(data / "test" / "noisy"), str(out),
                  "--ckpt", str(root / "exp"), "--batch", "2"])
    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 2
    from open_universe_tpu.data.wavio import read_wav
    for w in wavs:
        y, fs = read_wav(w)
        assert fs == FS and y.shape[0] == T_CLIP
        assert np.isfinite(y).all()
    meta = json.loads((out / "enhance_meta.json").read_text())
    assert meta["resolved_step"] is not None


def test_enhance_cli_chunked(workdir):
    """--chunk-seconds: long files stream through fixed-size overlap-add
    chunks (inference/streaming.py) from the CLI."""
    from open_universe_tpu.bin.enhance import main as enhance_main

    root, cfg_path, data = workdir
    out = root / "enhanced_chunked"
    enhance_main([str(data / "test" / "noisy"), str(out),
                  "--ckpt", str(root / "exp"),
                  "--chunk-seconds", "0.15", "--overlap-seconds", "0.04"])
    from open_universe_tpu.data.wavio import read_wav
    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 2
    for w in wavs:
        y, fs = read_wav(w)
        assert fs == FS and y.shape[0] == T_CLIP
        assert np.isfinite(y).all() and np.abs(y).max() > 0


def test_eval_metrics_and_table(workdir, capsys):
    from open_universe_tpu.bin.eval_metrics import main as eval_main
    from open_universe_tpu.bin.make_table import main as table_main

    root, cfg_path, data = workdir
    out = root / "enhanced"
    eval_main([str(out), "--ref", str(data / "test" / "clean"),
               "--metrics", "si-sdr", "lsd", "sdr"])
    store_path = out / "metrics.json"
    assert store_path.exists()
    store = json.loads(store_path.read_text())
    assert len(store) == 2
    for v in store.values():
        assert {"si-sdr", "lsd", "sdr"} <= set(v)

    # incremental: second run should skip computed entries (still valid)
    eval_main([str(out), "--ref", str(data / "test" / "clean"),
               "--metrics", "si-sdr", "lsd", "sdr"])

    table_main([str(store_path)])
    text = capsys.readouterr().out
    assert "si-sdr" in text and "lsd" in text


def test_lora_finetune_cli(workdir):
    """LoRA fine-tune from the GAN checkpoint created above (reference
    experiment universepp_lora_finetune -> UniverseLoRA, lora.py:39)."""
    from open_universe_tpu.bin.train import main as train_main

    root, cfg_path, data = workdir
    base = yaml.safe_load(Path(cfg_path).read_text())
    cfg = {
        "name": "tiny_lora",
        "model": {"fs": FS},
        "trainer": {
            "kind": "lora", "pretrained_ckpt": str(root / "exp"),
            "lora_rank": 2, "n_steps_backprop": 1,
            "t_warmup": 2, "t_cosine": 5, "t_max": 10,
            "losses": {"mrstft": {"weight": 1.0, "window_sz": [64],
                                  "time_domain_weight": 0.5}},
        },
        "datamodule": dict(base["datamodule"]),
        "run": {
            "max_steps": 2, "val_every": 2, "log_every": 1,
            "ckpt_every": 2, "ckpt_dir": str(root / "exp_lora"), "seed": 0,
            "max_enh_batches": 1,
        },
    }
    lora_cfg = root / "tiny_lora.yaml"
    with open(lora_cfg, "w") as f:
        yaml.safe_dump(cfg, f)
    train_main(["--config", str(lora_cfg)])
    assert (root / "exp_lora" / "last.json").exists()
    assert json.loads((root / "exp_lora" / "last.json").read_text())["step"] == 2
