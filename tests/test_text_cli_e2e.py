"""End-to-end text-conditioned workflow: config -> text_gan train ->
checkpoint -> text-aware enhance CLI (enhance_NS parity)."""
import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import yaml

from open_universe_tpu.data.wavio import write_wav

FS = 800
T_CLIP = 320


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("text_e2e")
    data = root / "data"
    txt = root / "txt"
    txt.mkdir()
    rng = np.random.default_rng(0)
    words = ["hello there", "good morning", "quiet night", "loud street"]
    for split, n in [("train", 4), ("val", 2), ("test", 2)]:
        for d in ["noisy", "clean"]:
            (data / split / d).mkdir(parents=True)
        for i in range(n):
            t = np.arange(T_CLIP) / FS
            clean = 0.1 * np.sin(2 * np.pi * (30 + 10 * i) * t)
            noisy = clean + 0.03 * rng.standard_normal(T_CLIP)
            key = f"{split}_u{i}"
            write_wav(data / split / "clean" / f"{key}.wav", clean, FS)
            write_wav(data / split / "noisy" / f"{key}.wav", noisy, FS)
            (txt / f"{key}.txt").write_text(words[i % len(words)])

    from open_universe_tpu.text import CharTokenizer
    cfg = {
        "name": "tiny-text",
        "model": {
            "fs": FS, "rate_factors": [2, 4], "n_channels": 4,
            "n_rff": 8, "noise_cond_dim": 32, "n_mels": 8,
            "n_mel_oversample": 4, "extra_conv_block": True,
            "use_weight_norm": True, "time_embedding": "simple",
            "use_signal_decoupling": True,
            "diffusion": {"n_steps": 3},
            "edm": {"noise": 0.25, "data_level_db": -26.0},
            "normalization": {"norm": 2, "level_db": -26.0, "ref": "both"},
            "text": {"vocab_size": CharTokenizer().vocab_size,
                     "text_hidden": 16, "text_layers": 1,
                     "film_global_dim": 32, "cross_attention_dim": 32,
                     "cross_attention_num_heads": 2, "text_max_len": 16},
        },
        "trainer": {
            "kind": "text_gan", "mpd_periods": [2],
            "mrd_resolutions": [[64, 16, 32]],
            "t_warmup": 10, "t_cosine": 50, "t_max": 100,
            "text_warmup_steps": 2,
        },
        "datamodule": {
            "audio_path": str(data), "fs": FS, "audio_len": 0.2,
            "length_mode": "pad", "batch_size": 2, "num_workers": 2,
            "text_path": str(txt),
        },
        "run": {
            "max_steps": 2, "val_every": 100, "log_every": 1,
            "ckpt_every": 2, "ckpt_dir": str(root / "exp"), "seed": 0,
        },
    }
    cfg_path = root / "text.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root, cfg_path, data, txt


def test_text_train(workdir):
    from open_universe_tpu.bin.train import main as train_main

    root, cfg_path, data, txt = workdir
    train_main(["--config", str(cfg_path)])
    assert json.loads((root / "exp" / "last.json").read_text())["step"] == 2
    metrics = [json.loads(l) for l in
               (root / "exp" / "metrics.jsonl").read_text().splitlines()]
    assert any("train/ga" in m for m in metrics)  # GA loss was active


def test_text_enhance_cli(workdir):
    from open_universe_tpu.bin.enhance import main as enhance_main

    root, cfg_path, data, txt = workdir
    out = root / "enhanced"
    enhance_main([str(data / "test" / "noisy"), str(out),
                  "--ckpt", str(root / "exp"), "--text-dir", str(txt)])
    assert len(list(out.glob("*.wav"))) == 2

    # no-text fallback on the same checkpoint
    out2 = root / "enhanced_notext"
    enhance_main([str(data / "test" / "noisy"), str(out2),
                  "--ckpt", str(root / "exp")])
    assert len(list(out2.glob("*.wav"))) == 2
