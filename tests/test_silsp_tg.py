"""silsp_tg conditioning variant: <sil> anchor token, TextGrid token
coords, phoneme-position alignment loss (reference
condition_11May2_silsp_tg.py / textencoder_11May_silsp.py /
universe_gan_NS_11May_tg.py:595-640)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_universe_tpu.data.textgrid import (
    AlignedNoisyDataset,
    parse_textgrid,
    token_alignment_coords,
)
from open_universe_tpu.diffusion import DiffusionConfig
from open_universe_tpu.losses.guided_attention import phoneme_alignment_loss
from open_universe_tpu.models.universe.model import UniverseConfig
from open_universe_tpu.models.universe.model_text import (
    TextConfig,
    TextUniverseModel,
)
from open_universe_tpu.text.encoder import TextEncoder
from open_universe_tpu.text.tokenizer import CharTokenizer
from open_universe_tpu.training.text_gan_trainer import (
    TextGanTrainConfig,
    TextGanTrainer,
)

TG = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 2.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2.0
        intervals: size = 4
        intervals [1]:
            xmin = 0.0
            xmax = 0.4
            text = ""
        intervals [2]:
            xmin = 0.4
            xmax = 1.0
            text = "hi"
        intervals [3]:
            xmin = 1.0
            xmax = 1.2
            text = ""
        intervals [4]:
            xmin = 1.2
            xmax = 2.0
            text = "you"
"""


def test_tokenizer_sil_token():
    tok = CharTokenizer(max_len=8, sil_token=True)
    plain = CharTokenizer(max_len=8)
    assert tok.vocab_size == plain.vocab_size + 1
    ids, mask = tok(["ab"])
    assert ids[0, 0] == tok.sil_id
    assert not mask[0, 0]  # sil is a real token, not PAD
    assert ids[0, 1] == plain(["ab"])[0][0, 0]
    assert mask[0, 3]  # padding after "ab"


def test_text_encoder_sil_key_mask():
    tok = CharTokenizer(max_len=8, sil_token=True)
    ids, pad = tok(["ab"])
    enc = TextEncoder(vocab_size=tok.vocab_size, hidden=16, n_layers=1,
                      global_dim=8, seq_dim=8, max_len=8, sil_id=tok.sil_id)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                      jnp.asarray(pad))
    _, _, key_mask = enc.apply(params, jnp.asarray(ids), jnp.asarray(pad))
    # <sil> column masked out of cross-attention keys, real chars kept
    assert bool(key_mask[0, 0])
    assert not bool(key_mask[0, 1])
    assert bool(key_mask[0, 3])  # padding still masked


def test_token_alignment_coords(tmp_path):
    p = tmp_path / "utt.TextGrid"
    p.write_text(TG)
    tiers = parse_textgrid(p)
    assert len(tiers["words"]) == 4

    tok = CharTokenizer(max_len=16, sil_token=True)
    coords, valid = token_alignment_coords(tiers["words"], "hi you", tok)
    # <sil> anchor gets the leading silence span
    assert valid[0]
    np.testing.assert_allclose(coords[0], [0.0, 0.2], atol=1e-6)
    # "h" = first half of [0.4, 1.0] normalized by 2.0
    assert valid[1]
    np.testing.assert_allclose(coords[1], [0.2, 0.35], atol=1e-6)
    np.testing.assert_allclose(coords[2], [0.35, 0.5], atol=1e-6)
    # space between words -> the inter-word gap [1.0, 1.2]/2
    assert valid[3]
    np.testing.assert_allclose(coords[3], [0.5, 0.6], atol=1e-6)
    # "you" splits [1.2, 2.0] into thirds
    np.testing.assert_allclose(coords[4], [0.6, 0.6 + 0.4 / 3], atol=1e-6)
    # nothing aligned past the text
    assert not valid[7]


def test_token_alignment_coords_no_sil():
    tok = CharTokenizer(max_len=16)
    words = [(0.0, 0.5, ""), (0.5, 1.0, "ab")]
    coords, valid = token_alignment_coords(words, "ab", tok)
    assert valid[0] and valid[1] and not valid[2]
    np.testing.assert_allclose(coords[0], [0.5, 0.75], atol=1e-6)


def test_phoneme_alignment_loss():
    b, q, s = 2, 20, 5
    # diagonal attention: token j attends to frame 4j
    attn = np.zeros((b, q, s), np.float32)
    for j in range(s):
        attn[0, min(4 * j, q - 1), j] = 1.0
        attn[1, q - 1 - min(4 * j, q - 1), j] = 1.0  # anti-diagonal
    coords = np.zeros((b, s, 2), np.float32)
    for j in range(s):
        c = 4 * j / q
        coords[:, j] = (c - 0.01, c + 0.01)
    valid = np.ones((b, s), bool)
    # sample 0 aligned (within 2-frame slack -> 0), sample 1 far off
    l0 = float(phoneme_alignment_loss(
        jnp.asarray(attn[:1]), jnp.asarray(coords[:1]),
        jnp.asarray(valid[:1])))
    l1 = float(phoneme_alignment_loss(
        jnp.asarray(attn[1:]), jnp.asarray(coords[1:]),
        jnp.asarray(valid[1:])))
    assert l0 == pytest.approx(0.0, abs=1e-6)
    assert l1 > 1.0
    # sample without any valid span is skipped, not averaged as zero
    both = float(phoneme_alignment_loss(
        jnp.asarray(attn), jnp.asarray(coords),
        jnp.asarray(np.stack([np.zeros(s, bool), np.ones(s, bool)]))))
    assert both == pytest.approx(l1, rel=1e-5)


def test_aligned_dataset_token_coords(tmp_path):
    for split in ("train",):
        for kind in ("noisy", "clean"):
            d = tmp_path / split / kind
            d.mkdir(parents=True)
    from open_universe_tpu.native import write_wav

    wav = (0.1 * np.sin(2 * np.pi * 440 / 800
                        * np.arange(800))).astype(np.float32)
    write_wav(str(tmp_path / "train/noisy/utt.wav"), wav, 800)
    write_wav(str(tmp_path / "train/clean/utt.wav"), wav, 800)
    tgd = tmp_path / "tg"
    tgd.mkdir()
    (tgd / "utt.TextGrid").write_text(TG)

    tok = CharTokenizer(max_len=16, sil_token=True)
    ds = AlignedNoisyDataset(tmp_path, split="train", fs=800,
                             audio_len=1.0, textgrid_path=tgd,
                             tokenizer=tok)
    coords, valid = ds.token_coords("utt")
    assert valid[0] and valid[1]
    # missing TextGrid -> all invalid (loss skips)
    coords2, valid2 = ds.token_coords("nope")
    assert not valid2.any()


@pytest.mark.slow
def test_text_cli_train_with_textgrid(tmp_path):
    """bin/train end-to-end: aligned dataset + sil token + align loss."""
    import json

    import yaml

    from open_universe_tpu.bin.train import main as train_main
    from open_universe_tpu.data.wavio import write_wav

    fs, t_clip = 800, 320
    data = tmp_path / "data"
    txt = tmp_path / "txt"
    tgd = tmp_path / "tg"
    txt.mkdir()
    tgd.mkdir()
    rng = np.random.default_rng(0)
    for split, n in [("train", 4), ("val", 2), ("test", 2)]:
        for d in ("noisy", "clean"):
            (data / split / d).mkdir(parents=True)
        for i in range(n):
            tt = np.arange(t_clip) / fs
            clean = 0.1 * np.sin(2 * np.pi * (30 + 10 * i) * tt)
            noisy = clean + 0.03 * rng.standard_normal(t_clip)
            key = f"{split}_u{i}"
            write_wav(data / split / "clean" / f"{key}.wav", clean, fs)
            write_wav(data / split / "noisy" / f"{key}.wav", noisy, fs)
            (txt / f"{key}.txt").write_text("hi you")
            (tgd / f"{key}.TextGrid").write_text(TG)

    tok = CharTokenizer(max_len=16, sil_token=True)
    cfg = {
        "name": "tiny-silsp-tg",
        "model": {
            "fs": fs, "rate_factors": [2, 4], "n_channels": 4,
            "n_rff": 8, "noise_cond_dim": 32, "n_mels": 8,
            "n_mel_oversample": 4, "extra_conv_block": True,
            "use_weight_norm": True, "time_embedding": "simple",
            "diffusion": {"n_steps": 3},
            "normalization": {"norm": 2, "level_db": -26.0, "ref": "both"},
            "text": {"vocab_size": tok.vocab_size, "sil_token": True,
                     "text_hidden": 16, "text_layers": 1,
                     "film_global_dim": 32, "cross_attention_dim": 32,
                     "cross_attention_num_heads": 2, "text_max_len": 16},
        },
        "trainer": {
            "kind": "text_gan", "mpd_periods": [2],
            "mrd_resolutions": [[64, 16, 32]],
            "t_warmup": 10, "t_cosine": 50, "t_max": 100,
            "weight_align_phoneme": 0.5,
        },
        "datamodule": {
            "audio_path": str(data), "fs": fs, "audio_len": 0.4,
            "length_mode": "pad", "batch_size": 2, "num_workers": 2,
            "text_path": str(txt), "textgrid_path": str(tgd),
        },
        "run": {"max_steps": 2, "val_every": 100, "log_every": 1,
                "ckpt_every": 2, "ckpt_dir": str(tmp_path / "exp"),
                "seed": 0},
    }
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_main(["--config", str(cfg_path)])
    metrics = [json.loads(l) for l in
               (tmp_path / "exp" / "metrics.jsonl").read_text().splitlines()]
    assert any("train/align_phoneme" in m for m in metrics)


@pytest.mark.slow
def test_text_trainer_align_loss_step():
    tok = CharTokenizer(max_len=16, sil_token=True)
    tiny = UniverseConfig(
        fs=800, rate_factors=(2, 4), n_channels=4, noise_cond_dim=32,
        n_rff=8, n_mels=8, extra_conv_block=True, use_weight_norm=True,
        time_embedding="simple", diffusion=DiffusionConfig(n_steps=4))
    txt = TextConfig(vocab_size=tok.vocab_size, text_hidden=32,
                     text_layers=1, film_global_dim=64,
                     cross_attention_dim=64, cross_attention_num_heads=2,
                     text_max_len=16, sil_id=tok.sil_id)
    model = TextUniverseModel(tiny, txt)
    trainer = TextGanTrainer(model, TextGanTrainConfig(
        mpd_periods=(2, 3), mrd_resolutions=((64, 16, 32),),
        t_warmup=10, t_cosine=50, t_max=100, weight_align_phoneme=1.0))
    t = 160
    state = trainer.init(jax.random.PRNGKey(0), example_len=t, batch=2)
    ids, mask = tok(["hi you", "abc"])
    coords = np.zeros((2, 16, 2), np.float32)
    coords[:, :4] = [[0.1, 0.2]]
    valid = np.zeros((2, 16), bool)
    valid[:, :4] = True
    batch = {
        "mix": 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, t, 1)),
        "target": 0.1 * jax.random.normal(jax.random.PRNGKey(2), (2, t, 1)),
        "text_ids": jnp.asarray(ids), "text_mask": jnp.asarray(mask),
        "text_coords": jnp.asarray(coords),
        "text_coords_valid": jnp.asarray(valid),
    }
    state, m = jax.jit(trainer.train_step)(state, batch,
                                           jax.random.PRNGKey(3))
    assert "train/align_phoneme" in m
    assert bool(jnp.isfinite(m["train/align_phoneme"]))
    assert bool(jnp.isfinite(m["train/loss_gen"]))
