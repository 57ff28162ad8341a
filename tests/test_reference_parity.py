"""GOLDEN PARITY: our networks vs the ACTUAL reference torch code.

Loads the reference's score/conditioner modules directly from
/root/reference (read-only) with stubs for its unavailable deps (hydra,
torchaudio), random-initializes them, converts the torch state_dict with
``compat.torch_checkpoint``, and checks our flax forward matches the
reference forward numerically. This is SURVEY.md §7 build-plan step 1
(the parity harness) — no checkpoints needed.
"""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/open_universe/networks/universe")

pytestmark = [
    pytest.mark.skipif(not REF.exists(),
                       reason="reference tree not mounted"),
    pytest.mark.slow,
    pytest.mark.parity,
]

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from open_universe_tpu.compat import convert_reference_state_dict  # noqa: E402
from open_universe_tpu.models.universe.condition import (  # noqa: E402
    ConditionerNetwork,
)
from open_universe_tpu.models.universe.model import UniverseConfig  # noqa: E402
from open_universe_tpu.models.universe.score import ScoreNetwork  # noqa: E402
from open_universe_tpu.ops.stft import mel_filterbank  # noqa: E402


def _load_reference():
    """Import reference modules with hydra/torchaudio stubs."""
    if "refnet.universe.score" in sys.modules:
        return (sys.modules["refnet.universe.score"],
                sys.modules["refnet.universe.condition"])

    hydra = types.ModuleType("hydra")
    hu = types.ModuleType("hydra.utils")
    hu.instantiate = lambda *a, **k: None
    hydra.utils = hu
    sys.modules["hydra"] = hydra
    sys.modules["hydra.utils"] = hu

    ta = types.ModuleType("torchaudio")
    tt = types.ModuleType("torchaudio.transforms")

    class MelSpectrogram(torch.nn.Module):
        """torchaudio-compatible mel (hann periodic, center=False, power 2,
        htk filterbank) built on torch.stft + our filterbank table."""

        def __init__(self, sample_rate, n_mels, n_fft, hop_length,
                     center=False):
            super().__init__()
            self.n_fft, self.hop = n_fft, hop_length
            fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate)
            self.register_buffer("fb", torch.from_numpy(fb))
            self.register_buffer("win", torch.hann_window(n_fft,
                                                          periodic=True))

        def forward(self, x):
            shape = x.shape
            flat = x.reshape(-1, shape[-1])
            spec = torch.stft(flat, n_fft=self.n_fft, hop_length=self.hop,
                              window=self.win, center=False,
                              return_complex=True)
            power = spec.real**2 + spec.imag**2  # (B, F, frames)
            mel = torch.einsum("bft,fm->bmt", power, self.fb)
            return mel.reshape(shape[:-1] + mel.shape[-2:])

    tt.MelSpectrogram = MelSpectrogram
    ta.transforms = tt
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = tt

    pkg = types.ModuleType("refnet")
    pkg.__path__ = []
    bigv = types.ModuleType("refnet.bigvgan")
    bigv.AliasFreeSnake = None  # only needed for snake acts (not tested here)
    pkg.bigvgan = bigv
    sub = types.ModuleType("refnet.universe")
    sub.__path__ = []
    sys.modules["refnet"] = pkg
    sys.modules["refnet.bigvgan"] = bigv
    sys.modules["refnet.universe"] = sub

    for name in ["blocks", "sigma_block", "score", "condition"]:
        spec = importlib.util.spec_from_file_location(
            f"refnet.universe.{name}", REF / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "refnet.universe"
        sys.modules[f"refnet.universe.{name}"] = mod
        spec.loader.exec_module(mod)
    return (sys.modules["refnet.universe.score"],
            sys.modules["refnet.universe.condition"])


CFG = UniverseConfig(
    fs=800, rate_factors=(2, 4), n_channels=4, noise_cond_dim=32, n_rff=8,
    n_mels=8, n_mel_oversample=4, extra_conv_block=True,
    use_weight_norm=True, score_antialiasing=True, cond_antialiasing=False,
    encoder_gru_residual=True, time_embedding="simple",
)
T = 160


def test_score_network_parity():
    ref_score, _ = _load_reference()
    torch.manual_seed(0)
    tnet = ref_score.ScoreNetwork(
        fb_kernel_size=3, rate_factors=list(CFG.rate_factors),
        n_channels=CFG.n_channels, n_rff=CFG.n_rff,
        noise_cond_dim=CFG.noise_cond_dim,
        extra_conv_block=True, use_weight_norm=True, use_antialiasing=True,
        time_embedding="simple").eval()

    sd = {f"score_model.{k}": v for k, v in tnet.state_dict().items()}
    from open_universe_tpu.compat.torch_checkpoint import convert_score_network
    params = convert_score_network(sd, CFG)

    # inputs: torch (B, 1, T); cond per decoder level (B, C, T_l)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, T)).astype(np.float32) * 0.1
    sigma = np.asarray([0.5, 1.5], np.float32)
    # decoder levels for rate_factors (2,4)+extra: extra@latent, up_0, up_1
    lens = [20, 80, 160]
    chans = [16, 8, 4]
    cond_t = [rng.standard_normal((2, c, l)).astype(np.float32)
              for c, l in zip(chans, lens)]

    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x), torch.from_numpy(sigma),
                       [torch.from_numpy(c) for c in cond_t])

    ours = ScoreNetwork(
        rate_factors=CFG.rate_factors, n_channels=CFG.n_channels,
        n_rff=CFG.n_rff, noise_cond_dim=CFG.noise_cond_dim,
        extra_conv_block=True, use_weight_norm=True, use_antialiasing=True,
        time_embedding="simple")
    cond_j = [jnp.asarray(np.swapaxes(c, 1, 2)) for c in cond_t]
    out = ours.apply({"params": params},
                     jnp.asarray(np.swapaxes(x, 1, 2)),
                     jnp.asarray(sigma), cond_j)
    out_t = np.swapaxes(np.asarray(out), 1, 2)
    np.testing.assert_allclose(out_t, ref_out.numpy(), rtol=2e-3, atol=2e-4)


def test_score_network_parity_fullsize():
    """Same check at the real UNIVERSE++ architecture size."""
    ref_score, _ = _load_reference()
    cfg = UniverseConfig()  # rate_factors (2,4,4,5), n_channels 32
    torch.manual_seed(3)
    tnet = ref_score.ScoreNetwork(
        fb_kernel_size=3, rate_factors=list(cfg.rate_factors),
        n_channels=cfg.n_channels, n_rff=cfg.n_rff,
        noise_cond_dim=cfg.noise_cond_dim,
        extra_conv_block=True, use_weight_norm=True, use_antialiasing=True,
        time_embedding="simple").eval()
    sd = {f"score_model.{k}": v for k, v in tnet.state_dict().items()}
    from open_universe_tpu.compat.torch_checkpoint import convert_score_network
    params = convert_score_network(sd, cfg)

    t = 1600
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 1, t)).astype(np.float32) * 0.1
    sigma = np.asarray([0.7], np.float32)
    lens = [10, 50, 200, 800, 1600]
    chans = [512, 256, 128, 64, 32]
    cond_t = [rng.standard_normal((1, c, l)).astype(np.float32)
              for c, l in zip(chans, lens)]
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x), torch.from_numpy(sigma),
                       [torch.from_numpy(c) for c in cond_t])
    ours = ScoreNetwork(
        rate_factors=cfg.rate_factors, n_channels=cfg.n_channels,
        n_rff=cfg.n_rff, noise_cond_dim=cfg.noise_cond_dim,
        extra_conv_block=True, use_weight_norm=True, use_antialiasing=True,
        time_embedding="simple")
    cond_j = [jnp.asarray(np.swapaxes(c, 1, 2)) for c in cond_t]
    out = ours.apply({"params": params},
                     jnp.asarray(np.swapaxes(x, 1, 2)),
                     jnp.asarray(sigma), cond_j)
    np.testing.assert_allclose(np.swapaxes(np.asarray(out), 1, 2),
                               ref_out.numpy(), rtol=5e-3, atol=5e-4)


def test_conditioner_network_parity():
    _, ref_cond = _load_reference()
    torch.manual_seed(1)
    tnet = ref_cond.ConditionerNetwork(
        fb_kernel_size=3, rate_factors=list(CFG.rate_factors),
        n_channels=CFG.n_channels, n_mels=CFG.n_mels,
        n_mel_oversample=CFG.n_mel_oversample,
        encoder_gru_residual=True, extra_conv_block=True,
        use_weight_norm=True, use_antialiasing=False).eval()

    sd = {f"condition_model.{k}": v for k, v in tnet.state_dict().items()}
    sd["score_model.__absent__"] = 0
    # converter needs a score tree too; build only the conditioner
    from open_universe_tpu.compat.torch_checkpoint import (
        convert_conditioner_network,
    )
    params = convert_conditioner_network(sd, CFG)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 1, T)).astype(np.float32) * 0.1

    with torch.no_grad():
        conds_ref, y_ref, h_ref = tnet(torch.from_numpy(x), train=True)

    ours = ConditionerNetwork(
        rate_factors=CFG.rate_factors, n_channels=CFG.n_channels,
        n_mels=CFG.n_mels, n_mel_oversample=CFG.n_mel_oversample,
        encoder_gru_residual=True, extra_conv_block=True,
        use_weight_norm=True, use_antialiasing=False)
    conds, y, h = ours.apply({"params": params},
                             jnp.asarray(np.swapaxes(x, 1, 2)))

    np.testing.assert_allclose(np.swapaxes(np.asarray(y), 1, 2),
                               y_ref.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.swapaxes(np.asarray(h), 1, 2),
                               h_ref.numpy(), rtol=2e-3, atol=2e-4)
    assert len(conds) == len(conds_ref)
    for c_ours, c_ref in zip(conds, conds_ref):
        np.testing.assert_allclose(np.swapaxes(np.asarray(c_ours), 1, 2),
                                   c_ref.numpy(), rtol=2e-3, atol=2e-4)


def test_convert_checkpoint_cli(tmp_path):
    """bin.convert_checkpoint: reference Lightning ckpt (+ torch_ema
    shadows) + hydra config -> servable checkpoint dir (enhance-ready)."""
    import itertools

    import yaml

    from open_universe_tpu.bin.convert_checkpoint import convert
    from open_universe_tpu.training.checkpoint import load_model_for_inference

    ref_score, ref_cond = _load_reference()
    torch.manual_seed(7)
    kw = dict(fb_kernel_size=3, rate_factors=list(CFG.rate_factors),
              n_channels=CFG.n_channels, n_rff=CFG.n_rff,
              noise_cond_dim=CFG.noise_cond_dim, extra_conv_block=True,
              use_weight_norm=True, use_antialiasing=True,
              time_embedding="simple")
    tscore = ref_score.ScoreNetwork(**kw).eval()
    tcond = ref_cond.ConditionerNetwork(
        fb_kernel_size=3, rate_factors=list(CFG.rate_factors),
        n_channels=CFG.n_channels, n_mels=CFG.n_mels,
        n_mel_oversample=CFG.n_mel_oversample, encoder_gru_residual=True,
        extra_conv_block=True, use_weight_norm=True,
        use_antialiasing=False).eval()

    sd = {f"score_model.{k}": v for k, v in tscore.state_dict().items()}
    sd.update({f"condition_model.{k}": v
               for k, v in tcond.state_dict().items()})
    # torch_ema shadows in model_parameters() order (universe.py:130-133),
    # perturbed so EMA weights are distinguishable from the raw weights
    shadows = [p.detach().clone() * 1.5 for p in itertools.chain(
        tscore.parameters(), tcond.parameters())]
    ckpt = {"state_dict": sd, "global_step": 123,
            "ema": {"decay": 0.999, "num_updates": 10,
                    "shadow_params": shadows}}
    ckpt_path = tmp_path / "last.ckpt"
    torch.save(ckpt, ckpt_path)

    ref_cfg = {"model": {
        "fs": CFG.fs,
        "normalization_norm": 2,
        "normalization_kwargs": {"ref": "both", "level_db": -26.0},
        "edm": {"noise": 0.25},
        "score_model": {"fb_kernel_size": 3,
                        "rate_factors": list(CFG.rate_factors),
                        "n_channels": CFG.n_channels, "n_rff": CFG.n_rff,
                        "noise_cond_dim": CFG.noise_cond_dim,
                        "extra_conv_block": True, "use_weight_norm": True,
                        "use_antialiasing": True,
                        "time_embedding": "simple"},
        "condition_model": {"n_mels": CFG.n_mels,
                            "n_mel_oversample": CFG.n_mel_oversample,
                            "encoder_gru_residual": True,
                            "use_antialiasing": False},
        "diffusion": {"schedule": "geometric", "sigma_min": 0.0005,
                      "sigma_max": 5.0, "n_steps": 4, "epsilon": 1.3},
        "losses": {"use_signal_decoupling": False,
                   "weights": {"mel_l1": 45.0, "score": 1.0}},
        "training": {"ema_decay": 0.999},
    }}
    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump(ref_cfg, f)  # discovered next to the ckpt

    out = tmp_path / "converted"
    convert(ckpt_path, out)

    model, params, cfg = load_model_for_inference(out, use_ema=True)
    assert cfg["model"]["fs"] == CFG.fs
    # EMA weights = 1.5x raw weights for every converted parameter
    _, raw, _ = load_model_for_inference(out, use_ema=False)
    ratios = jax.tree.leaves(jax.tree.map(
        lambda e, r: float(jnp.max(jnp.abs(e - 1.5 * r)))
        if jnp.issubdtype(e.dtype, jnp.floating) and e.size else 0.0,
        {"score": params["score"]}, {"score": raw["score"]}))
    assert max(ratios) < 1e-5

    # the converted dir is servable
    mix = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((1, T)).astype(np.float32) * 0.1)
    est = model.enhance(params, mix, jax.random.PRNGKey(0))
    assert np.asarray(est).shape == (1, T)
