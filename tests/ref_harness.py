"""Shared machinery to load the reference's FULL torch modules.

Loads ``/root/reference/open_universe`` submodules under their real
package name but with a fake parent package (so the heavy root
``__init__`` — datasets/metrics with pesq/onnxruntime deps — never
runs), plus stubs for the unavailable third-party deps:

- ``hydra.utils.instantiate``: a real mini-instantiate resolving the
  ``_target_`` strings used by the reference configs,
- ``omegaconf.OmegaConf``: ``create``/``to_container`` on plain dicts,
- ``pytorch_lightning.LightningModule``: torch.nn.Module + the pieces
  ``training_step``/``enhance`` touch (manual optimization, ``log``
  capture, ``manual_backward``),
- ``torch_ema.ExponentialMovingAverage``: ramped-decay EMA (matching
  torch_ema semantics; unused when ``ema_decay==0``),
- ``torchaudio.transforms``: ``MelSpectrogram`` on torch.stft + our
  filterbank table, and ``Resample`` built from the SAME windowed-sinc
  kernel table as ``open_universe_tpu.ops.resample`` (whose fidelity is
  anchored separately by tests/test_ops_stft.py),
- ``wandb``: inert.

Used by tests/test_pipeline_parity.py for composed-pipeline golden
parity (reference ``Universe.enhance`` universe.py:231-375,
``compute_losses`` universe.py:472-542, ``UniverseGAN.training_step``
universe_gan.py:153-354).
"""
import importlib
import math
import sys
import types
from pathlib import Path

import numpy as np
import torch

REF_ROOT = Path("/root/reference/open_universe")


class AD(dict):
    """Attribute-dict mimicking OmegaConf DictConfig for the accesses the
    reference makes (attribute access raising AttributeError on missing
    keys so ``getattr(cfg, k, default)`` works, plus dict methods)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def ad(obj):
    """Recursively wrap dicts as AD."""
    if isinstance(obj, dict):
        return AD({k: ad(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(ad(v) for v in obj)
    return obj


def unwrap(obj):
    if isinstance(obj, dict):
        return {k: unwrap(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return list(unwrap(v) for v in obj)
    return obj


# ------------------------------------------------------------------ stubs
def _mel_filterbank():
    from open_universe_tpu.ops.stft import mel_filterbank
    return mel_filterbank


class _MelSpectrogram(torch.nn.Module):
    """torchaudio-compatible mel (hann periodic, center=False, power 2,
    htk filterbank) built on torch.stft + our filterbank table."""

    def __init__(self, sample_rate, n_mels, n_fft, hop_length, center=False):
        super().__init__()
        self.n_fft, self.hop = n_fft, hop_length
        fb = _mel_filterbank()(n_fft // 2 + 1, n_mels, sample_rate)
        self.register_buffer("fb", torch.from_numpy(fb))
        self.register_buffer("win", torch.hann_window(n_fft, periodic=True))

    def forward(self, x):
        shape = x.shape
        flat = x.reshape(-1, shape[-1])
        spec = torch.stft(flat, n_fft=self.n_fft, hop_length=self.hop,
                          window=self.win, center=False, return_complex=True)
        power = spec.real**2 + spec.imag**2  # (B, F, frames)
        mel = torch.einsum("bft,fm->bmt", power, self.fb)
        return mel.reshape(shape[:-1] + mel.shape[-2:])


class _Resample(torch.nn.Module):
    """torchaudio.transforms.Resample equivalent, sharing the kernel
    table with open_universe_tpu.ops.resample (hann sinc, width 6,
    rolloff 0.99) so both frameworks resample identically."""

    def __init__(self, orig_freq=1, new_freq=1, **_):
        super().__init__()
        from open_universe_tpu.ops.resample import _sinc_kernel
        kernels, width, orig, new = _sinc_kernel(orig_freq, new_freq)
        self.register_buffer("kernel",
                             torch.from_numpy(np.asarray(kernels))[:, None, :])
        self.width, self.orig, self.new = width, orig, new

    def forward(self, x):
        if self.orig == self.new:
            return x
        shape = x.shape
        flat = x.reshape(-1, 1, shape[-1])
        y = torch.nn.functional.conv1d(
            torch.nn.functional.pad(flat, (self.width,
                                           self.width + self.orig)),
            self.kernel, stride=self.orig)  # (N, new, blocks)
        y = y.transpose(1, 2).reshape(flat.shape[0], -1)
        tgt = int(math.ceil(shape[-1] * self.new / self.orig))
        return y[:, :tgt].reshape(shape[:-1] + (tgt,))


REGISTRY = {}  # _target_ -> callable; filled in load_reference()


def _instantiate(config=None, *args, **kwargs):
    if config is None:
        config = kwargs.pop("config")
    cfg = dict(config)
    target = cfg.pop("_target_")
    call_kw = {k: unwrap(v) for k, v in cfg.items() if not k.startswith("_")}
    call_kw.update({k: v for k, v in kwargs.items()
                    if not k.startswith("_")})
    if target not in REGISTRY:
        mod, _, attr = target.rpartition(".")
        if mod == "torch.nn":
            REGISTRY[target] = getattr(torch.nn, attr)
        elif mod == "torch.optim":
            REGISTRY[target] = getattr(torch.optim, attr)
        else:
            raise KeyError(f"unregistered _target_: {target}")
    return REGISTRY[target](**call_kw)


class _Trainer:
    global_step = 0
    is_last_batch = False
    testing = False
    optimizers = []


class _LightningModule(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.automatic_optimization = True
        self._opts = []
        self._logged = {}
        self._global_step = 0
        self.trainer = _Trainer()

    # --- the pieces the reference touches
    def save_hyperparameters(self, *a, **k):
        pass

    @property
    def device(self):
        return torch.device("cpu")

    @property
    def global_step(self):
        return self._global_step

    @property
    def current_epoch(self):
        return 0

    def optimizers(self):
        return self._opts

    def lr_schedulers(self):
        raise TypeError("no schedulers configured")  # -> has_schedulers=False

    def manual_backward(self, loss, *a, **k):
        loss.backward()

    def log(self, name, value, *a, **k):
        self._logged[name] = (float(value.detach())
                              if torch.is_tensor(value) else float(value))

    def log_dict(self, d, *a, **k):
        for k2, v in d.items():
            self.log(k2, v)


class _TorchEMA:
    """torch_ema.ExponentialMovingAverage semantics (ramped decay)."""

    def __init__(self, parameters, decay):
        self.decay = decay
        self.num_updates = 0
        self.shadow_params = [p.detach().clone() for p in parameters]

    def update(self, parameters=None):
        self.num_updates += 1
        d = min(self.decay,
                (1 + self.num_updates) / (10 + self.num_updates))
        if parameters is not None:
            with torch.no_grad():
                for s, p in zip(self.shadow_params, parameters):
                    s.sub_((1.0 - d) * (s - p))

    def store(self, parameters):
        self._stored = [p.detach().clone() for p in parameters]

    def copy_to(self, parameters):
        for p, s in zip(parameters, self.shadow_params):
            p.data.copy_(s.data)

    def restore(self, parameters):
        for p, s in zip(parameters, self._stored):
            p.data.copy_(s.data)


def _ensure_module(name):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


def install_stubs():
    """Install/refresh the third-party stubs (idempotent; coexists with
    tests/test_reference_parity.py's lighter stubs by mutating them)."""
    hydra = _ensure_module("hydra")
    hu = _ensure_module("hydra.utils")
    hu.instantiate = _instantiate
    hydra.utils = hu

    om = _ensure_module("omegaconf")

    class OmegaConf:
        @staticmethod
        def create(d=None):
            return ad(d or {})

        @staticmethod
        def to_container(cfg, resolve=True):
            return unwrap(cfg)

    om.OmegaConf = OmegaConf
    om.DictConfig = AD

    ta = _ensure_module("torchaudio")
    tt = _ensure_module("torchaudio.transforms")
    tf = _ensure_module("torchaudio.functional")
    tt.MelSpectrogram = _MelSpectrogram
    tt.Resample = _Resample
    ta.transforms = tt
    ta.functional = tf

    pl = _ensure_module("pytorch_lightning")
    pl.LightningModule = _LightningModule

    te = _ensure_module("torch_ema")
    te.ExponentialMovingAverage = _TorchEMA

    wandb = _ensure_module("wandb")
    wandb.Audio = object
    wandb.log = lambda *a, **k: None


def load_reference():
    """Load the reference universe/universe_gan modules; returns a dict of
    modules and fills REGISTRY with the _target_ classes the configs use."""
    install_stubs()
    if "open_universe.networks.universe.universe" in sys.modules:
        return sys.modules["__ref_harness_cache__"].mods

    # fake parents so the heavy package __init__s never run
    root = _ensure_module("open_universe")
    root.__path__ = [str(REF_ROOT)]
    uni_pkg = _ensure_module("open_universe.networks.universe")
    uni_pkg.__path__ = [str(REF_ROOT / "networks" / "universe")]
    uni_pkg.__package__ = "open_universe.networks.universe"

    mods = {}
    for name in [
        "open_universe.utils",
        "open_universe.layers.dyn_range_comp",
        "open_universe.networks.bigvgan",
        "open_universe.networks.universe.blocks",
        "open_universe.networks.universe.sigma_block",
        "open_universe.networks.universe.mdn",
        "open_universe.networks.universe.score",
        "open_universe.networks.universe.condition",
        "open_universe.networks.universe.universe",
        "open_universe.networks.universe.universe_NS",
        "open_universe.networks.universe.universe_gan",
    ]:
        mods[name.rsplit(".", 1)[-1]] = importlib.import_module(name)

    REGISTRY.update({
        "open_universe.networks.universe.ScoreNetwork":
            mods["score"].ScoreNetwork,
        "open_universe.networks.universe.ConditionerNetwork":
            mods["condition"].ConditionerNetwork,
        "open_universe.layers.dyn_range_comp.IdentityTransform":
            mods["dyn_range_comp"].IdentityTransform,
        "open_universe.layers.dyn_range_comp.CompressedMagSTFTPadded":
            mods["dyn_range_comp"].CompressedMagSTFTPadded,
    })

    cache = types.ModuleType("__ref_harness_cache__")
    cache.mods = mods
    sys.modules["__ref_harness_cache__"] = cache
    return mods
