"""UNIVERSE(++) model: conditioner + score network + diffusion sampler.

Parity targets: reference ``Universe`` (universe.py:44-886) minus the
Lightning training plumbing (training lives in
``open_universe_tpu.training``): the product API is ``enhance()``
(universe.py:231-375) — pad to a downsampling multiple, normalize,
condition once, run the n-step reverse SDE, unpad/rescale, optional
ensembling — plus the EDM network parameterization (universe.py:175-209)
and the auxiliary "decoupled" signal head used by UNIVERSE++
(universe_gan.py:119-128, 147-151).

Everything here is functional: ``params`` is an explicit pytree
{"score", "cond"[, "decoupling"]} and every method can be jit'ed with
static ``self``.
"""
import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ...diffusion.edm import EDMConfig, make_edm_score_fn
from ...diffusion.sampler import make_oracle_score_fn, reverse_sde_sample
from ...diffusion.schedule import DiffusionConfig
from ...utils.norm import normalize_batch
from ...utils.stats import signal_median
from .blocks import PReLUConv
from .condition import ConditionerNetwork
from .score import ScoreNetwork


@dataclasses.dataclass(frozen=True)
class NormalizationConfig:
    norm: object = 2           # 2 | "max" | "2-max"
    level_db: float = -26.0
    ref: str = "both"


@dataclasses.dataclass(frozen=True)
class UniverseConfig:
    """UNIVERSE++ 16 kHz defaults (config/model/default.yaml)."""
    fs: int = 16000
    rate_factors: Sequence[int] = (2, 4, 4, 5)
    n_channels: int = 32
    n_rff: int = 32
    noise_cond_dim: int = 512
    n_mels: int = 80
    n_mel_oversample: int = 4
    extra_conv_block: bool = True
    use_weight_norm: bool = True
    score_antialiasing: bool = True
    cond_antialiasing: bool = False
    encoder_gru_residual: bool = True
    time_embedding: str = "simple"
    fb_kernel_size: int = 3
    input_channels: int = 1
    output_channels: int = 1
    diffusion: DiffusionConfig = DiffusionConfig()
    edm: Optional[EDMConfig] = EDMConfig()
    # UNIVERSE++ decoupling head (set False for original UNIVERSE/MDN)
    use_signal_decoupling: bool = True
    signal_decoupling_act: str = "snake"
    normalization: NormalizationConfig = NormalizationConfig()


class UniverseModel:
    """Bundles the networks and exposes functional model-level ops."""

    def __init__(self, config: UniverseConfig = UniverseConfig()):
        self.cfg = config
        self.tot_ds = int(math.prod(config.rate_factors))
        self.latent_n_channels = (
            2 ** len(config.rate_factors) * config.n_channels)

        self.score_net = ScoreNetwork(
            fb_kernel_size=config.fb_kernel_size,
            rate_factors=tuple(config.rate_factors),
            n_channels=config.n_channels,
            n_rff=config.n_rff,
            noise_cond_dim=config.noise_cond_dim,
            extra_conv_block=config.extra_conv_block,
            input_channels=config.input_channels,
            output_channels=config.output_channels,
            use_weight_norm=config.use_weight_norm,
            use_antialiasing=config.score_antialiasing,
            time_embedding=config.time_embedding,
        )
        self.cond_net = ConditionerNetwork(
            fb_kernel_size=config.fb_kernel_size,
            rate_factors=tuple(config.rate_factors),
            n_channels=config.n_channels,
            n_mels=config.n_mels,
            n_mel_oversample=config.n_mel_oversample,
            encoder_gru_residual=config.encoder_gru_residual,
            extra_conv_block=config.extra_conv_block,
            input_channels=config.input_channels,
            use_weight_norm=config.use_weight_norm,
            use_antialiasing=config.cond_antialiasing,
        )
        if config.use_signal_decoupling:
            self.decoupling_net = PReLUConv(
                1, kernel_size=3, padding="same",
                act_type=config.signal_decoupling_act)
        else:
            self.decoupling_net = None

    # ---------------------------------------------------------------- init
    def init(self, key, example_len: int = 1600, batch: int = 1):
        ks, kc, kd = jax.random.split(key, 3)
        x = jnp.zeros((batch, example_len, self.cfg.input_channels))
        cond_params = self.cond_net.init(kc, x)
        conditions, y_est, _ = self.cond_net.apply(cond_params, x)
        sigma = jnp.full((batch,), 1.0)
        score_params = self.score_net.init(ks, x, sigma, conditions)
        params = {"score": score_params["params"],
                  "cond": cond_params["params"]}
        if self.decoupling_net is not None:
            dp = self.decoupling_net.init(kd, y_est)
            params["decoupling"] = dp["params"]
        return params

    # ------------------------------------------------------------- applies
    def apply_cond(self, params, x, x_wav=None, train: bool = True):
        return self.cond_net.apply({"params": params["cond"]}, x,
                                   x_wav=x_wav, train=train)

    def apply_score_raw(self, params, x, sigma, cond):
        return self.score_net.apply({"params": params["score"]}, x, sigma,
                                    cond)

    def score_fn(self, params):
        """Score function with optional EDM parameterization."""
        raw = lambda x, s, c: self.apply_score_raw(params, x, s, c)
        if self.cfg.edm is not None:
            return make_edm_score_fn(raw, self.cfg.edm)
        return raw

    def aux_to_wav(self, params, y_aux):
        if self.decoupling_net is not None:
            return self.decoupling_net.apply(
                {"params": params["decoupling"]}, y_aux)
        return y_aux

    def compute_mel_spec(self, x):
        """Normalized mel via the conditioner's MelAdapter (no params)."""
        from .condition import conditioner_mel_spec
        c = self.cfg
        return conditioner_mel_spec(x, c.n_mels,
                                    self.tot_ds * c.input_channels,
                                    c.n_mel_oversample)

    # ----------------------------------------------------------- pad utils
    def pad(self, x, pad: Optional[int] = None):
        if pad is None:
            pad = self.tot_ds - x.shape[-2] % self.tot_ds
        x = jnp.pad(x, ((0, 0), (pad // 2, pad - pad // 2), (0, 0)))
        return x, pad

    def unpad(self, x, pad: int):
        return x[:, pad // 2 : x.shape[-2] - (pad - pad // 2), :]

    def normalize_batch(self, batch):
        n = self.cfg.normalization
        return normalize_batch(batch, norm=n.norm, level_db=n.level_db,
                               ref=n.ref)

    # -------------------------------------------------------------- enhance
    def enhance(
        self,
        params,
        mix,
        key,
        n_steps: Optional[int] = None,
        epsilon: Optional[float] = None,
        target=None,
        fake_score_snr: Optional[float] = None,
        use_aux_signal: bool = False,
        keep_rms: bool = False,
        ensemble: Optional[int] = None,
        ensemble_stat: str = "median",
        warm_start: Optional[int] = None,
    ):
        """Enhance a noisy mixture. mix: (T,), (B, T) or (B, T, 1)."""
        x_ndim = mix.ndim
        if x_ndim == 1:
            mix = mix[None, :, None]
        elif x_ndim == 2:
            mix = mix[:, :, None]

        mix_rms = jnp.sqrt(jnp.mean(mix**2, axis=(-2, -1), keepdims=True))

        base_shape = mix.shape
        if ensemble is not None:
            mix = jnp.broadcast_to(mix[None], (ensemble,) + mix.shape)
            mix = mix.reshape((-1,) + base_shape[1:])

        mix_len = mix.shape[-2]
        mix, pad = self.pad(mix)
        if target is not None:
            target, _ = self.pad(target, pad=pad)

        (mix, target), *_ = self.normalize_batch((mix, target))

        cond, aux_signal, _ = self.apply_cond(params, mix, train=True)

        if use_aux_signal:
            x = self.aux_to_wav(params, aux_signal)
        else:
            if target is not None:
                snr = 5.0 if fake_score_snr is None else fake_score_snr
                score_fn = make_oracle_score_fn(target, snr)
                oracle = True
            else:
                score_fn = self.score_fn(params)
                oracle = False
            aux = (self.aux_to_wav(params, aux_signal)
                   if warm_start is not None else None)
            x = reverse_sde_sample(
                score_fn, cond, mix.shape, key, self.cfg.diffusion,
                n_steps=n_steps, epsilon=epsilon, warm_start=warm_start,
                aux_signal=aux, oracle_uses_key=oracle)

        x = self.unpad(x, pad)
        t = x.shape[-2]
        if t < mix_len:
            x = jnp.pad(x, ((0, 0), (0, mix_len - t), (0, 0)))

        if keep_rms:
            x_rms = jnp.maximum(
                jnp.sqrt(jnp.mean(x**2, axis=(-2, -1), keepdims=True)), 1e-5)
            if ensemble is not None:
                rms = jnp.broadcast_to(mix_rms[None],
                                       (ensemble,) + mix_rms.shape)
                rms = rms.reshape((-1,) + mix_rms.shape[1:])
            else:
                rms = mix_rms
            x = x * (rms / x_rms)

        scale = jnp.max(jnp.abs(x), axis=-2, keepdims=True)
        x = jnp.where(scale > 1.0, x / jnp.maximum(scale, 1e-12), x)

        if ensemble is not None:
            x = x.reshape((ensemble,) + base_shape)
            if ensemble_stat == "mean":
                x = jnp.mean(x, axis=0)
            elif ensemble_stat == "median":
                x = jnp.median(x, axis=0)
            elif ensemble_stat == "signal_median":
                x = signal_median(x)
            else:
                raise NotImplementedError(ensemble_stat)

        if x_ndim == 1:
            x = x[0, :, 0]
        elif x_ndim == 2:
            x = x[:, :, 0]
        return x
