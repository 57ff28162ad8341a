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
from ...ops.transforms import CompressedMagSTFT, IdentityTransform
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
class TransformConfig:
    """Spectrogram-domain diffusion (reference universe.py:112-115 +
    layers/dyn_range_comp.py). With ``kind="compressed_mag_stft"`` the
    diffusion runs on compressed complex STFT frames; set the model's
    ``input_channels``/``output_channels`` to 2*(n_fft//2+1) and pick
    ``hop_length == input_channels`` so the conditioner's mel branch
    (hop = tot_ds * input_channels) aligns with the frame rate."""
    kind: str = "compressed_mag_stft"   # "identity" | "compressed_mag_stft"
    n_fft: int = 510
    hop_length: int = 512
    window: str = "hann"
    transform_type: str = "exponent"    # "exponent" | "log" | "none"
    abs_exponent: float = 0.5
    factor: float = 0.15


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
    # spectrogram-domain diffusion; None = waveform domain (the default,
    # matching the reference's IdentityTransform, universe.py:112-113)
    transform: Optional[TransformConfig] = None


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
                config.output_channels, kernel_size=3, padding="same",
                act_type=config.signal_decoupling_act)
        else:
            self.decoupling_net = None

        tc = config.transform
        if tc is None or tc.kind == "identity":
            self.transform = IdentityTransform()
            self.has_transform = False
        elif tc.kind == "compressed_mag_stft":
            self.transform = CompressedMagSTFT(
                tc.n_fft, tc.hop_length, tc.window, tc.transform_type,
                tc.abs_exponent, tc.factor)
            self.has_transform = True
            want = 2 * (tc.n_fft // 2 + 1)
            if config.input_channels != want:
                raise ValueError(
                    f"transform n_fft={tc.n_fft} produces {want} channels "
                    f"but input_channels={config.input_channels}")
        else:
            raise ValueError(f"unknown transform kind {tc.kind}")

    # ---------------------------------------------------------------- init
    def init(self, key, example_len: int = 1600, batch: int = 1):
        ks, kc, kd = jax.random.split(key, 3)
        if self.has_transform:
            wav = jnp.zeros((batch, example_len, 1))
            x, _ = self.apply_transform(wav)
            cond_params = self.cond_net.init(kc, x, x_wav=wav)
            conditions, y_est, _ = self.cond_net.apply(cond_params, x,
                                                       x_wav=wav)
        else:
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

    # ----------------------------------------------------- domain transform
    def apply_transform(self, x, pad_frames: bool = True):
        """Normalized waveform (B, T, 1) -> diffusion domain.

        Identity: returns (x, T). Spectral: compressed-STFT frames padded
        to a ``tot_ds`` multiple so the U-Nets' strided pyramid divides
        evenly; returns (frames (B, NF', 2F), NF) with NF the unpadded
        frame count (reference transforms at universe.py:274 but relies on
        the waveform pad for divisibility — frame-domain padding is the
        TPU-correct equivalent for static shapes).
        """
        if not self.has_transform:
            return x, x.shape[-2]
        x_t = self.transform(x)
        nf = x_t.shape[-2]
        if pad_frames:
            fpad = -nf % self.tot_ds
            x_t = jnp.pad(x_t, ((0, 0), (0, fpad), (0, 0)))
        return x_t, nf

    def inverse_transform(self, x_t, n_frames: int, length: int):
        """Diffusion domain -> waveform (reference universe.py:346)."""
        if not self.has_transform:
            return x_t
        return self.transform.inv(x_t[:, :n_frames], length=length)

    def diffusion_len(self, t: int) -> int:
        """Time length of the diffusion state for a length-``t`` waveform
        (samples in the waveform domain; tot_ds-padded STFT frames in the
        spectral domain)."""
        if not self.has_transform:
            return t
        nf = self.transform.n_frames(t)
        return nf + (-nf % self.tot_ds)

    # ------------------------------------------------------------- applies
    def apply_cond(self, params, x, x_wav=None, train: bool = True):
        return self.cond_net.apply({"params": params["cond"]}, x,
                                   x_wav=x_wav, train=train)

    def apply_score_raw(self, params, x, sigma, cond,
                        cond_projected: bool = False):
        return self.score_net.apply({"params": params["score"]}, x, sigma,
                                    cond, cond_projected=cond_projected)

    def project_score_cond(self, params, cond):
        """Apply the score decoder's per-level signal-cond 1x1 convs.

        The conditioner output is constant across sampler steps, so this
        projection is loop-invariant: ``enhance()`` runs it once and calls
        the score net with ``cond_projected=True``, keeping the projection
        reads/writes out of the 8-step hot loop."""
        return self.score_net.apply({"params": params["score"]}, cond,
                                    method="project_cond")

    def score_fn(self, params, cond_projected: bool = False):
        """Score function with optional EDM parameterization."""
        raw = lambda x, s, c: self.apply_score_raw(
            params, x, s, c, cond_projected=cond_projected)
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
        noise=None,
    ):
        """Enhance a noisy mixture. mix: (T,), (B, T) or (B, T, 1).

        ``noise`` is the parity-test hook forwarded to
        ``reverse_sde_sample`` (identical-noise comparison against the
        reference sampler); it is not exposed on the CLI."""
        x_ndim = mix.ndim
        if x_ndim == 1:
            mix = mix[None, :, None]
        elif x_ndim == 2:
            mix = mix[:, :, None]
        if target is not None:  # oracle target follows mix's conventions
            if target.ndim == 1:
                target = target[None, :, None]
            elif target.ndim == 2:
                target = target[:, :, None]

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

        # spectrogram-domain diffusion (reference universe.py:274-276; the
        # reference discards the transformed target — a latent bug in its
        # unused oracle+transform combination — we transform it for real)
        mix_wav = mix
        mix, n_frames = self.apply_transform(mix)
        if target is not None:
            target, _ = self.apply_transform(target)

        cond, aux_signal, _ = self.apply_cond(params, mix, x_wav=mix_wav,
                                              train=True)

        if use_aux_signal:
            x = self.aux_to_wav(params, aux_signal)
        else:
            if target is not None:
                snr = 5.0 if fake_score_snr is None else fake_score_snr
                score_fn = make_oracle_score_fn(target, snr)
                oracle = True
            else:
                # hoist the loop-invariant signal-cond projections out of
                # the sampler scan (see project_score_cond)
                cond = self.project_score_cond(params, cond)
                score_fn = self.score_fn(params, cond_projected=True)
                oracle = False
            aux = (self.aux_to_wav(params, aux_signal)
                   if warm_start is not None else None)
            x = reverse_sde_sample(
                score_fn, cond, mix.shape, key, self.cfg.diffusion,
                n_steps=n_steps, epsilon=epsilon, warm_start=warm_start,
                aux_signal=aux, oracle_uses_key=oracle, noise=noise)

        # back to the waveform domain (reference universe.py:346)
        x = self.inverse_transform(x, n_frames, mix_wav.shape[-2])

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
