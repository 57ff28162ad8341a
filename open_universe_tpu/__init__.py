"""open_universe_tpu — a TPU-native universal speech enhancement framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
``kolyangg/open-universe`` reference (UNIVERSE, arXiv:2206.03065 and
UNIVERSE++, arXiv:2406.12194): diffusion-based universal speech
enhancement with conditioner/score networks, adversarial (HiFi-GAN
style) co-training, mixture-density auxiliary losses, a multi-step
reverse-SDE sampler compiled as a single ``lax.scan``, data pipeline
with bucketed static shapes, and SPMD data parallelism over a
``jax.sharding.Mesh``.

Layer map (mirrors reference SURVEY.md §1):
  - ``ops``       : TPU-friendly primitive layers (convs, GRU, STFT/mel, ...)
  - ``models``    : score / conditioner networks, discriminators
  - ``diffusion`` : sigma schedules, sigma sampling, SDE sampler
  - ``losses``    : MDN, GAN, multi-resolution STFT losses
  - ``training``  : train states, optimizers, EMA, train steps
  - ``parallel``  : mesh construction and sharding rules
  - ``data``      : WAV IO, datasets, bucketed batching
  - ``metrics``   : SI-SDR, LSD, STOI, evaluation wrappers
  - ``bin``       : CLI entry points (train / enhance / eval_metrics)
"""

__version__ = "0.1.0"

# ------------------------------------------------------------------
# Persistent XLA compilation cache: on remote-compile TPU tunnels a
# train-step compile can take minutes; caching executables on disk makes
# every rerun (bench, profiling, resumed training) start instantly.
# Opt out with OUT_JAX_CACHE=0; relocate with OUT_JAX_CACHE=/path.
import os as _os

_cache = _os.environ.get("OUT_JAX_CACHE", "")
# defer to any cache the app already configured (JAX env var wins)
if _cache != "0" and not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    try:
        import jax as _jax

        if not _jax.config.jax_compilation_cache_dir:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _cache or _os.path.join(_os.path.dirname(__file__), "..",
                                        ".jax_cache"))
            _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                               1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
