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
