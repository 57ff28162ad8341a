"""LR schedules.

Parity target: reference ``LinearWarmupCosineAnnealingLR``
(utils/schedulers.py:25-104): linear warmup eta_min -> lr over T_warmup,
hold until T_cosine, cosine anneal to eta_min at T_max.

NOTE on step units: the reference steps its schedulers twice per batch in
the GAN path (universe_gan.py:232-233 + 303-304), so T_* are in
"scheduler steps" = 2 x batches. The trainer passes the appropriately
scaled step count.
"""
import jax.numpy as jnp


def linear_warmup_cosine_annealing(base_lr: float, t_warmup: int,
                                   t_cosine: int, t_max: int,
                                   eta_min: float = 0.0):
    def schedule(step):
        # clamp: past t_max the schedule stays at eta_min. Without this
        # the cosine keeps evolving and the LR CYCLES back up toward
        # base_lr (observed in the round-4 quality run: the schedule hit
        # t_max at batch 15000 and the logged lr then climbed 0 -> 1e-4
        # by batch 17500, silently turning the tail of the run into
        # warm restarts).
        step = jnp.minimum(jnp.asarray(step, jnp.float32), float(t_max))
        warm = eta_min + (base_lr - eta_min) * step / max(t_warmup, 1)
        num = step - t_cosine
        denom = max(t_max - t_cosine, 1)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * num / denom))
        lr = jnp.where(step <= t_warmup, warm,
                       jnp.where(step <= t_cosine, base_lr, cos))
        return lr

    return schedule
