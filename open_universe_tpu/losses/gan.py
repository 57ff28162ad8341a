"""LS-GAN losses (HiFi-GAN style).

Parity target: reference ``feature_loss`` / ``discriminator_loss`` /
``generator_loss`` (bigvgan/gan.py:287-335).
"""
import jax.numpy as jnp


def feature_loss(fmap_r, fmap_g):
    """2 * sum of mean |real_fmap - gen_fmap| over all maps."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    """LS-GAN: real -> 1, generated -> 0."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r = jnp.mean((1.0 - dr) ** 2)
        g = jnp.mean(dg**2)
        loss = loss + r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """LS-GAN generator: generated -> 1."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses
