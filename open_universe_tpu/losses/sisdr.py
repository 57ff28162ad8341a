"""Scale-invariant SDR loss / metric (pure JAX)."""
import jax.numpy as jnp


def si_sdr(est, ref, eps: float = 1e-8):
    """SI-SDR in dB. est/ref: (..., T). Higher is better."""
    ref_zm = ref - jnp.mean(ref, axis=-1, keepdims=True)
    est_zm = est - jnp.mean(est, axis=-1, keepdims=True)
    alpha = (jnp.sum(est_zm * ref_zm, axis=-1, keepdims=True)
             / (jnp.sum(ref_zm**2, axis=-1, keepdims=True) + eps))
    proj = alpha * ref_zm
    noise = est_zm - proj
    ratio = (jnp.sum(proj**2, axis=-1) + eps) / (jnp.sum(noise**2, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio)


def si_sdr_loss(est, ref):
    return -jnp.mean(si_sdr(est, ref))
