"""Batch amplitude normalization.

Parity target: reference ``normalize_batch``/``denormalize_batch``
(utils/norm.py:31-91): zero-mean + gain to a target level by std ("2"),
peak ("max") or the min of both ("2-max"); ``ref="both"`` normalizes each
signal separately, otherwise the mix statistics are applied to all.

Tensors are (B, T, C); statistics reduce over (T, C).
"""
import jax.numpy as jnp


def _rms_level(x, eps=1e-5):
    # torch.Tensor.std is UNBIASED (N-1 denominator); match it exactly
    return jnp.maximum(jnp.std(x, axis=(1, 2), keepdims=True, ddof=1), eps)


def _peak_level(x, eps=1e-5):
    return jnp.maximum(
        jnp.max(jnp.abs(x), axis=(1, 2), keepdims=True), eps)


def _target_gain(x, norm, level, eps=1e-5):
    if norm in (2, "2"):
        return level / _rms_level(x, eps)
    if norm == "max":
        return level / _peak_level(x, eps)
    if norm == "2-max":
        return jnp.minimum(level / _rms_level(x, eps), 1.0 / _peak_level(x, eps))
    raise NotImplementedError(f"norm {norm} not implemented")


def normalize_batch(batch, norm=2, level_db=0.0, ref="noisy", eps=1e-5,
                    zero_mean=True):
    """Normalize (mix, *others); returns ((mix, *others), mean, 1/gain)."""
    assert ref in ("noisy", "both")
    level = 10.0 ** (level_db / 20.0)
    mix, *others = batch

    if zero_mean:
        mean = jnp.mean(mix, axis=(1, 2), keepdims=True)
        mix = mix - mean
    else:
        mean = 0.0

    gain = _target_gain(mix, norm, level, eps)
    mix = mix * gain

    out = [mix]
    for tgt in others:
        if tgt is not None:
            if ref == "both":
                if zero_mean:
                    tgt = tgt - jnp.mean(tgt, axis=(1, 2), keepdims=True)
                tgt = tgt * _target_gain(tgt, norm, level, eps)
            else:
                tgt = (tgt - mean) * gain
        out.append(tgt)
    return tuple(out), mean, 1.0 / gain


def denormalize_batch(x, mean, std):
    return x * std + mean
