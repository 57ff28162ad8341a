"""SDR / SI-SDR metrics (numpy, per-file; replaces fast_bss_eval dep)."""
import numpy as np


def si_sdr(est, ref, eps=1e-8):
    """Scale-invariant SDR in dB; est/ref (..., T)."""
    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)
    ref = ref - ref.mean(-1, keepdims=True)
    est = est - est.mean(-1, keepdims=True)
    alpha = (est * ref).sum(-1, keepdims=True) / ((ref**2).sum(-1, keepdims=True)
                                                 + eps)
    proj = alpha * ref
    noise = est - proj
    return 10.0 * np.log10(((proj**2).sum(-1) + eps)
                           / ((noise**2).sum(-1) + eps))


def sdr(est, ref, eps=1e-8):
    """Plain SNR-style SDR in dB (no scale adaptation)."""
    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)
    num = (ref**2).sum(-1)
    den = ((est - ref) ** 2).sum(-1)
    return 10.0 * np.log10((num + eps) / (den + eps))
