"""Guided-attention + coverage losses for text conditioning.

Parity target: reference ``_guided_attn_loss``
(universe_gan_NS_11May.py:211-289): multi-scale (narrow + wide) Gaussian
diagonal guide with adaptive slope S/Q and per-sample sigma scaling,
masked to valid (frame, token) cells, normalized by valid-cell count and
min(Q, S); plus the token coverage loss (:632-660): |sum_frames attn - 1|
over real tokens.
"""
import jax.numpy as jnp


def guided_attention_loss(attn, q_valid, s_valid, sigma: float = 0.15):
    """attn (B, Q, S) softmax weights; masks True = VALID."""
    b, q, s = attn.shape
    ratio = s / (q + 1e-5)
    q_pos = jnp.linspace(0.0, 1.0, q)[None, :, None]
    s_pos = jnp.linspace(0.0, 1.0, s)[None, None, :]

    len_ratio = jnp.sqrt(
        jnp.sum(s_valid, axis=1, keepdims=True)
        / (jnp.sum(q_valid, axis=1, keepdims=True) + 1e-5))
    sig_narrow = jnp.maximum(sigma * 0.5 * len_ratio, 0.03)[..., None]
    sig_wide = jnp.maximum(sigma * 2.0 * len_ratio, 0.1)[..., None]

    d2 = (q_pos - s_pos / ratio) ** 2
    guide = (1.0 - jnp.exp(-d2 / (2.0 * sig_narrow**2))
             + 0.5 * (1.0 - jnp.exp(-d2 / (2.0 * sig_wide**2))))

    guide = jnp.where(~s_valid[:, None, :], 0.0, guide)
    valid = q_valid[:, :, None] & s_valid[:, None, :]
    per_ex = (jnp.sum(jnp.where(valid, attn * guide, 0.0), axis=(-2, -1))
              / jnp.maximum(jnp.sum(valid, axis=(-2, -1)), 1.0))
    seq_norm = jnp.maximum(
        jnp.minimum(jnp.sum(q_valid, axis=1), jnp.sum(s_valid, axis=1)), 1.0)
    return jnp.mean(per_ex / seq_norm)


def coverage_loss(attn, s_valid):
    """|sum over frames of attention to each real token - 1|, mean."""
    token_cov = jnp.abs(jnp.sum(attn, axis=1) - 1.0)  # (B, S)
    num = jnp.sum(jnp.where(s_valid, token_cov, 0.0))
    den = jnp.maximum(jnp.sum(s_valid), 1.0)
    return num / den


def phoneme_alignment_loss(attn, coords, coords_valid,
                           slack_frames: float = 2.0):
    """Forced-alignment supervision on the cross-attention map.

    Parity target: the reference's ``align_phoneme`` loss
    (universe_gan_NS_11May_tg.py:595-640): per token, the predicted
    position is the argmax over frames of its attention column; the loss
    is relu(|pred - center| - slack) where ``center`` is the token's
    TextGrid span center in frames, averaged over valid tokens per
    sample, then over samples that have any valid span. Re-designed
    fully vectorized (the reference loops over samples in Python).

    attn (B, Q, S) softmax weights; coords (B, S, 2) span [start, end) in
    FRACTIONS of the utterance (0..1), scaled to frames here;
    coords_valid (B, S) True where a real span exists.
    """
    b, q, s = attn.shape
    pred = jnp.argmax(attn, axis=1).astype(jnp.float32)  # (B, S)
    centers = jnp.mean(coords.astype(jnp.float32), axis=-1) * q  # frames
    diff = jnp.maximum(jnp.abs(pred - centers) - slack_frames, 0.0)
    tok_cnt = jnp.sum(coords_valid, axis=1)  # (B,)
    per_ex = (jnp.sum(jnp.where(coords_valid, diff, 0.0), axis=1)
              / jnp.maximum(tok_cnt, 1.0))
    has_any = tok_cnt > 0
    return (jnp.sum(jnp.where(has_any, per_ex, 0.0))
            / jnp.maximum(jnp.sum(has_any), 1.0))
