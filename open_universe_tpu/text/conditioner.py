"""Text conditioning modules: FiLM, cross-attention with RoPE, blending.

Parity targets (reference condition_11May.py):
  - ``FiLM`` (:490-530): gamma/beta linear heads, 300*tanh(x/300) soft
    clamp, learned output scale (init 0.05);
  - ``LatentFiLM`` (:533-545);
  - ``CrossAttentionBlock`` (:291-488): MHA with temperature-scaled q/k,
    key-padding mask, mean-over-head attention map output, cosine
    head-diversity loss, LayerNorm + 4x FFN residual;
  - ``TextConditioner`` (:548-873): FiLM-global on mel features -> RoPE on
    queries -> cross-attention over text tokens (padded values zeroed) ->
    unit-frame-energy renorm -> sigmoid-blend with the original mel
    (learned impact factor, init 0.3) -> magnitude rematch;
  - ``_downsample_boolean_mask`` (:63-81).

All features channels-last (B, T, C).
"""
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import Dense


def downsample_pad_mask(mask, factor: int):
    """mask (B, T) bool True=PAD -> (B, ceil(T/factor)); any pad -> pad."""
    if factor == 1:
        return mask
    b, t = mask.shape
    t_pad = -(-t // factor) * factor
    m = jnp.pad(mask, ((0, 0), (0, t_pad - t)), constant_values=True)
    return jnp.any(m.reshape(b, -1, factor), axis=-1)


def rope(x, base: float = 10000.0):
    """Rotary positional embedding, half-split variant (reference RoPE)."""
    d = x.shape[-1]
    half_a, half_b = x[..., : d // 2], x[..., d // 2:]
    dim_t = jnp.arange(d // 2)
    inv_freq = 1.0 / (base ** (dim_t / (d // 2)))
    pos = jnp.arange(x.shape[-2])[:, None].astype(x.dtype)
    angles = pos * inv_freq[None, :]
    sin, cos = jnp.sin(angles)[None], jnp.cos(angles)[None]
    return jnp.concatenate([half_a * cos - half_b * sin,
                            half_a * sin + half_b * cos], axis=-1)


class FiLMText(nn.Module):
    """scale * (tanh-clamped gamma * x + beta), conditioning (B, D)."""
    feature_channels: int
    init_scale: float = 0.05

    @nn.compact
    def __call__(self, x, cond):
        gamma = Dense(self.feature_channels, name="gamma_fc")(cond)[:, None, :]
        beta = Dense(self.feature_channels, name="beta_fc")(cond)[:, None, :]
        gamma = 300.0 * jnp.tanh(gamma / 300.0)
        beta = 300.0 * jnp.tanh(beta / 300.0)
        scale = self.param("scale",
                           lambda k: jnp.asarray(self.init_scale, jnp.float32))
        return scale * (gamma * x + beta)


class LatentFiLM(nn.Module):
    """FiLM on the latent sequence from the global text embedding."""
    dim: int

    @nn.compact
    def __call__(self, h, global_emb):
        return FiLMText(self.dim, name="film")(h, global_emb)


class CrossAttentionBlock(nn.Module):
    hidden_dim: int
    num_heads: int = 4
    temperature: float = 0.6
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, cond, x_mask=None, cond_mask=None,
                 deterministic: bool = True):
        """x (B,Q,D) queries; cond (B,S,D) text; masks True=PAD.

        Returns (out, attn_map (B,Q,S) mean-over-heads, div_loss)."""
        h, nh = self.hidden_dim, self.num_heads
        d_head = h // nh
        scale = 1.0 / self.temperature

        q = Dense(h, name="q_proj")(x * scale)
        k = Dense(h, name="k_proj")(cond * scale)
        v = Dense(h, name="v_proj")(cond)
        q = q.reshape(x.shape[0], -1, nh, d_head)
        k = k.reshape(cond.shape[0], -1, nh, d_head)
        v = v.reshape(cond.shape[0], -1, nh, d_head)

        logits = jnp.einsum("bqhd,bshd->bhqs", q, k) / math.sqrt(d_head)
        if cond_mask is not None:
            logits = jnp.where(cond_mask[:, None, None, :], -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1)  # (B, H, Q, S)
        if self.dropout > 0 and not deterministic:
            attn = nn.Dropout(self.dropout, name="attn_drop")(
                attn, deterministic=False)
        out = jnp.einsum("bhqs,bshd->bqhd", attn, v).reshape(x.shape[0], -1, h)
        out = Dense(h, name="out_proj")(out)

        y = nn.LayerNorm(name="layer_norm")(x + out)
        f = Dense(4 * h, name="ffn1")(y)
        f = jnp.maximum(f, 0.0)
        f = Dense(h, name="ffn2")(f)
        y = nn.LayerNorm(name="layer_norm_ffn")(y + f)

        attn_map = jnp.mean(attn, axis=1)  # (B, Q, S)

        # cosine head-diversity loss (reference "UPD 8 MAY")
        if nh > 1:
            a = attn.reshape(attn.shape[0], nh, -1)
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=2, keepdims=True),
                                1e-8)
            sim = jnp.einsum("bhx,bgx->bhg", a, a)
            triu = jnp.triu(jnp.ones((nh, nh)), k=1)
            div_loss = jnp.sum(sim * triu[None]) / jnp.maximum(
                jnp.sum(triu) * sim.shape[0], 1.0)
        else:
            div_loss = jnp.zeros(())
        return y, attn_map, div_loss


class TextConditioner(nn.Module):
    """Applies text conditioning to mel features (B, T_mel, C_total)."""
    total_channels: int
    cross_attention_dim: int = 512
    num_heads: int = 8
    attention_temperature: float = 0.6

    @nn.compact
    def __call__(self, x_mel, global_emb, seq_emb, text_pad_mask,
                 q_pad_mask=None, deterministic: bool = True):
        """Returns (x_mel_conditioned, attn_map, div_loss)."""
        x_orig = x_mel

        # zero value vectors of padded tokens (condition_11May.py:688)
        seq_emb = jnp.where(text_pad_mask[..., None], 0.0, seq_emb)

        # reference replaces x_mel by the (scaled) FiLM output, not residual
        x = FiLMText(self.total_channels, name="film_global")(x_mel,
                                                              global_emb)

        if self.total_channels != self.cross_attention_dim:
            x = Dense(self.cross_attention_dim, name="mel_to_attn")(x)
        x = rope(x)
        if q_pad_mask is not None:
            x = jnp.where(q_pad_mask[..., None], 0.0, x)

        x, attn_map, div_loss = CrossAttentionBlock(
            self.cross_attention_dim, self.num_heads,
            self.attention_temperature,
            name="cross_attention")(x, seq_emb, x_mask=q_pad_mask,
                                    cond_mask=text_pad_mask,
                                    deterministic=deterministic)
        if self.total_channels != self.cross_attention_dim:
            x = Dense(self.total_channels, name="attn_to_mel")(x)

        # unit average frame energy (condition_11May.py:857-858)
        norm = jnp.sqrt(jnp.mean(jnp.sum(x**2, axis=-1, keepdims=True),
                                 axis=-2, keepdims=True))
        x = x / jnp.maximum(norm, 1e-5)

        impact = self.param("text_impact_factor",
                            lambda k: jnp.asarray(0.3, jnp.float32))
        blend = jax.nn.sigmoid(impact)
        x_mel = (1.0 - blend) * x_orig + blend * x

        # magnitude rematch per (B, T) position over channels
        new_norm = jnp.linalg.norm(x_mel, axis=-1, keepdims=True)
        old_norm = jnp.linalg.norm(x_orig, axis=-1, keepdims=True)
        x_mel = x_mel * (old_norm / jnp.maximum(new_norm, 1e-8))

        return x_mel, attn_map, div_loss
