"""Text encoder producing global + per-token embeddings.

Parity target: the reference's PL-BERT ``TextEncoder``
(textencoder_11May.py:34-238): frozen backbone -> LayerNorm -> projection
heads fc_global / fc_seq, returning (global_emb, seq_emb, key_pad_mask).

Since PL-BERT weights can't be fetched in this environment, the backbone
here is a self-contained trainable transformer encoder over token ids
(phoneme or character); the head structure and output contract match the
reference so a PL-BERT backbone can be swapped in by feeding its hidden
states through the same heads.
"""
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import Dense


class TransformerLayer(nn.Module):
    hidden: int
    heads: int = 4
    ffn_mult: int = 4

    @nn.compact
    def __call__(self, x, pad_mask=None):
        h = self.hidden
        d_head = h // self.heads
        q = Dense(h, name="q")(x).reshape(x.shape[0], x.shape[1],
                                          self.heads, d_head)
        k = Dense(h, name="k")(x).reshape(x.shape[0], x.shape[1],
                                          self.heads, d_head)
        v = Dense(h, name="v")(x).reshape(x.shape[0], x.shape[1],
                                          self.heads, d_head)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d_head)
        if pad_mask is not None:
            logits = jnp.where(pad_mask[:, None, None, :], -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(x.shape)
        out = Dense(h, name="o")(out)
        x = nn.LayerNorm(name="ln1")(x + out)
        f = Dense(h * self.ffn_mult, name="ffn1")(x)
        f = jax.nn.gelu(f)
        f = Dense(h, name="ffn2")(f)
        return nn.LayerNorm(name="ln2")(x + f)


class TextEncoder(nn.Module):
    vocab_size: int
    hidden: int = 256
    n_layers: int = 3
    heads: int = 4
    global_dim: int = 512
    seq_dim: int = 512
    max_len: int = 128
    # >= 0 enables the silsp behavior (textencoder_11May_silsp.py:262):
    # the <sil> anchor token is a real token for the backbone's
    # self-attention and the (CLS-like) global pooling, but the returned
    # cross-attention key mask excludes it (key_mask = PAD | sil).
    sil_id: int = -1

    @nn.compact
    def __call__(self, token_ids, pad_mask):
        """token_ids (B, S) int32, pad_mask (B, S) bool True=PAD.

        Returns (global_emb (B, global_dim), seq_emb (B, S, seq_dim),
        key_pad_mask)."""
        key_mask = pad_mask
        if self.sil_id >= 0:
            key_mask = pad_mask | (token_ids == self.sil_id)
        # out-of-vocab ids (tokenizer/model mismatch) clamp to the last id
        # rather than producing garbage embeddings
        token_ids = jnp.clip(token_ids, 0, self.vocab_size - 1)
        emb = nn.Embed(self.vocab_size, self.hidden, name="embed")(token_ids)
        pos = self.param("pos_embed",
                         nn.initializers.truncated_normal(0.02),
                         (1, self.max_len, self.hidden))
        x = emb + pos[:, : token_ids.shape[1], :]
        for i in range(self.n_layers):
            x = TransformerLayer(self.hidden, self.heads,
                                 name=f"layer_{i}")(x, pad_mask)

        # heads mirror the reference (seq_norm/global_norm + fc_seq/fc_global)
        seq = nn.LayerNorm(name="seq_norm")(x)
        seq_emb = Dense(self.seq_dim, name="fc_seq")(seq)

        valid = (~pad_mask).astype(x.dtype)[..., None]
        pooled = jnp.sum(x * valid, axis=1) / jnp.maximum(
            jnp.sum(valid, axis=1), 1.0)
        g = nn.LayerNorm(name="global_norm")(pooled)
        global_emb = Dense(self.global_dim, name="fc_global")(g)
        return global_emb, seq_emb, key_mask
