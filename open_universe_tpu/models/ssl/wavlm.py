"""WavLM backbone, JAX-native forward + torch state-dict converter.

Parity target: ``transformers.models.wavlm.modeling_wavlm.WavLMModel``
(the reference's WavLM conditioning backbone,
``universe_wavlm/condition_wv2.py:25``, and the ``WavLMLMOSLoss``
feature extractor, ``losses/wavlm_loss.py:8``). WavLM is NOT
weight-compatible with wav2vec2 — its attention adds a gated relative
position bias (T5-style buckets + a per-position sigmoid gate computed
from the query), so a dedicated implementation is required.

Architecture (wavlm-base, feat_extract_norm="group",
do_stable_layer_norm=False — post-LN):
  raw wav (B, T)
  -> 7-layer conv feature encoder (stride 320 total, GroupNorm on conv0)
  -> LayerNorm + linear projection to hidden
  -> + positional conv embedding (grouped conv k=128, weight-normed)
  -> LayerNorm
  -> N post-LN transformer layers with gated relative position bias
     (bias embedding lives on layer 0 and is shared by all layers)

The forward is a pure jittable function of (params, wav); the backbone
is frozen in every use here (conditioning / LMOS loss), so no flax
module machinery is needed. Weights come from
``convert_wavlm_state_dict`` on a torch ``WavLMModel.state_dict()``
(handles both legacy ``weight_g/weight_v`` and new
``parametrizations.weight.original0/1`` weight-norm layouts).
"""
import dataclasses
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf(cls, hf_config):
        return cls(
            hidden_size=hf_config.hidden_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            conv_dim=tuple(hf_config.conv_dim),
            conv_kernel=tuple(hf_config.conv_kernel),
            conv_stride=tuple(hf_config.conv_stride),
            conv_bias=hf_config.conv_bias,
            num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=(
                hf_config.num_conv_pos_embedding_groups),
            num_buckets=hf_config.num_buckets,
            max_bucket_distance=hf_config.max_bucket_distance,
            layer_norm_eps=hf_config.layer_norm_eps,
        )


# ----------------------------------------------------------------- forward
def _layer_norm(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def _conv1d(x, w, b=None, stride=1, padding=0, groups=1):
    """x (B, T, C_in), w (K, C_in/groups, C_out)."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups)
    if b is not None:
        y = y + b
    return y


def _relative_position_buckets(q_len, k_len, num_buckets, max_distance):
    """T5-style log buckets (WavLMAttention._relative_positions_bucket)."""
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    rel_large = np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
    rel_large = rel_large / math.log(max_distance / max_exact)
    rel_large = (max_exact + rel_large * (nb - max_exact)).astype(np.int64)
    rel_large = np.minimum(rel_large, nb - 1)
    buckets += np.where(is_small, rel, rel_large)
    return buckets  # (q_len, k_len) int


def _attention(x, p, position_bias, n_heads):
    """Gated relative-position-bias self-attention (WavLMAttention)."""
    b, t, h = x.shape
    d = h // n_heads
    scale = d ** -0.5

    def proj(name):
        return x @ p[name]["weight"] + p[name]["bias"]

    q = proj("q_proj").reshape(b, t, n_heads, d)
    k = proj("k_proj").reshape(b, t, n_heads, d)
    v = proj("v_proj").reshape(b, t, n_heads, d)

    # gate from the (unprojected) hidden states, per head
    gh = x.reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)  # (B, H, T, d)
    rp = gh @ p["gru_rel_pos_linear"]["weight"] \
        + p["gru_rel_pos_linear"]["bias"]                   # (B, H, T, 8)
    rp = rp.reshape(b, n_heads, t, 2, 4).sum(-1)            # (B, H, T, 2)
    gate = jax.nn.sigmoid(rp)
    gate_a, gate_b = gate[..., 0:1], gate[..., 1:2]         # (B, H, T, 1)
    gate_out = gate_a * (gate_b * p["gru_rel_pos_const"] - 1.0) + 2.0
    gated_bias = gate_out * position_bias[None]             # (B, H, Tq, Tk)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale + gated_bias
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, h)
    return out @ p["out_proj"]["weight"] + p["out_proj"]["bias"]


def wavlm_forward(params, wav, cfg: WavLMConfig = WavLMConfig(),
                  output_hidden_states: bool = False):
    """wav (B, T) float -> last hidden state (B, T', hidden)
    (or the tuple of all hidden states when requested)."""
    eps = cfg.layer_norm_eps
    x = wav[..., None]  # (B, T, 1)

    # feature encoder
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        cp = params["conv_layers"][i]
        x = _conv1d(x, cp["conv"]["weight"], cp["conv"].get("bias"),
                    stride=s)
        if i == 0 and "group_norm" in cp:
            # GroupNorm(groups=C) == per-channel norm over time
            mu = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
            x = (x - mu) / jnp.sqrt(var + eps)
            x = x * cp["group_norm"]["weight"] + cp["group_norm"]["bias"]
        x = jax.nn.gelu(x, approximate=False)

    # feature projection
    fp = params["feature_projection"]
    x = _layer_norm(x, fp["layer_norm"], eps)
    x = x @ fp["projection"]["weight"] + fp["projection"]["bias"]

    # positional conv embedding (grouped, same-pad; drop last if k even)
    pc = params["pos_conv"]
    pos = _conv1d(x, pc["weight"], pc["bias"],
                  padding=cfg.num_conv_pos_embeddings // 2,
                  groups=cfg.num_conv_pos_embedding_groups)
    if cfg.num_conv_pos_embeddings % 2 == 0:
        pos = pos[:, :-1]
    x = x + jax.nn.gelu(pos, approximate=False)
    x = _layer_norm(x, params["encoder_layer_norm"], eps)

    # shared position bias from layer 0's bucket embedding
    t = x.shape[1]
    buckets = jnp.asarray(_relative_position_buckets(
        t, t, cfg.num_buckets, cfg.max_bucket_distance))
    bias = params["rel_attn_embed"][buckets]           # (Tq, Tk, H)
    position_bias = jnp.transpose(bias, (2, 0, 1))     # (H, Tq, Tk)

    hiddens = [x]
    for lp in params["layers"]:
        attn_out = _attention(x, lp["attention"], position_bias,
                              cfg.num_attention_heads)
        x = _layer_norm(x + attn_out, lp["layer_norm"], eps)
        ff = x @ lp["intermediate_dense"]["weight"] \
            + lp["intermediate_dense"]["bias"]
        ff = jax.nn.gelu(ff, approximate=False)
        ff = ff @ lp["output_dense"]["weight"] + lp["output_dense"]["bias"]
        x = _layer_norm(x + ff, lp["final_layer_norm"], eps)
        hiddens.append(x)
    if output_hidden_states:
        return tuple(hiddens)
    return x


# --------------------------------------------------------------- converter
def _np(x):
    return np.array(x.detach().cpu().numpy()) if hasattr(x, "detach") \
        else np.array(x)


def _lin(sd, prefix):
    return {"weight": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def _ln(sd, prefix):
    return {"weight": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def convert_wavlm_state_dict(sd, cfg: WavLMConfig = WavLMConfig()):
    """torch WavLMModel.state_dict() -> params pytree for wavlm_forward."""
    sd = dict(sd)
    conv_layers = []
    for i in range(len(cfg.conv_kernel)):
        pre = f"feature_extractor.conv_layers.{i}"
        cl = {"conv": {"weight": np.transpose(
            _np(sd[f"{pre}.conv.weight"]), (2, 1, 0))}}
        if f"{pre}.conv.bias" in sd:
            cl["conv"]["bias"] = _np(sd[f"{pre}.conv.bias"])
        if f"{pre}.layer_norm.weight" in sd:
            cl["group_norm"] = _ln(sd, f"{pre}.layer_norm")
        conv_layers.append(cl)

    # positional conv: weight-normed (dim=2); fold g*v/||v|| to the weight
    pc_pre = "encoder.pos_conv_embed.conv"
    if f"{pc_pre}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{pc_pre}.parametrizations.weight.original0"])
        v = _np(sd[f"{pc_pre}.parametrizations.weight.original1"])
    else:
        g = _np(sd[f"{pc_pre}.weight_g"])
        v = _np(sd[f"{pc_pre}.weight_v"])
    norm = np.sqrt(np.sum(v * v, axis=(0, 1), keepdims=True))  # dim=2
    w = g * v / np.maximum(norm, 1e-12)          # (O, I/g, K)
    pos_conv = {"weight": np.transpose(w, (2, 1, 0)),
                "bias": _np(sd[f"{pc_pre}.bias"])}

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}"
        att = {n: _lin(sd, f"{pre}.attention.{n}_proj")
               for n in ("q", "k", "v", "out")}
        att = {f"{n}_proj": att[n] for n in att}
        att["gru_rel_pos_linear"] = _lin(
            sd, f"{pre}.attention.gru_rel_pos_linear")
        # (1, H, 1, 1) -> broadcastable (H, 1, 1) applied as (B, H, T, 1)
        att["gru_rel_pos_const"] = _np(
            sd[f"{pre}.attention.gru_rel_pos_const"])[0]
        layers.append({
            "attention": att,
            "layer_norm": _ln(sd, f"{pre}.layer_norm"),
            "intermediate_dense": _lin(
                sd, f"{pre}.feed_forward.intermediate_dense"),
            "output_dense": _lin(sd, f"{pre}.feed_forward.output_dense"),
            "final_layer_norm": _ln(sd, f"{pre}.final_layer_norm"),
        })

    params = {
        "conv_layers": conv_layers,
        "feature_projection": {
            "layer_norm": _ln(sd, "feature_projection.layer_norm"),
            "projection": _lin(sd, "feature_projection.projection"),
        },
        "pos_conv": pos_conv,
        "encoder_layer_norm": _ln(sd, "encoder.layer_norm"),
        "rel_attn_embed": _np(
            sd["encoder.layers.0.attention.rel_attn_embed.weight"]),
        "layers": layers,
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_wavlm(model_path: str):
    """Load a local torch WavLM checkpoint dir -> (params, WavLMConfig).

    Makes the reference's ``microsoft/wavlm-base(-plus)`` conditioning
    backbone loadable the day its weights are present locally."""
    from transformers import WavLMConfig as HFConfig
    from transformers import WavLMModel
    hf = WavLMModel.from_pretrained(model_path, local_files_only=True)
    cfg = WavLMConfig.from_hf(
        HFConfig.from_pretrained(model_path, local_files_only=True))
    return convert_wavlm_state_dict(hf.state_dict(), cfg), cfg
