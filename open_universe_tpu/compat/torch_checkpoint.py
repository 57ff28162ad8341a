"""Reference (torch) checkpoint -> open_universe_tpu params converter.

Maps the reference's ``state_dict`` names (score_model.* /
condition_model.* / signal_decoupling_layer.*, see
open_universe/networks/universe/{score,condition,blocks}.py) onto our
flax parameter tree. Weight-normalized tensors are FOLDED to the
effective weight and re-split into our (v, g) parameterization — this
sidesteps the torch-vs-ours normalization-axis difference for transposed
convs while preserving the function exactly.

Conventions:
  torch Conv1d weight (O, I, W)      -> ours (W, I, O)
  torch ConvTranspose1d (I, O, W)    -> ours (W, I, O)
  torch Linear (O, I)                -> ours (I, O)
  torch GRU weight_ih (3H, in)       -> ours (in, 3H); gate order r,z,n equal
"""
from typing import Dict

import numpy as np


def _np(x):
    # COPY: torch .numpy() shares memory with the tensor, and jnp.asarray
    # on CPU can be zero-copy too — without the copy, in-place updates to
    # the torch module (e.g. optimizer steps in parity tests) would
    # silently mutate the converted params
    if hasattr(x, "detach"):
        return np.array(x.detach().cpu().numpy())
    return np.array(x)


def _fold_wn(sd, prefix):
    """Return the effective conv/linear weight, folding weight norm."""
    if f"{prefix}.weight" in sd:
        return _np(sd[f"{prefix}.weight"]), False
    g = _np(sd[f"{prefix}.weight_g"])
    v = _np(sd[f"{prefix}.weight_v"])
    axes = tuple(range(1, v.ndim))  # torch weight_norm dim=0
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12), True


def _split_wn(kernel):
    """Our parameterization: v = w, g = ||w|| per output channel (last)."""
    axes = tuple(range(kernel.ndim - 1))
    g = np.sqrt(np.sum(kernel * kernel, axis=axes))
    return {"kernel_v": kernel, "kernel_g": g}


def _conv1d(sd, prefix, wn_out: bool):
    w, had_wn = _fold_wn(sd, prefix)
    kernel = np.transpose(w, (2, 1, 0))  # (O,I,W) -> (W,I,O)
    out = _split_wn(kernel) if wn_out else {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _convT1d(sd, prefix, wn_out: bool):
    w, _ = _fold_wn(sd, prefix)
    kernel = np.transpose(w, (2, 0, 1))  # (I,O,W) -> (W,I,O)
    out = _split_wn(kernel) if wn_out else {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _linear(sd, prefix, wn_out: bool):
    w, _ = _fold_wn(sd, prefix)
    kernel = w.T
    out = _split_wn(kernel) if wn_out else {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _prelu_conv(sd, prefix, wn: bool, transpose=False, antialias=False,
                act: str = "prelu"):
    """Reference PReLU_Conv -> our PReLUConv subtree."""
    out = {}
    if act == "prelu":
        out["act"] = {"alpha": _np(sd[f"{prefix}.prelu.weight"])}
    elif act in ("snake", "snakebeta"):
        # AliasFreeSnake: act.act.(alpha|beta)
        snake = {"alpha": _np(sd[f"{prefix}.prelu.act.act.alpha"])}
        if f"{prefix}.prelu.act.act.beta" in sd:
            snake["beta"] = _np(sd[f"{prefix}.prelu.act.act.beta"])
        out["act"] = {"snake": snake}
    conv = (_convT1d if transpose else _conv1d)(sd, f"{prefix}.conv", wn)
    if antialias:
        # manual bias lives on the block, not the conv
        out["bias"] = _np(sd[f"{prefix}.bias"])
        conv.pop("bias", None)
    out["conv"] = conv
    return out


def _conv_block(sd, prefix, wn: bool, rate_dir: str = "none",
                antialias: bool = False, act: str = "prelu"):
    out = {}
    for name in ["conv1", "conv2", "conv3"]:
        out[name] = _prelu_conv(sd, f"{prefix}.{name}", wn, act=act)
    if rate_dir in ("up", "down"):
        out["rate_change_conv"] = _prelu_conv(
            sd, f"{prefix}.rate_change_conv", wn,
            transpose=(rate_dir == "up"), antialias=antialias)
    if f"{prefix}.signal_cond_proj.proj.weight" in sd \
            or f"{prefix}.signal_cond_proj.proj.weight_v" in sd:
        out["signal_cond_proj"] = {
            "proj": _conv1d(sd, f"{prefix}.signal_cond_proj.proj", wn)}
    return out


def _conv2d(sd, prefix, wn_out: bool):
    """torch Conv2d (O,I,KH,KW) -> ours (KH,KW,I,O), folding weight norm."""
    w, _ = _fold_wn(sd, prefix)
    kernel = np.transpose(w, (2, 3, 1, 0))
    out = _split_wn(kernel) if wn_out else {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def convert_discriminators(sd: Dict, periods=(2, 3, 5, 7, 11),
                           resolutions=((1024, 120, 600), (2048, 240, 1200),
                                        (512, 50, 240)),
                           mpd_prefix: str = "loss_mpd",
                           mrd_prefix: str = "loss_mrd"):
    """Reference MPD/MRD state dict (bigvgan/gan.py:21-284) -> our
    {"mpd": ..., "mrd": ...} discriminator params pytree."""
    mpd = {}
    for i, p in enumerate(periods):
        d = {}
        for j in range(5):
            d[f"conv_{j}"] = _conv2d(
                sd, f"{mpd_prefix}.discriminators.{i}.convs.{j}", True)
        d["conv_post"] = _conv2d(
            sd, f"{mpd_prefix}.discriminators.{i}.conv_post", True)
        mpd[f"p{p}"] = d
    mrd = {}
    for i, res in enumerate(resolutions):
        d = {}
        for j in range(5):
            d[f"conv_{j}"] = _conv2d(
                sd, f"{mrd_prefix}.discriminators.{i}.convs.{j}", True)
        d["conv_post"] = _conv2d(
            sd, f"{mrd_prefix}.discriminators.{i}.conv_post", True)
        mrd[f"r{res[0]}_{res[1]}"] = d
    return _to_jnp({"mpd": mpd, "mrd": mrd})


def convert_mdn_loss(sd: Dict, prefix: str):
    """Reference MixtureDensityNetworkLoss (mdn.py:36-157) -> our
    losses.mdn.MixtureDensityNetworkLoss params. torch LayerNorm((C, T))
    affine -> our (T, C) tables."""
    return {"ln_scale": _np(sd[f"{prefix}.layer_norm.weight"]).T,
            "ln_bias": _np(sd[f"{prefix}.layer_norm.bias"]).T,
            "conv": _prelu_conv(sd, f"{prefix}.conv", False)}


def _gru(sd, prefix, num_layers: int):
    out = {}
    for layer in range(num_layers):
        blk = {}
        for d, sfx in [("fwd", ""), ("bwd", "_reverse")]:
            blk[f"{d}_w_ih"] = _np(sd[f"{prefix}.weight_ih_l{layer}{sfx}"]).T
            blk[f"{d}_w_hh"] = _np(sd[f"{prefix}.weight_hh_l{layer}{sfx}"]).T
            blk[f"{d}_b_ih"] = _np(sd[f"{prefix}.bias_ih_l{layer}{sfx}"])
            blk[f"{d}_b_hh"] = _np(sd[f"{prefix}.bias_hh_l{layer}{sfx}"])
        out[f"l{layer}"] = blk
    return out


def _sigma_block(sd, prefix, time_embedding: str):
    if time_embedding == "simple":
        return {"weight": _np(sd[f"{prefix}.weight"]),
                "bias": _np(sd[f"{prefix}.bias"])}
    out = {"freq": _np(sd[f"{prefix}.freq"])}
    for i in (1, 2, 3):
        out[f"layer{i}"] = _linear(sd, f"{prefix}.layer{i}.lin", False)
        out[f"prelu{i}"] = {
            "alpha": _np(sd[f"{prefix}.layer{i}.prelu.weight"])}
    return out


def convert_score_network(sd: Dict, cfg, prefix: str = "score_model"):
    """cfg: UniverseConfig (rate_factors, use_weight_norm, ...)."""
    wn = cfg.use_weight_norm
    aa = cfg.score_antialiasing
    n = len(cfg.rate_factors)
    p = {
        "sigma_block": _sigma_block(sd, f"{prefix}.sigma_block",
                                    cfg.time_embedding),
        "input_conv": _conv1d(sd, f"{prefix}.input_conv", False),
        "prelu": {"alpha": _np(sd[f"{prefix}.prelu.weight"])},
        "output_conv": _prelu_conv(sd, f"{prefix}.output_conv", wn),
    }
    enc = {}
    for i in range(n):
        enc[f"ds_{i}"] = _conv_block(sd, f"{prefix}.encoder.ds_modules.{i}",
                                     wn, "down", antialias=aa)
        enc[f"cond_proj_{i}"] = _linear(
            sd, f"{prefix}.encoder.cond_proj.{i}", wn)
    if cfg.extra_conv_block:
        enc["ds_extra"] = _conv_block(
            sd, f"{prefix}.encoder.ds_modules.{n}", wn)
        enc["cond_proj_extra"] = _linear(
            sd, f"{prefix}.encoder.cond_proj.{n}", wn)
    enc["gru"] = _gru(sd, f"{prefix}.encoder.gru", 1)
    p["encoder"] = enc

    dec = {}
    names = (["extra"] if cfg.extra_conv_block else []) \
        + [f"up_{i}" for i in range(n)]
    for j, name in enumerate(names):
        rate_dir = "none" if name == "extra" else "up"
        dec[name] = _conv_block(sd, f"{prefix}.decoder.up_modules.{j}", wn,
                                rate_dir, antialias=aa)
        dec[f"noise_cond_proj_{name}"] = _linear(
            sd, f"{prefix}.decoder.noise_cond_proj.{j}", wn)
        dec[f"signal_cond_proj_{name}"] = _conv1d(
            sd, f"{prefix}.decoder.signal_cond_proj.{j}", wn)
    p["decoder"] = dec
    return p


def convert_conditioner_network(sd: Dict, cfg,
                                prefix: str = "condition_model"):
    wn = cfg.use_weight_norm
    n = len(cfg.rate_factors)
    p = {
        "input_conv": _conv1d(sd, f"{prefix}.input_conv", wn),
        "input_mel": {
            "conv": _conv1d(sd, f"{prefix}.input_mel.conv", wn),
            "conv_block": _conv_block(
                sd, f"{prefix}.input_mel.conv_block", wn),
        },
    }
    enc = {}
    for i in range(n):
        enc[f"ds_{i}"] = _conv_block(sd, f"{prefix}.encoder.ds_modules.{i}",
                                     wn, "down", antialias=False)
        if i < n - 1:
            enc[f"st_conv_{i}"] = _prelu_conv(
                sd, f"{prefix}.encoder.st_convs.{i}", wn)
    if cfg.extra_conv_block:
        enc["ds_extra"] = _conv_block(
            sd, f"{prefix}.encoder.ds_modules.{n}", wn)
    enc["conv_block1"] = _conv_block(sd, f"{prefix}.encoder.conv_block1", wn)
    enc["conv_block2"] = _conv_block(sd, f"{prefix}.encoder.conv_block2", wn)
    enc["gru"] = _gru(sd, f"{prefix}.encoder.gru", 2)
    p["encoder"] = enc

    dec = {"input_conv_block": _conv_block(
        sd, f"{prefix}.decoder.input_conv_block", wn)}
    names = (["extra"] if cfg.extra_conv_block else []) \
        + [f"up_{i}" for i in range(n)]
    for j, name in enumerate(names):
        rate_dir = "none" if name == "extra" else "up"
        dec[name] = _conv_block(sd, f"{prefix}.decoder.up_modules.{j}", wn,
                                rate_dir, antialias=cfg.cond_antialiasing)
    p["decoder"] = dec

    if f"{prefix}.output_conv.weight" in sd \
            or f"{prefix}.output_conv.weight_v" in sd:
        p["output_conv"] = _conv1d(sd, f"{prefix}.output_conv", wn)
    return p


def convert_reference_state_dict(sd: Dict, cfg):
    """Full reference Universe(GAN) state dict -> our params pytree.

    cfg: UniverseConfig. Returns {"score", "cond"[, "decoupling"]}.
    """
    sd = {k: v for k, v in sd.items()}
    score_prefix = ("_edm_model" if any(k.startswith("_edm_model.")
                                        for k in sd) else "score_model")
    params = {
        "score": convert_score_network(sd, cfg, score_prefix),
        "cond": convert_conditioner_network(sd, cfg),
    }
    dk = "signal_decoupling_layer"
    if any(k.startswith(dk + ".") for k in sd):
        params["decoupling"] = _prelu_conv(
            sd, dk, False, act=cfg.signal_decoupling_act)
    import jax.numpy as jnp
    return {k: _to_jnp(v) for k, v in params.items()}


def _to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)
