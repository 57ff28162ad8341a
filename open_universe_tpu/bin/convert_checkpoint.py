"""Convert a reference (torch Lightning) checkpoint to a servable
open_universe_tpu checkpoint directory.

Usage:
    python -m open_universe_tpu.bin.convert_checkpoint ref.ckpt out_dir \
        [--config hydra_config.yaml] [--no-ema]

This is the migration path for users of the reference: point it at a
`open-universe` training checkpoint (e.g. the HF
``line-corporation/open-universe`` plusplus weights) and the output dir
works with ``bin.enhance --ckpt out_dir`` and ``bin.train`` resume.

Parity notes:
  - Hydra config discovery mirrors ``ckpt_to_config_path``
    (inference_utils/model_loader.py:33-62): looks for config.yaml /
    .hydra/config.yaml beside and above the .ckpt file.
  - EMA handling mirrors ``load_model`` (model_loader.py:118-130): when
    the checkpoint carries a torch_ema state, its ``shadow_params`` (the
    score+conditioner parameters in ``model_parameters()`` order,
    universe.py:130-133) become the EMA weights used for inference.
"""
import argparse
from pathlib import Path


def find_reference_config(ckpt_path: Path):
    """config.yaml discovery like the reference's ckpt_to_config_path."""
    for base in [ckpt_path.parent, *ckpt_path.parents[1:3]]:
        for cand in [base / "config.yaml", base / ".hydra" / "config.yaml"]:
            if cand.exists():
                return cand
    return None


def map_reference_model_config(ref_model_cfg: dict) -> dict:
    """Reference hydra `model:` section -> our model/trainer config dicts."""
    score = ref_model_cfg.get("score_model", {}) or {}
    cond = ref_model_cfg.get("condition_model", {}) or {}
    losses = ref_model_cfg.get("losses", {}) or {}
    norm_kwargs = ref_model_cfg.get("normalization_kwargs", {}) or {}
    training = ref_model_cfg.get("training", {}) or {}

    def _resolve(v, default):
        # hydra interpolations like ${model.score_model.x} can't be
        # resolved here; fall back to the score-model value / default
        if isinstance(v, str) and v.startswith("${"):
            return default
        return v if v is not None else default

    fs = ref_model_cfg.get("fs", 16000)
    n_channels = score.get("n_channels", 32)
    model = {
        "fs": fs,
        "rate_factors": list(score.get("rate_factors", [2, 4, 4, 5])),
        "n_channels": n_channels,
        "n_rff": score.get("n_rff", 32),
        "noise_cond_dim": score.get("noise_cond_dim", 512),
        "fb_kernel_size": score.get("fb_kernel_size", 3),
        "n_mels": _resolve(cond.get("n_mels"), 80),
        "n_mel_oversample": _resolve(cond.get("n_mel_oversample"), 4),
        "extra_conv_block": score.get("extra_conv_block", True),
        "use_weight_norm": score.get("use_weight_norm", True),
        "score_antialiasing": score.get("use_antialiasing", True),
        "cond_antialiasing": _resolve(cond.get("use_antialiasing"), False),
        "encoder_gru_residual": _resolve(
            cond.get("encoder_gru_residual"), True),
        "time_embedding": score.get("time_embedding", "simple"),
        "use_signal_decoupling": losses.get("use_signal_decoupling", True),
        "signal_decoupling_act": losses.get("signal_decoupling_act", "snake"),
        "normalization": {
            "norm": ref_model_cfg.get("normalization_norm", 2),
            "level_db": norm_kwargs.get("level_db", -26.0),
            "ref": norm_kwargs.get("ref", "both"),
        },
        "diffusion": {k: v for k, v in
                      (ref_model_cfg.get("diffusion") or {}).items()
                      if k in ("schedule", "sigma_min", "sigma_max",
                               "n_steps", "epsilon")},
    }
    edm = ref_model_cfg.get("edm")
    if edm and edm.get("noise"):
        model["edm"] = {"noise": edm["noise"],
                        "data_level_db": norm_kwargs.get("level_db", -26.0)}
    weights = losses.get("weights", {}) or {}
    trainer = {
        "kind": "gan",
        "weight_score": weights.get("score", 1.0),
        "weight_mel_l1": weights.get("mel_l1", 45.0),
        "disc_freeze_step": losses.get("disc_freeze_step", 0),
        "ema_decay": training.get("ema_decay", 0.999),
        "time_sampling": training.get("time_sampling", "time_normal_0.95"),
    }
    mpd = losses.get("multi_period_discriminator", {}) or {}
    mrd = losses.get("multi_resolution_discriminator", {}) or {}
    if mpd.get("mpd_reshapes"):
        trainer["mpd_periods"] = list(mpd["mpd_reshapes"])
    if mrd.get("resolutions"):
        trainer["mrd_resolutions"] = [list(r) for r in mrd["resolutions"]]
    return model, trainer


def ema_state_dict(sd: dict, ema: dict) -> dict:
    """Overlay torch_ema shadow params onto the state dict.

    shadow_params follow ``model_parameters()`` order = score-model then
    conditioner parameters (universe.py:130-133). Buffers (torchaudio mel
    window/filterbank) live in the state dict but are NOT parameters, so
    they are skipped when aligning names to shadows.
    """
    shadows = ema["shadow_params"]
    score_prefix = ("_edm_model." if any(k.startswith("_edm_model.")
                                         for k in sd) else "score_model.")
    names = [k for k in sd
             if k.startswith(score_prefix) or k.startswith("condition_model.")]
    if len(names) != len(shadows):
        # known reference buffers: torchaudio mel (fb/win/window),
        # BinomialAntiAlias low_pass_filter.weights, batch-norm stats
        buffer_suffix = (".fb", ".win", ".window", ".num_batches_tracked",
                         ".running_mean", ".running_var",
                         ".low_pass_filter.weights")
        buffer_pat = ("mel_scale", "spectrogram")
        names = [n for n in names
                 if not (n.lower().endswith(buffer_suffix)
                         or any(p in n.lower() for p in buffer_pat))]
    if len(names) != len(shadows):
        raise ValueError(
            f"cannot align EMA shadows: {len(shadows)} shadows vs "
            f"{len(names)} candidate parameters")
    out = dict(sd)
    for n, s in zip(names, shadows):
        out[n] = s
    return out


def convert(ckpt_path, out_dir, config_path=None, use_ema: bool = True,
            datamodule_cfg: dict = None):
    import numpy as np
    import torch
    import yaml

    import jax

    from ..compat import convert_reference_state_dict
    from ..runtime import build_model, build_trainer
    from ..training.checkpoint import save_checkpoint

    ckpt_path = Path(ckpt_path)
    config_path = Path(config_path) if config_path else \
        find_reference_config(ckpt_path)
    if config_path is None:
        raise FileNotFoundError(
            "no reference config.yaml found near the checkpoint; pass "
            "--config explicitly")
    with open(config_path) as f:
        ref_cfg = yaml.safe_load(f)
    ref_model_cfg = ref_cfg.get("model", ref_cfg)

    model_cfg, trainer_cfg = map_reference_model_config(ref_model_cfg)
    data = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = data.get("state_dict", data)

    model = build_model(model_cfg)
    gen_params = convert_reference_state_dict(sd, model.cfg)
    if use_ema and isinstance(data, dict) and "ema" in data:
        sd_ema = ema_state_dict(sd, data["ema"])
        ema_params = convert_reference_state_dict(sd_ema, model.cfg)
        # the decoupling layer is not EMA'd in the reference; keep weights
        if "decoupling" in gen_params:
            ema_params["decoupling"] = gen_params["decoupling"]
        print("converted EMA weights from torch_ema shadow params")
    else:
        ema_params = gen_params

    trainer = build_trainer(model, trainer_cfg)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        state = trainer.init(jax.random.PRNGKey(0),
                             example_len=model.tot_ds * 10, batch=1)
    state = state.replace(gen_params=gen_params,
                          ema=state.ema.replace(params=ema_params))

    cfg = {"name": ref_cfg.get("name", "converted"),
           "model": model_cfg, "trainer": trainer_cfg,
           "datamodule": datamodule_cfg or {"fs": model_cfg["fs"]},
           "run": {"ckpt_dir": str(out_dir), "max_steps": 0}}
    step = int(data.get("global_step", 0)) if isinstance(data, dict) else 0
    save_checkpoint(Path(out_dir), step, jax.device_get(state), config=cfg)
    n = sum(np.prod(np.shape(x)) for x in jax.tree.leaves(gen_params))
    print(f"wrote {out_dir} (step {step}, {int(n):,} generator params)")
    return out_dir


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ckpt", help="reference .ckpt file")
    parser.add_argument("out", help="output checkpoint directory")
    parser.add_argument("--config", default=None,
                        help="reference hydra config.yaml (auto-discovered "
                             "next to the ckpt if omitted)")
    parser.add_argument("--no-ema", action="store_true",
                        help="use raw weights even if EMA state is present")
    args = parser.parse_args(argv)
    convert(args.ckpt, args.out, config_path=args.config,
            use_ema=not args.no_ema)


if __name__ == "__main__":
    main()
