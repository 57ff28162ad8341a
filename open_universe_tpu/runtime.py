"""Config-dict -> model/trainer/datamodule builders (the L0 glue).

Replaces the reference's ``hydra.utils.instantiate`` object graph
(train.py:165-178) with explicit builders over our dataclass configs.
"""
from typing import Optional

from .diffusion import DiffusionConfig, EDMConfig
from .models.universe.model import (
    NormalizationConfig,
    TransformConfig,
    UniverseConfig,
    UniverseModel,
)
from .training import GanTrainConfig, GanTrainer, MdnTrainConfig, MdnTrainer


def host_init(init_fn, *args, **kwargs):
    """Run ``init_fn`` on host CPU and pin the result to the accelerator.

    On remote-tunnel TPUs, eager init dispatches hundreds of small ops at
    ~25 ms each (~minutes); CPU init + ONE pinned transfer is ~4x faster.
    The explicit device target matters: ``jax.device_put`` with no target
    leaves a CPU-committed pytree on CPU, so every jit call would re-ship
    the state (and donation could not alias). Call BEFORE enabling the
    Pallas GRU so the init trace never lowers a TPU kernel for CPU."""
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            out = init_fn(*args, **kwargs)
    else:
        out = init_fn(*args, **kwargs)
    # local_devices, not devices: on a multi-host job jax.devices()[0] is
    # rank 0's first device, which other ranks cannot copy to
    return jax.device_put(out, jax.local_devices()[0])


def build_model(model_cfg: dict) -> UniverseModel:
    m = dict(model_cfg)
    diff = DiffusionConfig(**m.pop("diffusion", {}))
    edm_cfg = m.pop("edm", None)
    edm = EDMConfig(**edm_cfg) if edm_cfg else None
    norm = NormalizationConfig(**m.pop("normalization", {}))
    m.pop("seq_model", None)
    text_cfg = m.pop("text", None)
    trans_cfg = m.pop("transform", None)
    transform = TransformConfig(**trans_cfg) if trans_cfg else None
    cfg = UniverseConfig(
        diffusion=diff, edm=edm, normalization=norm, transform=transform,
        **{k: (tuple(v) if isinstance(v, list) else v) for k, v in m.items()})
    if text_cfg:
        from .models.universe.model_text import TextConfig, TextUniverseModel

        text_cfg = dict(text_cfg)
        # `sil_token: true` (silsp variant): the tokenizer appends <sil>
        # as the LAST vocab id, so sil_id == vocab_size - 1 once the
        # vocab_size in the config already accounts for it
        if text_cfg.pop("sil_token", False):
            text_cfg.setdefault("sil_id", text_cfg["vocab_size"] - 1)
        return TextUniverseModel(cfg, TextConfig(**text_cfg))
    return UniverseModel(cfg)


def build_trainer(model: UniverseModel, trainer_cfg: dict):
    t = dict(trainer_cfg)
    kind = t.pop("kind", "gan")
    for k in list(t):
        if isinstance(t[k], list):
            t[k] = tuple(tuple(x) if isinstance(x, list) else x for x in t[k])
    if kind == "gan":
        return GanTrainer(model, GanTrainConfig(**t))
    if kind == "text_gan":
        from .training.text_gan_trainer import (
            TextGanTrainConfig,
            TextGanTrainer,
        )
        return TextGanTrainer(model, TextGanTrainConfig(**t))
    if kind == "mdn":
        return MdnTrainer(model, MdnTrainConfig(**t))
    if kind == "lora":
        return _build_lora_trainer(model, t)
    raise ValueError(f"unknown trainer kind {kind}")


def _build_lora_trainer(model: UniverseModel, t: dict):
    """LoRA fine-tuning from a pretrained checkpoint (reference
    UniverseLoRA flow, train.py -> networks/universe/lora.py:39-121).

    Trainer config keys: ``pretrained_ckpt`` (required), optional
    ``pretrained_use_ema`` and ``losses`` ({name: {weight, window_sz,
    ...}}); the remainder feeds LoraTrainConfig. The model architecture is
    taken from the pretrained checkpoint's config so the adapters always
    match the loaded weights.
    """
    from .losses.combine import MultiLoss
    from .losses.multires_stft import MultiResL1SpecLoss
    from .training.checkpoint import load_model_for_inference
    from .training.lora_trainer import LoraTrainConfig, UniverseLoRATrainer

    pretrained = t.pop("pretrained_ckpt")
    use_ema = t.pop("pretrained_use_ema", True)
    loss_cfg = t.pop("losses", None) or {
        "mrstft": {"weight": 1.0, "window_sz": [512], "time_domain_weight": 0.5}}
    losses = {}
    for name, lc in loss_cfg.items():
        lc = dict(lc)
        weight = lc.pop("weight", 1.0)
        lc = {k: (tuple(v) if isinstance(v, list) else v) for k, v in lc.items()}
        spec = MultiResL1SpecLoss(**lc)
        # MultiLoss calls fn(y_hat, y); MultiResL1SpecLoss is (target, est)
        losses[name] = (weight, lambda y_hat, y, _s=spec: _s(y, y_hat))
    base_model, params, _ = load_model_for_inference(pretrained,
                                                     use_ema=use_ema)
    lora_model = UniverseLoRATrainer.lora_ready_model(base_model)
    return UniverseLoRATrainer(lora_model, params, MultiLoss(losses),
                               LoraTrainConfig(**t))


def build_datamodule(dm_cfg: dict, splits=("train", "val", "test"),
                     shard_rank: int = 0, shard_count: int = 1):
    from .data import DataModule

    d = dict(dm_cfg)
    audio_path = d.pop("audio_path")
    fs = d.pop("fs", 16000)
    audio_len = d.pop("audio_len", None)
    length_mode = d.pop("length_mode", "crop")
    batch_size = d.pop("batch_size", 8)
    num_workers = d.pop("num_workers", 4)
    # batching knobs (reference datamodule_combo2.py modes; batching.py)
    batching = {k: d.pop(k) for k in ("batching_mode", "n_buckets",
                                      "budget_frames", "multiple_of")
                if k in d}
    datasets = {}
    for split in splits:
        dd = dict(d)
        if dd.get("text_path") and "{split}" in str(dd["text_path"]):
            dd["text_path"] = str(dd["text_path"]).format(split=split)
        datasets[split] = dict(
            audio_path=audio_path, split=split, fs=fs,
            audio_len=audio_len if split == "train" else None,
            length_mode=length_mode, **dd)
    return DataModule(datasets=datasets, batch_size=batch_size,
                     num_workers=num_workers, shard_rank=shard_rank,
                     shard_count=shard_count, **batching)
