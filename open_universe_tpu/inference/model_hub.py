"""Model-source resolution: serve reference-published checkpoints directly.

Parity target: reference ``inference_utils/model_loader.py:33-133`` —
``load_model`` accepts a local ckpt OR a HuggingFace model id
(``line-corporation/open-universe:plusplus``), fetching ``weights.ckpt``
+ ``config.yaml``. Here ``resolve_model_source`` maps any of

  1. one of OUR checkpoint dirs (config.yaml + step_*/ or last.json),
  2. a hub-layout dir holding the reference's torch ``weights.ckpt``
     (+ ``config.yaml``),
  3. a path to a reference ``*.ckpt`` file (hydra config discovered
     next to it, model_loader.py:33-51 rules),
  4. a hub spec ``repo_id[:revision]`` resolved against a local cache
     (``$OPEN_UNIVERSE_HUB_CACHE``, default
     ``~/.cache/open_universe_tpu/hub``), downloading via
     ``huggingface_hub`` only if available (zero-egress images just
     pre-place the two files in the cache),

onto a servable checkpoint dir for ``load_model_for_inference``. Torch
checkpoints are converted once through ``bin/convert_checkpoint`` (EMA
shadows aligned, weight norm preserved) and cached beside the source.
"""
import os
from pathlib import Path

CACHE_ENV = "OPEN_UNIVERSE_HUB_CACHE"


def _default_cache() -> Path:
    return Path(os.environ.get(
        CACHE_ENV, Path.home() / ".cache" / "open_universe_tpu" / "hub"))


def _is_our_ckpt_dir(p: Path) -> bool:
    # run dirs (last.json / step_N) and standalone best-snapshots
    # (snapshot_best: best/ + best.json, no last pointer) both qualify
    return (p / "config.yaml").exists() and (
        (p / "last.json").exists() or (p / "best.json").exists()
        or any(p.glob("step_*")))


def _convert_cached(ckpt_file: Path, config_path=None) -> Path:
    """Convert a reference torch ckpt once; reuse while it's unchanged."""
    from ..bin.convert_checkpoint import convert

    out = ckpt_file.parent / f".converted_tpu_{ckpt_file.stem}"
    stamp = out / ".source_mtime"
    mtime = str(ckpt_file.stat().st_mtime_ns)
    if stamp.exists() and stamp.read_text() == mtime \
            and _is_our_ckpt_dir(out):
        return out
    convert(ckpt_file, out, config_path=config_path)
    stamp.write_text(mtime)
    return out


def resolve_model_source(spec) -> Path:
    """See module docstring. Returns a dir for load_model_for_inference."""
    p = Path(spec)
    if p.is_dir():
        if _is_our_ckpt_dir(p):
            return p
        for name in ("weights.ckpt", "last.ckpt"):
            if (p / name).exists():
                cfg = p / "config.yaml"
                return _convert_cached(p / name,
                                       cfg if cfg.exists() else None)
        raise FileNotFoundError(
            f"{p} is neither one of our checkpoint dirs nor a hub-layout "
            f"dir (weights.ckpt)")
    if p.is_file() and p.suffix == ".ckpt":
        return _convert_cached(p)

    # hub spec repo_id[:revision]
    spec = str(spec)
    repo_id, _, revision = spec.partition(":")
    revision = revision or "main"
    if "/" not in repo_id:
        raise FileNotFoundError(f"model source not found: {spec}")
    cache = _default_cache() / repo_id.replace("/", "--") / revision
    ckpt, cfg = cache / "weights.ckpt", cache / "config.yaml"
    if not ckpt.exists():
        try:
            from huggingface_hub import hf_hub_download
        except ImportError as e:
            raise FileNotFoundError(
                f"{spec}: not cached at {cache} and huggingface_hub is "
                f"not installed (zero-egress image?). Place weights.ckpt "
                f"+ config.yaml there to serve this model.") from e
        cache.mkdir(parents=True, exist_ok=True)
        for fname, dst in [("weights.ckpt", ckpt), ("config.yaml", cfg)]:
            got = hf_hub_download(repo_id=repo_id, filename=fname,
                                  revision=revision)
            dst.write_bytes(Path(got).read_bytes())
    return _convert_cached(ckpt, cfg if cfg.exists() else None)
