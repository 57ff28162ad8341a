"""Shared CLI helpers.

Includes the reference's signature->argparse trick
(inference_utils/signature_to_parser.py:26-66): optional keyword
arguments of ``enhance()`` become CLI flags automatically.
"""
import argparse
import inspect
import typing


def add_enhance_arguments(parser: argparse.ArgumentParser, fn,
                          skip=("self", "params", "mix", "key", "target")):
    group = parser.add_argument_group("enhance options")
    sig = inspect.signature(fn)
    for name, p in sig.parameters.items():
        if name in skip:
            continue
        ann = p.annotation
        origin = typing.get_origin(ann)
        if origin is typing.Union:  # Optional[X]
            args = [a for a in typing.get_args(ann) if a is not type(None)]
            ann = args[0] if args else str
        if ann is bool or isinstance(p.default, bool):
            group.add_argument(f"--{name.replace('_', '-')}",
                               action="store_true", default=p.default)
        elif ann in (int, float, str):
            group.add_argument(f"--{name.replace('_', '-')}", type=ann,
                               default=p.default)
    return group


def collect_enhance_kwargs(args, fn, skip=("self", "params", "mix", "key",
                                           "target")):
    sig = inspect.signature(fn)
    out = {}
    for name in sig.parameters:
        if name in skip:
            continue
        if hasattr(args, name):
            out[name] = getattr(args, name)
    return out


def respect_platform_env():
    """Make an explicit JAX_PLATFORMS env var win over the container's
    interpreter-start platform pin.

    The axon image registers its PJRT plugin from sitecustomize and pins
    the platform at interpreter start; only the config-level update (not
    the env var) actually takes effect after that. Every CLI calls this
    before touching devices so e.g. ``JAX_PLATFORMS=cpu python -m
    open_universe_tpu.bin.enhance ...`` runs on CPU as asked (serving
    evals can be dry-run without touching a chip that is busy training).
    """
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass  # backend already initialized; nothing to change
