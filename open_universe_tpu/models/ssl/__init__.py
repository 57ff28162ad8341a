"""Frozen SSL speech backbones (WavLM) — JAX forward + torch converters."""
from .wavlm import WavLMConfig, convert_wavlm_state_dict, wavlm_forward

__all__ = ["WavLMConfig", "convert_wavlm_state_dict", "wavlm_forward"]
