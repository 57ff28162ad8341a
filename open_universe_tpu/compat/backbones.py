"""Torch -> flax converters for the gated conditioning/loss backbones.

Closes the round-1 gap: the heads/adapters existed but there was no way
to load the reference's ACTUAL backbone weights. With these, the day the
weights exist locally the gated paths load them byte-for-byte:

- PL-BERT (an AlbertModel; reference ``textencoder_11May.py:34-238``):
  ``load_plbert`` parses the reference's checkpoint layout
  (``<root>/Checkpoint/config.yml`` + latest ``step_*.t7`` with
  ``module.encoder.``-prefixed keys) into a FlaxAlbertModel.
- wav2vec2 (+CTC head; reference ``losses/phoneme_loss.py:33-214`` and
  ``metrics/lps.py:50-156``): ``wav2vec2_params_from_torch``.
- WavLM has NO flax port in transformers -> dedicated implementation in
  ``models/ssl/wavlm.py`` (gated relative-position-bias attention).

All converters run through transformers' own tensor-name translation
(``convert_pytorch_state_dict_to_flax``) where a flax twin exists, so
layout quirks (time-major convs, embedding transposes) follow the
library's canonical mapping.
"""
from pathlib import Path

import numpy as np


def _to_flax(pt_state_dict, flax_model):
    from transformers.modeling_flax_pytorch_utils import (
        convert_pytorch_state_dict_to_flax,
    )
    # detached copies: .numpy() would share memory with the torch tensors
    sd = {k: v.detach().clone() for k, v in pt_state_dict.items()}
    return convert_pytorch_state_dict_to_flax(sd, flax_model)


def albert_params_from_torch(torch_albert, config=None):
    """torch AlbertModel -> (FlaxAlbertModel, params)."""
    from transformers import FlaxAlbertModel
    cfg = config if config is not None else torch_albert.config
    # _do_init=True: transformers' converter reads flax_model.params for
    # the target tree structure; the random init is discarded
    flax_model = FlaxAlbertModel(cfg)
    return flax_model, _to_flax(torch_albert.state_dict(), flax_model)


def load_plbert(plbert_root):
    """Reference PL-BERT checkpoint layout -> (FlaxAlbertModel, params).

    Mirrors textencoder_11May.py:45-66: ``<root>/Checkpoint/config.yml``
    holds ``model_params`` (AlbertConfig kwargs); the newest
    ``step_<N>.t7`` holds ``{"net": {"module.encoder.<albert keys>"}}``.
    """
    import torch
    import yaml
    from transformers import AlbertConfig, AlbertModel

    log_dir = Path(plbert_root) / "Checkpoint"
    plbert_config = yaml.safe_load(open(log_dir / "config.yml"))
    config = AlbertConfig(**plbert_config["model_params"])
    model = AlbertModel(config)

    ckpts = sorted(log_dir.glob("step_*.t7"),
                   key=lambda p: int(p.stem.split("_")[-1]))
    if not ckpts:
        raise FileNotFoundError(f"no step_*.t7 under {log_dir}")
    ckpt = torch.load(ckpts[-1], map_location="cpu", weights_only=False)
    prefix = "module.encoder."
    sd = {k[len(prefix):]: v for k, v in ckpt["net"].items()
          if k.startswith(prefix) and k[len(prefix):] in model.state_dict()}
    model.load_state_dict(sd, strict=False)
    return albert_params_from_torch(model, config)


def make_albert_backbone_fn(flax_model, params):
    """Returns a jittable ``fn(ids, pad_mask) -> hidden states`` that can
    replace the self-contained transformer in ``text.encoder.TextEncoder``
    (pad_mask: True = PAD, the reference's key_padding_mask convention)."""
    def fn(ids, pad_mask):
        out = flax_model(input_ids=ids,
                         attention_mask=(~pad_mask).astype("int32"),
                         params=params)
        return out.last_hidden_state

    return fn


def wav2vec2_params_from_torch(torch_model, for_ctc: bool = False):
    """torch Wav2Vec2Model / Wav2Vec2ForCTC -> (flax model, params)."""
    from transformers import FlaxWav2Vec2ForCTC, FlaxWav2Vec2Model
    cls = FlaxWav2Vec2ForCTC if for_ctc else FlaxWav2Vec2Model
    # NOTE: transformers' flax wav2vec2 implements only the
    # do_stable_layer_norm=True / feat_extract_norm="layer" family —
    # which is exactly the reference's
    # facebook/wav2vec2-lv-60-espeak-cv-ft phoneme model
    flax_model = cls(torch_model.config)
    return flax_model, _to_flax(torch_model.state_dict(), flax_model)


def text_encoder_heads_from_torch(sd, prefix: str = ""):
    """Reference TextEncoder projection heads (fc_global/fc_seq +
    seq_norm/global_norm, textencoder_11May.py:93-105) -> the matching
    subtree of our ``text.encoder.TextEncoder`` params."""
    def g(name):
        t = sd[f"{prefix}{name}"]
        return np.array(t.detach().cpu().numpy())

    return {
        "seq_norm": {"scale": g("seq_norm.weight"),
                     "bias": g("seq_norm.bias")},
        "global_norm": {"scale": g("global_norm.weight"),
                        "bias": g("global_norm.bias")},
        "fc_seq": {"kernel": g("fc_seq.weight").T,
                   "bias": g("fc_seq.bias")},
        "fc_global": {"kernel": g("fc_global.weight").T,
                      "bias": g("fc_global.bias")},
    }
