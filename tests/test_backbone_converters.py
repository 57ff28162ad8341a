"""Torch->flax backbone converter parity (random-init torch modules).

VERDICT round-1 item 5: the gated text/SSL paths need converters so the
reference's actual PL-BERT / WavLM / wav2vec2 weights load the day they
exist locally. Each test random-initializes the torch module at a tiny
config, converts, and checks the flax/JAX forward matches torch.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_wavlm_converter_parity():
    from transformers import WavLMConfig as HFWavLMConfig
    from transformers import WavLMModel

    from open_universe_tpu.models.ssl import (
        WavLMConfig,
        convert_wavlm_state_dict,
        wavlm_forward,
    )

    hf_cfg = HFWavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=[16, 16, 16],
        conv_kernel=[10, 3, 2], conv_stride=[5, 2, 2],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=40, max_bucket_distance=100,
        do_stable_layer_norm=False, feat_extract_norm="group",
        layerdrop=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, activation_dropout=0.0,
        apply_spec_augment=False)
    torch.manual_seed(0)
    tmodel = WavLMModel(hf_cfg).eval()

    cfg = WavLMConfig.from_hf(hf_cfg)
    params = convert_wavlm_state_dict(tmodel.state_dict(), cfg)

    rng = np.random.default_rng(1)
    wav = (rng.standard_normal((2, 1600)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(wav),
                     output_hidden_states=True)
    ours = wavlm_forward(params, jnp.asarray(wav), cfg,
                         output_hidden_states=True)

    assert len(ours) == len(ref.hidden_states)
    for j, (o, r) in enumerate(zip(ours, ref.hidden_states)):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=2e-3,
                                   atol=2e-4, err_msg=f"hidden {j}")


def test_albert_converter_parity():
    from transformers import AlbertConfig, AlbertModel

    from open_universe_tpu.compat.backbones import (
        albert_params_from_torch,
        make_albert_backbone_fn,
    )

    cfg = AlbertConfig(vocab_size=100, embedding_size=16, hidden_size=32,
                       num_hidden_layers=2, num_attention_heads=4,
                       intermediate_size=64, max_position_embeddings=64,
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0,
                       classifier_dropout_prob=0.0)
    torch.manual_seed(2)
    tmodel = AlbertModel(cfg).eval()
    flax_model, params = albert_params_from_torch(tmodel)
    fn = make_albert_backbone_fn(flax_model, params)

    rng = np.random.default_rng(3)
    ids = rng.integers(0, 100, (2, 12)).astype(np.int32)
    pad = np.zeros((2, 12), bool)
    pad[1, 8:] = True
    with torch.no_grad():
        ref = tmodel(input_ids=torch.from_numpy(ids).long(),
                     attention_mask=torch.from_numpy(~pad).long())
    ours = fn(jnp.asarray(ids), jnp.asarray(pad))
    # padded positions may differ (masked out downstream); compare valid
    valid = ~pad
    np.testing.assert_allclose(np.asarray(ours)[valid],
                               ref.last_hidden_state.numpy()[valid],
                               rtol=2e-3, atol=2e-4)


def test_plbert_checkpoint_layout_loader(tmp_path):
    """load_plbert on a synthetic checkpoint in the reference's layout
    (Checkpoint/config.yml + step_N.t7 with module.encoder.* keys)."""
    import yaml
    from transformers import AlbertConfig, AlbertModel

    from open_universe_tpu.compat.backbones import load_plbert

    model_params = dict(vocab_size=80, embedding_size=16, hidden_size=32,
                        num_hidden_layers=1, num_attention_heads=4,
                        intermediate_size=64, max_position_embeddings=64)
    torch.manual_seed(4)
    src = AlbertModel(AlbertConfig(**model_params)).eval()

    log_dir = tmp_path / "Checkpoint"
    log_dir.mkdir()
    yaml.safe_dump({"model_params": model_params,
                    "dataset_params": {"tokenizer": "x"}},
                   open(log_dir / "config.yml", "w"))
    net = {f"module.encoder.{k}": v for k, v in src.state_dict().items()}
    net["module.decoder.junk"] = torch.zeros(3)  # must be ignored
    torch.save({"net": net}, log_dir / "step_100.t7")
    torch.save({"net": {}}, log_dir / "step_50.t7")  # older, not picked

    flax_model, params = load_plbert(tmp_path)
    ids = np.arange(10, dtype=np.int32)[None]
    with torch.no_grad():
        ref = src(input_ids=torch.from_numpy(ids).long())
    out = flax_model(input_ids=jnp.asarray(ids), params=params)
    np.testing.assert_allclose(np.asarray(out.last_hidden_state),
                               ref.last_hidden_state.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_wav2vec2_ctc_converter_parity():
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    from open_universe_tpu.compat.backbones import (
        wav2vec2_params_from_torch,
    )

    cfg = Wav2Vec2Config(
        vocab_size=30, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        conv_dim=[16, 16, 16], conv_kernel=[10, 3, 2],
        conv_stride=[5, 2, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=True,
        feat_extract_norm="layer", layerdrop=0.0, hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, final_dropout=0.0,
        apply_spec_augment=False)
    torch.manual_seed(5)
    tmodel = Wav2Vec2ForCTC(cfg).eval()
    flax_model, params = wav2vec2_params_from_torch(tmodel, for_ctc=True)

    rng = np.random.default_rng(6)
    wav = (rng.standard_normal((2, 1600)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(wav)).logits
    ours = flax_model(jnp.asarray(wav), params=params).logits
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-3,
                               atol=2e-4)


def test_text_encoder_heads_converter():
    from open_universe_tpu.compat.backbones import (
        text_encoder_heads_from_torch,
    )

    torch.manual_seed(7)
    h, gd, sd_dim = 32, 24, 20
    mods = torch.nn.ModuleDict({
        "seq_norm": torch.nn.LayerNorm(h),
        "global_norm": torch.nn.LayerNorm(h),
        "fc_seq": torch.nn.Linear(h, sd_dim),
        "fc_global": torch.nn.Linear(h, gd),
    })
    for p in mods.parameters():
        torch.nn.init.normal_(p, 0, 0.5)
    heads = text_encoder_heads_from_torch(mods.state_dict())

    x = torch.randn(2, 5, h)
    with torch.no_grad():
        seq_ref = mods["fc_seq"](mods["seq_norm"](x))
        pooled = x.mean(1)
        glob_ref = mods["fc_global"](mods["global_norm"](pooled))

    import flax.linen as fnn
    import jax

    xj = jnp.asarray(x.numpy())
    seq = fnn.LayerNorm().apply({"params": heads["seq_norm"]}, xj)
    seq = seq @ heads["fc_seq"]["kernel"] + heads["fc_seq"]["bias"]
    glob = fnn.LayerNorm().apply({"params": heads["global_norm"]},
                                 jnp.mean(xj, axis=1))
    glob = glob @ heads["fc_global"]["kernel"] + heads["fc_global"]["bias"]
    np.testing.assert_allclose(np.asarray(seq), seq_ref.numpy(), rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(glob), glob_ref.numpy(),
                               rtol=2e-3, atol=2e-4)
