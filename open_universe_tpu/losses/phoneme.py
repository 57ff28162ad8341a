"""Phoneme-posterior and SSL-feature perceptual losses (weights-gated).

Parity targets: reference ``PhonemePredictor`` / ``PhonemeLoss`` /
``PhonemeCTCLoss`` / ``PhonemeEmbeddingLoss``
(losses/phoneme_loss.py:33-214, wav2vec2-espeak CTC) and ``WavLMLMOSLoss``
(losses/wavlm_loss.py:8, WavLM feature distance).

TPU-native design: the backbone is a *Flax* wav2vec2 from ``transformers``
(fully differentiable inside the jit'ed train step — unlike the
reference's torch side-model). Pretrained weights must exist locally
(zero-egress image); constructors raise a clear error otherwise and the
trainers treat these as optional aux losses.
"""
from typing import Optional

import jax
import jax.numpy as jnp


def _load_flax_wav2vec2(model_path: str, for_ctc: bool):
    try:
        if for_ctc:
            from transformers import FlaxWav2Vec2ForCTC
            return FlaxWav2Vec2ForCTC.from_pretrained(
                model_path, local_files_only=True)
        from transformers import FlaxWav2Vec2Model
        return FlaxWav2Vec2Model.from_pretrained(
            model_path, local_files_only=True)
    except Exception as e:
        raise RuntimeError(
            f"phoneme/SSL loss needs local pretrained weights at "
            f"'{model_path}' (zero-egress environment): {e}") from e


class PhonemeLoss:
    """KL divergence between phone posteriors of estimate and target.

    (reference PhonemeLoss: KL(softmax(logits_tgt) || softmax(logits_est)))
    """

    def __init__(self, model_path: str =
                 "facebook/wav2vec2-lv-60-espeak-cv-ft"):
        self.model = _load_flax_wav2vec2(model_path, for_ctc=True)

    def __call__(self, est, target):
        """est/target: (B, T) waveforms at 16 kHz."""
        le = self.model(est).logits
        lt = self.model(target).logits
        pt = jax.nn.softmax(lt, axis=-1)
        return jnp.mean(jnp.sum(
            pt * (jax.nn.log_softmax(lt, axis=-1)
                  - jax.nn.log_softmax(le, axis=-1)), axis=-1))


class PhonemeEmbeddingLoss:
    """L1 distance between wav2vec2 hidden features (reference
    PhonemeEmbeddingLoss / WavLMLMOSLoss analogue)."""

    def __init__(self, model_path: str = "facebook/wav2vec2-base",
                 layer: Optional[int] = None):
        self.model = _load_flax_wav2vec2(model_path, for_ctc=False)
        self.layer = layer

    def __call__(self, est, target):
        fe = self.model(est, output_hidden_states=self.layer is not None)
        ft = self.model(target, output_hidden_states=self.layer is not None)
        if self.layer is not None:
            a = fe.hidden_states[self.layer]
            b = ft.hidden_states[self.layer]
        else:
            a, b = fe.last_hidden_state, ft.last_hidden_state
        return jnp.mean(jnp.abs(a - b))


class PhonemeCTCLoss:
    """CTC loss of the estimate's logits against target phone ids."""

    def __init__(self, model_path: str =
                 "facebook/wav2vec2-lv-60-espeak-cv-ft"):
        self.model = _load_flax_wav2vec2(model_path, for_ctc=True)

    def __call__(self, est, phone_ids, logit_pad_mask=None,
                 label_pad_mask=None):
        import optax

        logits = self.model(est).logits
        b, t, _ = logits.shape
        if logit_pad_mask is None:
            logit_pad_mask = jnp.zeros((b, t), bool)
        if label_pad_mask is None:
            label_pad_mask = phone_ids == 0
        return jnp.mean(optax.ctc_loss(
            logits, logit_pad_mask.astype(jnp.float32), phone_ids,
            label_pad_mask.astype(jnp.float32)))
