"""24 kHz mel front-end golden parity.

The reference hardcodes ``sample_rate=24000`` inside ``MelAdapter``
(condition.py:75-81) regardless of the data rate, so the 24 kHz
configuration (config/model/_old/universepp_24k.yaml:16-34 —
rate_factors [2,3,5,8] => ds 240, n_fft 960, hop 240, n_mels 128) is
the one geometry where the mel filterbank actually matches its nominal
rate — and where a silent parity break in padding / filterbank / global
normalization would go unnoticed by the 16 kHz suites. This pins
``conditioner_mel_spec`` at the exact 24 kHz shapes against the
reference's own ``MelAdapter.compute_mel_spec`` (condition.py:92-106)
run through the in-image torch harness.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = [
    pytest.mark.skipif(not Path("/root/reference/open_universe").exists(),
                       reason="reference tree not mounted"),
    pytest.mark.slow,
    pytest.mark.parity,
]

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(Path(__file__).parent))
from ref_harness import load_reference  # noqa: E402

from open_universe_tpu.models.universe.condition import (  # noqa: E402
    conditioner_mel_spec,
)

# 24 kHz config geometry (universepp_24k.yaml): ds = 2*3*5*8 = 240,
# oversample 4 => n_fft 960, hop 240, 128 mels
DS, OVERSAMPLE, N_MELS = 240, 4, 128


@pytest.mark.parametrize("t", [48000, 48000 + 100])  # 2 s; + non-multiple
def test_mel_adapter_24k_parity(t):
    mods = load_reference()
    ref_adapter = mods["condition"].MelAdapter(
        n_mels=N_MELS, output_channels=8, ds_factor=DS,
        oversample=OVERSAMPLE)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, t)).astype(np.float32)

    with torch.no_grad():
        ref = ref_adapter.compute_mel_spec(
            torch.from_numpy(x)[:, None, :]).numpy()  # (B, n_mels, F)

    ours = conditioner_mel_spec(jnp.asarray(x)[..., None], N_MELS, DS,
                                OVERSAMPLE)  # (B, F, n_mels)
    ours = np.asarray(ours).transpose(0, 2, 1)

    assert ours.shape == ref.shape
    # golden tolerance matches the full-size network parity suites
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)


def test_mel_adapter_24k_frame_rate():
    # frames land exactly at the x240 latent rate, the contract the
    # conditioner encoder sum relies on (reference condition.py:92-98)
    x = jnp.zeros((1, 48000, 1))
    m = conditioner_mel_spec(x + 1e-3, N_MELS, DS, OVERSAMPLE)
    assert m.shape == (1, 48000 // DS, N_MELS)
