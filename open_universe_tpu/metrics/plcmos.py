"""PLCMOS (packet-loss-concealment MOS) ONNX estimator.

Parity target: reference ``PLCMOSEstimator`` (metrics/plcmos/plc_mos.py:12):
the v2 non-intrusive model — Hamming-512 STFT (hop 256, synthesis-style
left zero-pad), log-power features floored at -120 dB and divided by 20,
input shape (1, 1, frames, 257), averaged over ``embed_rounds`` random
rater embeddings drawn with the reference's fixed seed 23.

Runs on onnxruntime when installed, otherwise on the in-repo
``open_universe_tpu.onnxrt`` numpy executor; only the model file
(``plcmos_v2.onnx``, not fetchable in this zero-egress image) is gated.
"""
import math
from pathlib import Path

import numpy as np


def _logpow(spec_amp: np.ndarray, floor: float = -120.0) -> np.ndarray:
    """Log power with -inf flooring (reference plc_mos.py:74-90)."""
    log10e = np.log10(np.e)
    pspec = spec_amp**2
    zeros = pspec == 0
    logp = np.empty_like(pspec)
    if np.any(~zeros):
        logp[~zeros] = np.log(pspec[~zeros])
        logp[zeros] = np.log(pspec[~zeros].min()) + floor / 10 / log10e
    else:
        logp.fill(-80 / 10 / log10e)
    return logp


def stft_features(audio: np.ndarray, dft_size: int = 512,
                  hop_fraction: float = 0.5) -> np.ndarray:
    """The reference's stft_transform (plc_mos.py:138-146): periodic
    Hamming window, synthesis framing (left zero-pad fsize-hsize)."""
    audio = np.asarray(audio, np.float64).reshape(-1)
    window = np.hamming(dft_size + 1)[:-1]
    fsize = dft_size
    hsize = int(fsize * hop_fraction)
    sstart = hsize - fsize  # synth=True framing
    send = len(audio)
    nframe = math.ceil((send - sstart) / hsize)
    zpleft = -sstart
    zpright = (nframe - 1) * hsize + fsize - zpleft - len(audio)
    sig = np.zeros(len(audio) + zpleft + max(zpright, 0))
    sig[zpleft:zpleft + len(audio)] = audio
    frames = np.stack([sig[i * hsize:i * hsize + fsize] * window
                       for i in range(nframe)])
    amp = np.abs(np.fft.rfft(frames, n=dft_size))
    return (_logpow(amp, floor=-120.0) / 20.0).astype(np.float32)


class PLCMOSEstimator:
    def __init__(self, model_dir=None, model_file: str = "plcmos_v2.onnx",
                 embed_rounds: int = 15):
        try:
            import onnxruntime as ort
        except ImportError:
            from .. import onnxrt as ort  # in-repo numpy executor
        model_dir = Path(model_dir) if model_dir else Path(__file__).parent / "models"
        path = model_dir / model_file
        if not path.exists():
            raise RuntimeError(f"PLCMOS model not found: {path}")
        self.sess = ort.InferenceSession(str(path))
        self.embed_rounds = embed_rounds
        self._input_names = {i.name for i in self.sess.get_inputs()}

    def run(self, audio_degraded, sr_degraded: int = 16000) -> float:
        if sr_degraded != 16000:
            raise ValueError("PLCMOS expects 16 kHz audio")
        np.random.seed(23)  # reference parity (plc_mos.py:159)
        feats = stft_features(audio_degraded)[np.newaxis, np.newaxis]
        mos = 0.0
        for _ in range(self.embed_rounds):
            rater_embed = np.random.normal(size=(1, 64))
            inputs = {"degraded_audio": feats}
            if "rater_embed" in self._input_names:
                inputs["rater_embed"] = np.asarray(
                    rater_embed, np.float32).reshape(1, -1)
            mos += float(np.asarray(self.sess.run(None, inputs)[0]).reshape(-1)[0])
        return mos / self.embed_rounds
