"""DNSMOS (and PLCMOS-style) ONNX MOS predictors.

Parity target: reference ``Compute_DNSMOS``
(metrics/dnsmos/dnsmos_local.py:24-252): sig/bak/ovr + p808 ONNX models
over 9-s segments with polynomial calibration. The ONNX graphs run on
onnxruntime when installed, otherwise on the in-repo
``open_universe_tpu.onnxrt`` numpy executor — so only the official model
files (not fetchable in this zero-egress image) remain gated; drop them
into ``model_dir`` and this works with no extra dependencies.
"""
import math
from pathlib import Path

import numpy as np

SAMPLING_RATE = 16000
INPUT_LENGTH = 9.01


class ComputeDNSMOS:
    def __init__(self, model_dir, personalized: bool = False):
        try:
            import onnxruntime as ort
        except ImportError:
            from .. import onnxrt as ort  # in-repo numpy executor
        model_dir = Path(model_dir)
        primary = model_dir / "sig_bak_ovr.onnx"
        p808 = model_dir / "model_v8.onnx"
        if not primary.exists():
            raise RuntimeError(f"DNSMOS model not found: {primary}")
        self.personalized = personalized
        self.sess = ort.InferenceSession(str(primary))
        self.sess_p808 = (ort.InferenceSession(str(p808))
                          if p808.exists() else None)

    @staticmethod
    def _poly_fit(sig, bak, ovr, personalized):
        if personalized:
            p_ovr = np.poly1d([-0.00533021, 0.005101, 1.18058466, -0.11236046])
            p_sig = np.poly1d([-0.01019296, 0.02751166, 1.19576786, -0.24348726])
            p_bak = np.poly1d([-0.04976499, 0.44276479, -0.1644611, 0.96883132])
        else:
            p_ovr = np.poly1d([-0.06766283, 1.11546468, 0.04602535])
            p_sig = np.poly1d([-0.08397278, 1.22083953, 0.0052439])
            p_bak = np.poly1d([-0.13166888, 1.60915514, -0.39604546])
        return p_sig(sig), p_bak(bak), p_ovr(ovr)

    def _mel(self, audio, n_mels=120, frame_size=320, hop=160):
        """p808 input features: librosa-style mel, power_to_db(ref=max),
        (x + 40) / 40 (official dnsmos_local.py audio_melspec)."""
        from ..ops.stft import mel_filterbank
        audio = np.pad(audio, frame_size // 2, mode="reflect")  # center=True
        n_frames = 1 + (len(audio) - frame_size) // hop
        idx = (np.arange(frame_size)[None, :]
               + hop * np.arange(n_frames)[:, None])
        frames = audio[idx] * np.hanning(frame_size + 1)[:-1]
        spec = np.abs(np.fft.rfft(frames, axis=-1))**2
        fb = mel_filterbank(frame_size // 2 + 1, n_mels, SAMPLING_RATE)
        mel = spec @ fb
        db = 10.0 * np.log10(np.maximum(mel, 1e-30)
                             / max(mel.max(), 1e-30))
        db = np.maximum(db, -80.0)  # power_to_db top_db
        return ((db + 40.0) / 40.0).astype(np.float32)

    def __call__(self, audio, fs: int = SAMPLING_RATE):
        audio = np.asarray(audio, np.float32).reshape(-1)
        if fs != SAMPLING_RATE:
            from scipy.signal import resample_poly
            g = math.gcd(fs, SAMPLING_RATE)
            audio = resample_poly(audio, SAMPLING_RATE // g, fs // g)
        need = int(INPUT_LENGTH * SAMPLING_RATE)
        while len(audio) < need:
            audio = np.concatenate([audio, audio])
        hop = SAMPLING_RATE
        n_seg = int(len(audio) / SAMPLING_RATE) - int(INPUT_LENGTH) + 1
        sig, bak, ovr, p808 = [], [], [], []
        for i in range(max(n_seg, 1)):
            seg = audio[i * hop : i * hop + need]
            if len(seg) < need:
                break
            inp = seg[None, :].astype(np.float32)
            raw = self.sess.run(None, {"input_1": inp})[0][0]
            s, b, o = self._poly_fit(raw[0], raw[1], raw[2], self.personalized)
            sig.append(s)
            bak.append(b)
            ovr.append(o)
            if self.sess_p808 is not None:
                feat = self._mel(seg[:-160])[None]
                p808.append(float(np.asarray(self.sess_p808.run(
                    None, {"input_1": feat})[0]).reshape(-1)[0]))
        out = {"SIG": float(np.mean(sig)), "BAK": float(np.mean(bak)),
               "OVRL": float(np.mean(ovr))}
        if p808:
            out["P808_MOS"] = float(np.mean(p808))
        return out
