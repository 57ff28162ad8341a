"""WAV I/O in pure Python/numpy (no torchaudio/soundfile in this image).

Supports PCM 16/24/32-bit and IEEE float32, mono or multichannel.
``wav_info`` reads only the header (the manifest scan hot path — the
reference uses ``torchaudio.info`` for this, static_dataset_combo2.py:122).
"""
import struct
import wave
from pathlib import Path

import numpy as np


def _native():
    """Prefer the C++ audio runtime (native/audio_io.cpp) when built."""
    try:
        from .. import native
        if native.is_available():
            return native
    except Exception:
        pass
    return None


def read_wav(path):
    """Returns (samples float32 (T, C), sample_rate)."""
    nat = _native()
    if nat is not None:
        try:
            return nat.read_wav(path)
        except Exception:
            pass
    path = str(path)
    with open(path, "rb") as f:
        riff = f.read(12)
        if riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
            raise ValueError(f"not a WAV file: {path}")
        fmt = None
        data = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            if cid == b"fmt ":
                fmt = f.read(size)
                if size % 2:
                    f.read(1)
            elif cid == b"data":
                data = f.read(size)
                if size % 2:
                    f.read(1)
            else:
                f.seek(size + (size % 2), 1)
        if fmt is None or data is None:
            raise ValueError(f"malformed WAV: {path}")
        (audio_fmt, n_ch, fs, _, _, bits) = struct.unpack("<HHIIHH", fmt[:16])
        if audio_fmt == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
            audio_fmt = struct.unpack("<H", fmt[24:26])[0]
        if audio_fmt == 1:  # PCM
            if bits == 16:
                x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
            elif bits == 32:
                x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
            elif bits == 24:
                raw = np.frombuffer(data, np.uint8).reshape(-1, 3)
                x = (raw[:, 0].astype(np.int32)
                     | (raw[:, 1].astype(np.int32) << 8)
                     | (raw[:, 2].astype(np.int32) << 16))
                x = (x << 8 >> 8).astype(np.float32) / 8388608.0
            elif bits == 8:
                x = (np.frombuffer(data, np.uint8).astype(np.float32)
                     - 128.0) / 128.0
            else:
                raise ValueError(f"unsupported PCM bits={bits}")
        elif audio_fmt == 3:  # IEEE float
            if bits == 32:
                x = np.frombuffer(data, "<f4").astype(np.float32)
            elif bits == 64:
                x = np.frombuffer(data, "<f8").astype(np.float32)
            else:
                raise ValueError(f"unsupported float bits={bits}")
        else:
            raise ValueError(f"unsupported WAV format {audio_fmt}")
        if n_ch > 1:
            x = x.reshape(-1, n_ch)
        else:
            x = x.reshape(-1, 1)
        return x, fs


def write_wav(path, samples, fs: int, bits: int = 16):
    """samples: (T,) or (T, C) float in [-1, 1]."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    with wave.open(str(path), "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(bits // 8)
        w.setframerate(fs)
        if bits == 16:
            data = np.clip(x, -1.0, 1.0)
            data = np.round(data * 32767.0).astype("<i2")
        else:
            raise ValueError("only 16-bit write supported")
        w.writeframes(data.tobytes())


def wav_info(path):
    """Header-only probe -> dict(num_frames, sample_rate, num_channels)."""
    nat = _native()
    if nat is not None:
        try:
            return nat.wav_info(path)
        except Exception:
            pass
    with open(str(path), "rb") as f:
        riff = f.read(12)
        if riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
            raise ValueError(f"not a WAV file: {path}")
        fs = n_ch = bits = None
        n_frames = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            if cid == b"fmt ":
                fmt = f.read(size)
                (_, n_ch, fs, _, block_align, bits) = struct.unpack(
                    "<HHIIHH", fmt[:16])
                if size % 2:
                    f.read(1)
            elif cid == b"data":
                if n_ch and bits:
                    n_frames = size // (n_ch * bits // 8)
                f.seek(size + (size % 2), 1)
            else:
                f.seek(size + (size % 2), 1)
        return {"num_frames": n_frames, "sample_rate": fs,
                "num_channels": n_ch}
