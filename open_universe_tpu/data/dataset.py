"""Paired noisy/clean folder dataset with manifest cache.

Parity targets:
  - reference ``NoisyDataset`` (dataset_original/static_dataset.py:38-159):
    paired folders per split, random crop / tile to ``audio_len`` for
    train, full length + key for test;
  - combo2 additions (datasets/static_dataset_combo2.py:29-207): min/max
    length filtering, manifest cache (thread-pool header scan), transcript
    loading with <not-available> skip, ``part_used`` subsetting, pad-to-
    fixed-length with a valid-sample mask.
"""
import json
import math
import os
import random
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Optional

import numpy as np

from .wavio import read_wav, wav_info


class NoisyDataset:
    def __init__(
        self,
        audio_path,
        split: str = "train",
        fs: int = 16000,
        audio_len: Optional[float] = None,   # crop/tile length (train)
        length_mode: str = "crop",           # crop (orig) | pad (combo2)
        min_len_sec: float = 0.0,
        max_len_sec: Optional[float] = None,
        noisy_folder: str = "noisy",
        clean_folder: str = "clean",
        text_path: Optional[str] = None,
        part_used: float = 1.0,
        skip_no_text: bool = False,
        use_manifest: bool = True,
        rng: Optional[random.Random] = None,
    ):
        root = Path(audio_path) / split
        self.noisy_path = root / noisy_folder
        self.clean_path = root / clean_folder
        self.clean_available = self.clean_path.exists()
        self.fs = fs
        self.split = split
        self.length_mode = length_mode
        self.audio_len = int(audio_len * fs) if audio_len else None
        self.min_len = int(min_len_sec * fs)
        self.max_len = int(max_len_sec * fs) if max_len_sec else None
        self.text_path = Path(text_path) if text_path else None
        self.skip_no_text = skip_no_text
        self.rng = rng or random.Random(0)

        files = sorted(os.listdir(self.noisy_path))
        if self.clean_available:
            files = sorted(set(files) & set(os.listdir(self.clean_path)))
        if part_used < 1.0:
            files = files[: max(1, int(len(files) * part_used))]

        manifest = root / f"{split}_manifest.json"
        if use_manifest and manifest.exists():
            with open(manifest) as f:
                entries = json.load(f)
            known = {e[0]: e[1] for e in entries}
            scan = [f for f in files if f in known]
            lengths = [known[f] for f in scan]
        else:
            def probe(f):
                try:
                    return f, wav_info(self.noisy_path / f)["num_frames"]
                except Exception:
                    return f, None

            with ThreadPoolExecutor(max_workers=min(32, os.cpu_count() or 1)
                                    ) as pool:
                results = list(pool.map(probe, files))
            results = [(f, n) for f, n in results if n is not None]
            scan = [f for f, _ in results]
            lengths = [n for _, n in results]
            if use_manifest:
                with open(manifest, "w") as f:
                    json.dump(list(zip(scan, lengths)), f)

        self.file_list, self.lengths = [], []
        for f, n in zip(scan, lengths):
            if n < self.min_len:
                continue
            if self.max_len is not None and n > self.max_len:
                continue
            if self.skip_no_text and self.text_path is not None:
                txt = self.text_path / f"{Path(f).stem}.txt"
                if not txt.exists() or txt.read_text().strip() == "<not-available>":
                    continue
            self.file_list.append(f)
            self.lengths.append(n)

    def __len__(self):
        return len(self.file_list)

    def _load(self, p):
        wav, sr = read_wav(p)
        if sr != self.fs:
            from scipy.signal import resample_poly
            g = math.gcd(sr, self.fs)
            wav = resample_poly(wav, self.fs // g, sr // g, axis=0
                                ).astype(np.float32)
        return wav  # (T, C)

    def __getitem__(self, idx):
        fn = self.file_list[idx]
        key = Path(fn).stem
        noisy = self._load(self.noisy_path / fn)
        clean = (self._load(self.clean_path / fn) if self.clean_available
                 else np.zeros_like(noisy))

        txt = ""
        if self.text_path is not None:
            p = self.text_path / f"{key}.txt"
            if p.exists():
                txt = p.read_text().strip()

        t = noisy.shape[0]
        if self.split == "test":
            return noisy, clean, key, np.ones(t, np.float32)

        if self.audio_len is not None and self.length_mode == "crop":
            if t < self.audio_len:
                rep = math.ceil(self.audio_len / t)
                noisy = np.tile(noisy, (rep, 1))[: self.audio_len]
                clean = np.tile(clean, (rep, 1))[: self.audio_len]
            else:
                st = self.rng.randint(0, t - self.audio_len)
                noisy = noisy[st : st + self.audio_len]
                clean = clean[st : st + self.audio_len]
            mask = np.ones(self.audio_len, np.float32)
        elif self.audio_len is not None and self.length_mode == "pad":
            if t < self.audio_len:
                pad = self.audio_len - t
                noisy = np.pad(noisy, ((0, pad), (0, 0)))
                clean = np.pad(clean, ((0, pad), (0, 0)))
                mask = np.concatenate([np.ones(t, np.float32),
                                       np.zeros(pad, np.float32)])
            else:
                noisy = noisy[: self.audio_len]
                clean = clean[: self.audio_len]
                mask = np.ones(self.audio_len, np.float32)
        else:
            mask = np.ones(t, np.float32)

        return noisy, clean, txt, mask
