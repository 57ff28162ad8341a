"""Data pipeline tests: WAV IO, dataset, bucketing, datamodule."""
import numpy as np
import pytest

from open_universe_tpu.data import (
    BucketBatcher,
    DataModule,
    NoisyDataset,
    make_buckets,
    read_wav,
    wav_info,
    write_wav,
)


@pytest.fixture(scope="module")
def wav_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("vb")
    rng = np.random.default_rng(0)
    fs = 16000
    lengths = [8000, 12000, 16000, 20000, 24000, 40000]
    for split in ["train", "val", "test"]:
        for d in ["noisy", "clean"]:
            (root / split / d).mkdir(parents=True, exist_ok=True)
        for i, t in enumerate(lengths):
            clean = 0.1 * np.sin(2 * np.pi * 440 * np.arange(t) / fs)
            noise = 0.05 * rng.standard_normal(t)
            write_wav(root / split / "clean" / f"f{i}.wav", clean, fs)
            write_wav(root / split / "noisy" / f"f{i}.wav", clean + noise, fs)
    return root, fs, lengths


def test_wav_roundtrip(tmp_path):
    x = np.clip(np.random.default_rng(1).standard_normal(1000) * 0.1, -1, 1)
    write_wav(tmp_path / "a.wav", x, 16000)
    y, fs = read_wav(tmp_path / "a.wav")
    assert fs == 16000
    assert y.shape == (1000, 1)
    np.testing.assert_allclose(y[:, 0], x, atol=1.0 / 16000)
    info = wav_info(tmp_path / "a.wav")
    assert info["num_frames"] == 1000
    assert info["sample_rate"] == 16000
    assert info["num_channels"] == 1


def test_dataset_crop_and_manifest(wav_tree):
    root, fs, lengths = wav_tree
    ds = NoisyDataset(root, split="train", fs=fs, audio_len=1.0,
                      length_mode="crop")
    assert len(ds) == len(lengths)
    noisy, clean, txt, mask = ds[0]  # 8000 samples -> tiled to 16000
    assert noisy.shape == (16000, 1)
    assert clean.shape == (16000, 1)
    assert mask.shape == (16000,)
    # manifest cache was written and reloads
    ds2 = NoisyDataset(root, split="train", fs=fs, audio_len=1.0)
    assert ds2.lengths == ds.lengths


def test_dataset_length_filter(wav_tree):
    root, fs, lengths = wav_tree
    ds = NoisyDataset(root, split="train", fs=fs, min_len_sec=0.6,
                      max_len_sec=1.6)
    kept = [l for l in lengths if 0.6 * fs <= l <= 1.6 * fs]
    assert sorted(ds.lengths) == sorted(kept)


def test_dataset_test_split(wav_tree):
    root, fs, lengths = wav_tree
    ds = NoisyDataset(root, split="test", fs=fs)
    noisy, clean, key, mask = ds[0]
    assert key == "f0"
    assert noisy.shape[0] == lengths[0]


def test_make_buckets():
    lengths = [100, 200, 300, 1000, 5000, 5100]
    bounds = make_buckets(lengths, n_buckets=3, multiple_of=160)
    assert all(b % 160 == 0 for b in bounds)
    assert bounds[-1] >= 5100
    assert bounds == sorted(bounds)


def test_bucket_batcher_static_shapes():
    lengths = [100, 150, 300, 320, 800, 810, 805, 790]
    bounds = [320, 960]
    b = BucketBatcher(lengths, bounds, batch_size=2)
    batches = b.epoch_batches(0)
    seen = set()
    for bi, idxs in batches:
        assert len(idxs) == 2  # short batches are repeated up to bs
        seen.update(idxs)
        for i in idxs:
            assert lengths[i] <= bounds[bi]
    assert seen == set(range(len(lengths)))


def test_bucket_batcher_fixed_mode():
    # reference "fixed" mode: no length grouping, one static shape
    lengths = [100, 150, 300, 320, 800, 810, 805, 790]
    b = BucketBatcher(lengths, [320, 960], batch_size=3, mode="fixed")
    batches = b.epoch_batches(0)
    seen = set()
    for bi, idxs in batches:
        assert bi == 1  # every batch padded to the largest bound
        assert len(idxs) == 3
        seen.update(idxs)
    assert seen == set(range(len(lengths)))


def test_bucket_batcher_anchor_mode():
    # reference "bucket_bs_random": anchor + nearest-length window
    lengths = [100, 110, 120, 300, 310, 320, 800, 810, 805, 790]
    b = BucketBatcher(lengths, [320, 960], batch_size=2,
                      mode="bucket_bs_random", seed=3)
    batches = b.epoch_batches(0)
    seen = []
    for bi, idxs in batches:
        assert len(idxs) == 2
        seen.extend(idxs)
        for i in idxs:
            assert lengths[i] <= b.bounds[bi]
    # every sample appears exactly once (10 samples / bs 2 = 5 batches)
    assert sorted(seen) == list(range(len(lengths)))
    # batches group near lengths: no batch spans the short and long groups
    for bi, idxs in batches:
        ls = sorted(lengths[i] for i in idxs)
        assert ls[-1] - ls[0] < 500


def test_bucket_batcher_unknown_mode():
    import pytest as _pytest
    b = BucketBatcher([100], [100], mode="nope")
    with _pytest.raises(ValueError):
        b.epoch_batches(0)


def test_bucket_batcher_sharding():
    lengths = [100] * 16
    b0 = BucketBatcher(lengths, [100], batch_size=2, shard_rank=0,
                       shard_count=2, shuffle=False)
    b1 = BucketBatcher(lengths, [100], batch_size=2, shard_rank=1,
                       shard_count=2, shuffle=False)
    n0 = b0.epoch_batches(0)
    n1 = b1.epoch_batches(0)
    assert len(n0) == len(n1) == 4  # 8 batches split across 2 hosts


def test_datamodule_iteration(wav_tree):
    root, fs, lengths = wav_tree
    dm = DataModule(
        datasets={
            "train": dict(audio_path=root, split="train", fs=fs,
                          audio_len=1.0, length_mode="crop"),
            "val": dict(audio_path=root, split="val", fs=fs),
            "test": dict(audio_path=root, split="test", fs=fs),
        },
        batch_size=2, num_workers=2)
    n = 0
    for noisy, clean, txts, mask in dm.iter_split("train"):
        assert noisy.shape == (2, 16000, 1)
        assert mask.shape == (2, 16000)
        n += 1
    assert n == dm.num_batches("train") == 3

    # val: variable-length buckets, still static per bucket
    for noisy, clean, txts, mask in dm.iter_split("val"):
        assert noisy.shape[0] == 2
        assert noisy.shape[1] % 160 == 0

    keys = [k for _, _, k in dm.iter_test()]
    assert len(keys) == len(lengths)


def test_iter_split_zero_workers_and_producer_error(tmp_path):
    """num_workers=0 loads synchronously, and a producer-side exception
    surfaces in the consumer instead of hanging the train loop forever
    (the pre-fix behavior: a dead producer thread never posts the stop
    sentinel and q.get() blocks indefinitely)."""
    import numpy as np

    from open_universe_tpu.data.datamodule import DataModule
    from open_universe_tpu.data.wavio import write_wav

    data = tmp_path / "d"
    for sub in ("noisy", "clean"):
        (data / "train" / sub).mkdir(parents=True)
    for i in range(4):
        x = 0.1 * np.sin(np.arange(400) * 0.1 * (i + 1))
        write_wav(data / "train" / "noisy" / f"u{i}.wav", x, 800)
        write_wav(data / "train" / "clean" / f"u{i}.wav", x, 800)
    dm = DataModule({"train": {"audio_path": str(data), "split": "train",
                               "fs": 800, "audio_len": 0.2,
                               "length_mode": "crop"}},
                    batch_size=2, num_workers=0)
    batches = list(dm.iter_split("train"))
    assert len(batches) == 2

    # producer exception propagates (broken dataset __getitem__)
    dm.datasets["train"].file_list[0] = "/nonexistent/file.wav"
    dm.datasets["train"].__dict__.pop("_cache", None)
    with pytest.raises(Exception):
        list(dm.iter_split("train"))
