"""DataModule: datasets per split + batched iterators with prefetch.

Re-design of the reference DataModule (datasets/datamodule_combo2.py:217-305)
for TPU: static bucket shapes (see batching.py), thread-pool sample loading,
double-buffered prefetch so host IO overlaps device steps, per-host batch
sharding for multi-host training (the DistributedSampler equivalent,
SURVEY.md §2.8).
"""
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

from .batching import BucketBatcher, make_buckets
from .dataset import NoisyDataset


class DataModule:
    def __init__(self, datasets: dict, batch_size: int = 8,
                 batching_mode: str = "bucket_bs", n_buckets: int = 4,
                 budget_frames: Optional[int] = None,
                 multiple_of: int = 160, num_workers: int = 4,
                 seed: int = 0, shard_rank: int = 0, shard_count: int = 1):
        """datasets: dict split -> NoisyDataset (or kwargs dict)."""
        def _build(v):
            if isinstance(v, NoisyDataset):
                return v
            if "textgrid_path" in v:
                from .textgrid import AlignedNoisyDataset

                return AlignedNoisyDataset(**v)
            return NoisyDataset(**v)

        self.datasets = {k: _build(v) for k, v in datasets.items()}
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.seed = seed
        self.batchers = {}
        for split, ds in self.datasets.items():
            if len(ds) == 0:
                continue
            # fixed-length datasets get one bucket; variable-length get n
            if ds.audio_len is not None and split == "train":
                bounds = [ds.audio_len]
            else:
                bounds = make_buckets(ds.lengths, n_buckets, multiple_of)
            self.batchers[split] = BucketBatcher(
                ds.lengths, bounds, batch_size=batch_size,
                mode=batching_mode, budget_frames=budget_frames,
                shuffle=(split == "train"), seed=seed,
                shard_rank=shard_rank, shard_count=shard_count)

    def num_batches(self, split: str, epoch: int = 0) -> int:
        return len(self.batchers[split].epoch_batches(epoch))

    def iter_split(self, split: str, epoch: int = 0, prefetch: int = 2,
                   with_indices: bool = False):
        """Yields (noisy (B,T,C), clean, txts, mask (B,T)) numpy batches;
        with ``with_indices=True`` yields (batch_tuple, dataset_indices)
        so callers can attach per-utterance side data (e.g. TextGrid
        alignment coords)."""
        ds = self.datasets[split]
        batcher = self.batchers[split]
        batches = batcher.epoch_batches(epoch)

        q = queue.Queue(maxsize=prefetch)
        stop = object()
        err = []

        def producer():
            # any exception must still unblock the consumer: a producer
            # thread dying WITHOUT posting `stop` would hang the train
            # loop forever on q.get()
            try:
                if self.num_workers <= 0:  # synchronous loading
                    for bi, idxs in batches:
                        samples = [ds[i] for i in idxs]
                        collated = batcher.collate(samples, bi)
                        q.put((collated, idxs) if with_indices else collated)
                else:
                    with ThreadPoolExecutor(
                            max_workers=self.num_workers) as pool:
                        for bi, idxs in batches:
                            samples = list(pool.map(ds.__getitem__, idxs))
                            collated = batcher.collate(samples, bi)
                            q.put((collated, idxs) if with_indices
                                  else collated)
            except BaseException as e:  # noqa: B036 - re-raised below
                err.append(e)
            finally:
                q.put(stop)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        th.join()
        if err:
            raise err[0]

    def iter_test(self, split: str = "test"):
        """Full-length per-file iteration: yields (noisy, clean, key)."""
        ds = self.datasets[split]
        for i in range(len(ds)):
            noisy, clean, key, _ = ds[i]
            yield noisy, clean, key
