"""Bucketed batching with STATIC shapes for XLA.

Re-design of the reference's bucket samplers
(datasets/datamodule_combo2.py:65-211: bucket_bs, bucket_bs_random,
bucket_budget): instead of padding to the per-batch max (a new XLA
compilation for every length), samples are padded to a SMALL FIXED SET of
bucket lengths (multiples of the model's total downsampling), so the
train step compiles once per bucket (SURVEY.md §7.6).
"""
import math
import random
from typing import List, Optional, Sequence

import numpy as np


def make_buckets(lengths: Sequence[int], n_buckets: int = 4,
                 multiple_of: int = 160) -> List[int]:
    """Quantile-based bucket boundary lengths, rounded up to `multiple_of`."""
    ls = np.asarray(sorted(lengths))
    qs = np.linspace(0, 1, n_buckets + 1)[1:]
    bounds = []
    for q in qs:
        v = int(ls[min(int(q * (len(ls) - 1)), len(ls) - 1)])
        v = int(math.ceil(v / multiple_of) * multiple_of)
        if not bounds or v > bounds[-1]:
            bounds.append(v)
    return bounds


class BucketBatcher:
    """Assign samples to buckets, yield index batches per bucket.

    All 4 reference batching modes (datamodule_combo2.py:65-211):

    - "fixed": no length grouping — shuffled fixed-size batches, every
      batch padded to the largest bucket bound (the reference pads to the
      per-batch max; a single static shape is the XLA-friendly analogue).
    - "bucket_bs": length-sorted buckets, fixed batch size per bucket.
    - "bucket_bs_random": anchor + nearest-length window (the reference
      draws a random anchor and bisects a length window around it,
      datamodule_combo2.py:121-179); each batch is padded to the bucket
      of its longest member, so shapes stay static.
    - "bucket_budget": token-budget batches — batch size scales inversely
      with bucket length so samples-per-batch x bucket_len <= budget.
    """

    def __init__(self, lengths: Sequence[int], bucket_bounds: Sequence[int],
                 batch_size: int = 8, mode: str = "bucket_bs",
                 budget_frames: Optional[int] = None, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = False,
                 shard_rank: int = 0, shard_count: int = 1):
        self.lengths = list(lengths)
        self.bounds = list(bucket_bounds)
        self.batch_size = batch_size
        self.mode = mode
        self.budget = budget_frames
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.shard_rank = shard_rank
        self.shard_count = shard_count

        self.assignment = []
        for i, l in enumerate(self.lengths):
            b = next((bi for bi, bound in enumerate(self.bounds)
                      if l <= bound), None)
            if b is None:
                b = len(self.bounds) - 1  # overlong clips go to last bucket
            self.assignment.append(b)

    def bucket_len(self, bucket_idx: int) -> int:
        return self.bounds[bucket_idx]

    def _bucket_batch_size(self, bucket_idx: int) -> int:
        if self.mode == "bucket_budget" and self.budget:
            return max(1, self.budget // self.bounds[bucket_idx])
        return self.batch_size

    def _pad_chunk(self, chunk, bs):
        """Repeat samples so every batch in a bucket has the SAME static
        shape (XLA-friendly); None if dropped."""
        if len(chunk) < bs:
            if self.drop_last:
                return None
            chunk = (chunk * math.ceil(bs / len(chunk)))[:bs]
        return chunk

    def _fixed_batches(self, rng):
        """Reference "fixed" mode: plain shuffled fixed-size batches, no
        length grouping; every batch uses the largest bucket shape."""
        ids = list(range(len(self.lengths)))
        if self.shuffle:
            rng.shuffle(ids)
        bi = len(self.bounds) - 1
        batches = []
        for s in range(0, len(ids), self.batch_size):
            chunk = self._pad_chunk(ids[s : s + self.batch_size],
                                    self.batch_size)
            if chunk is not None:
                batches.append((bi, chunk))
        return batches

    def _anchor_batches(self, rng):
        """Reference "bucket_bs_random" mode: draw a random anchor, batch
        it with the alive samples NEAREST IN LENGTH (the static-shape
        analogue of the reference's bisect length-window around the
        anchor, datamodule_combo2.py:121-179). Each batch is padded to
        the bucket of its longest member."""
        order = sorted(range(len(self.lengths)),
                       key=lambda i: self.lengths[i])
        pos = {idx: p for p, idx in enumerate(order)}
        alive = [True] * len(order)
        anchors = list(range(len(self.lengths)))
        rng.shuffle(anchors)
        batches = []
        for a in anchors:
            if not alive[pos[a]]:
                continue
            # expand symmetrically in sorted-length order around the anchor
            chunk = [a]
            alive[pos[a]] = False
            lo, hi = pos[a] - 1, pos[a] + 1
            while len(chunk) < self.batch_size and (lo >= 0
                                                    or hi < len(order)):
                dlo = (abs(self.lengths[order[lo]] - self.lengths[a])
                       if lo >= 0 and alive[lo] else None)
                dhi = (abs(self.lengths[order[hi]] - self.lengths[a])
                       if hi < len(order) and alive[hi] else None)
                if dlo is None and dhi is None:
                    if lo >= 0:
                        lo -= 1
                    if hi < len(order):
                        hi += 1
                    continue
                if dhi is None or (dlo is not None and dlo <= dhi):
                    chunk.append(order[lo])
                    alive[lo] = False
                    lo -= 1
                else:
                    chunk.append(order[hi])
                    alive[hi] = False
                    hi += 1
            bi = max(self.assignment[i] for i in chunk)
            chunk = self._pad_chunk(chunk, self.batch_size)
            if chunk is not None:
                batches.append((bi, chunk))
        return batches

    def epoch_batches(self, epoch: int = 0):
        """Yields (bucket_idx, [sample indices]) with per-host sharding."""
        rng = random.Random(self.seed + epoch)
        if self.mode == "fixed":
            batches = self._fixed_batches(rng)
        elif self.mode == "bucket_bs_random":
            batches = self._anchor_batches(rng)
        elif self.mode in ("bucket_bs", "bucket_budget"):
            per_bucket = [[] for _ in self.bounds]
            for i, b in enumerate(self.assignment):
                per_bucket[b].append(i)

            batches = []
            for bi, ids in enumerate(per_bucket):
                if not ids:
                    continue
                if self.shuffle:
                    rng.shuffle(ids)
                bs = self._bucket_batch_size(bi)
                for s in range(0, len(ids), bs):
                    chunk = self._pad_chunk(ids[s : s + bs], bs)
                    if chunk is not None:
                        batches.append((bi, chunk))
        else:
            raise ValueError(f"unknown batching mode: {self.mode!r}")
        if self.shuffle:
            rng.shuffle(batches)
        # shard whole batches across hosts (each host sees every n-th batch)
        return batches[self.shard_rank :: self.shard_count]

    def collate(self, samples, bucket_idx: int):
        """Pad (noisy, clean, txt, mask) tuples to the bucket length."""
        t_pad = self.bounds[bucket_idx]
        noisy, clean, txts, masks = [], [], [], []
        for n, c, txt, m in samples:
            t = n.shape[0]
            if t < t_pad:
                n = np.pad(n, ((0, t_pad - t), (0, 0)))
                c = np.pad(c, ((0, t_pad - t), (0, 0)))
                m = np.pad(m, (0, t_pad - t))
            else:
                n, c, m = n[:t_pad], c[:t_pad], m[:t_pad]
            noisy.append(n)
            clean.append(c)
            txts.append(txt)
            masks.append(m)
        return (np.stack(noisy), np.stack(clean), txts, np.stack(masks))
