"""Fold split and batch iteration.

Parity with the reference's split/sampler machinery
(common/data.py:113-212): the train/valid split of a fold index list is a
seeded shuffle followed by a ``floor(valid_size * n)`` cut (valid first),
and per-epoch iteration visits a fresh random permutation of the subset.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from stroke_prediction_tpu.data.dataset import StrokeDataset3D


def fold_split(n_cases: int, indices: Sequence[int], valid_size: float,
               seed: Optional[int], shuffle: bool = True
               ) -> Tuple[List[int], List[int]]:
    """reference: common/data.py:113-147 (split_data_loader3D core logic)."""
    assert 0 <= valid_size <= 1, "[!] valid_size should be in the range [0, 1]."
    items = sorted(set(range(n_cases)).intersection(set(indices)))
    split = int(np.floor(valid_size * len(items)))
    if shuffle:
        rs = np.random.RandomState(seed)
        rs.shuffle(items)
    return list(items[split:]), list(items[:split])   # train, valid


class BatchLoader:
    """Iterates a dataset subset in shuffled batches (host side).

    Equivalent of DataLoader + SubsetRandomSampler
    (common/data.py:138-145); augmentation is NOT done here — batches are
    raw cached volumes, augmented on device in the jitted train step.
    """

    def __init__(self, dataset: StrokeDataset3D, indices: Sequence[int],
                 batch_size: int, shuffle: bool = True,
                 seed: Optional[int] = None, drop_last: bool = False,
                 process_shard: bool = False):
        self.dataset = dataset
        self.indices = list(indices)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.process_shard = process_shard
        self._rs = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch_chunks(self) -> List[List[int]]:
        """One epoch's visiting order as batch-sized index chunks.

        Consumes exactly one shuffle from the loader RNG, so the host
        ``__iter__`` path and the Learner's device-resident gather path
        see identical per-epoch orders for the same seed.
        """
        order = list(self.indices)
        if self.shuffle:
            self._rs.shuffle(order)
        chunks: List[List[int]] = []
        for start in range(0, len(order), self.batch_size):
            chunk = order[start:start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            if self.process_shard:
                # multi-host: the batch ORDER is identical on every host
                # (seed-shared RNG); each host loads only its slice and
                # parallel.distributed.global_batch assembles the global
                # array — no host materializes the full batch.  A final
                # partial batch that does not divide over the processes
                # is dropped (every host sees the same length, so they
                # all drop it consistently).
                import jax
                pid, nproc = jax.process_index(), jax.process_count()
                if nproc > 1:
                    if len(chunk) % nproc:
                        break
                    chunk = chunk[pid::nproc]
            chunks.append(chunk)
        return chunks

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for chunk in self.epoch_chunks():
            yield self.dataset.stack(chunk)


def _make_loaders(dataset: StrokeDataset3D, fold_indices: Sequence[int],
                  ratio: float, seed: int, batchsize: int, split: bool,
                  process_shard: bool = False):
    train_idx, valid_idx = fold_split(len(dataset), fold_indices,
                                      ratio if split else 0.0, seed)
    train = BatchLoader(dataset, train_idx, batchsize, shuffle=True,
                        seed=seed, process_shard=process_shard)
    valid = (BatchLoader(dataset, valid_idx, batchsize, shuffle=True,
                         seed=seed, process_shard=process_shard)
             if split and valid_idx else None)
    return train, valid


def get_stroke_shape_training_data(dataset, fold_indices, ratio, seed=4,
                                   batchsize=2, split=True,
                                   process_shard=False):
    """reference: common/data.py:175-182."""
    return _make_loaders(dataset, fold_indices, ratio, seed, batchsize, split,
                         process_shard)


def get_stroke_prediction_training_data(dataset, fold_indices, ratio, seed=4,
                                        batchsize=2, split=True,
                                        process_shard=False):
    """reference: common/data.py:185-192."""
    return _make_loaders(dataset, fold_indices, ratio, seed, batchsize, split,
                         process_shard)


def get_testdata(dataset, indices, seed=None, shuffle=True) -> BatchLoader:
    """Batch-size-1 loader for per-case test metrics
    (reference: common/data.py:195-212)."""
    items = sorted(set(range(len(dataset))).intersection(set(indices)))
    return BatchLoader(dataset, items, batch_size=1, shuffle=shuffle,
                       seed=seed)
