"""Host-side seed feed.

Plays the role of the reference's BatchGenerate seed slicing
(operator_impl.cu:92-172): for each (mode, local step) produce the per-device
seed id slices, -1 padded to the static batch shape. Per-device seed sets are
the partition-filtered sets (storage_management.cu:171-232).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from legion_tpu.pipeline.schedule import Mode, Schedule


class SeedFeed:
    def __init__(self, schedule: Schedule,
                 train_sets: Sequence[np.ndarray],
                 valid_sets: Sequence[np.ndarray],
                 test_sets: Sequence[np.ndarray],
                 eval_batch_size: int = 512,
                 shuffle_each_epoch: bool = False,
                 seed: int = 0):
        self.schedule = schedule
        self.train_sets = [np.asarray(s, np.int32) for s in train_sets]
        self.valid_sets = [np.asarray(s, np.int32) for s in valid_sets]
        self.test_sets = [np.asarray(s, np.int32) for s in test_sets]
        self.eval_batch_size = eval_batch_size
        self.num_devices = len(self.train_sets)
        self.shuffle_each_epoch = shuffle_each_epoch
        self._rng = np.random.default_rng(seed)

    def start_epoch(self) -> None:
        """Optional reshuffle (the reference never shuffles; off by
        default)."""
        if self.shuffle_each_epoch:
            for s in self.train_sets:
                self._rng.shuffle(s)

    def _slice(self, ids: np.ndarray, start: int, count: int,
               pad_to: int) -> np.ndarray:
        out = np.full(pad_to, -1, np.int32)
        chunk = ids[start:start + count]
        out[: len(chunk)] = chunk
        return out

    def batch(self, mode: Mode, local_id: int) -> np.ndarray:
        """Return [num_devices, static_batch] int32 seeds, -1 padded."""
        sch = self.schedule
        rows: List[np.ndarray] = []
        if mode == Mode.TRAIN:
            bs = sch.train_batch_size
            for d in range(self.num_devices):
                rows.append(self._slice(self.train_sets[d], local_id * bs,
                                        bs, bs))
        elif mode == Mode.VALID:
            for d in range(self.num_devices):
                bs = sch.valid_batch_sizes[d]
                rows.append(self._slice(self.valid_sets[d], local_id * bs,
                                        bs, self.eval_batch_size))
        else:
            for d in range(self.num_devices):
                bs = sch.test_batch_sizes[d]
                rows.append(self._slice(self.test_sets[d], local_id * bs,
                                        bs, self.eval_batch_size))
        return np.stack(rows)
