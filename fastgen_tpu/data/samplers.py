"""Resumable infinite index sampler (ref ``fastgen/datasets/samplers.py:9-52``).

Same contract: per-epoch seeded shuffle, rank-strided indices, exact resume
via ``start_idx``. Rank/world come from jax.process_* (multi-host) — within a
host the batch is sharded over local devices by the loader, so striding is by
process, exactly like the reference strides by DDP rank.
"""

from __future__ import annotations

import numpy as np


class InfiniteSampler:
    def __init__(self, dataset_size: int, shuffle: bool = True, seed: int = 0,
                 start_idx: int = 0, rank: int = 0, num_replicas: int = 1):
        assert dataset_size > 0
        self.dataset_size = dataset_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_replicas = num_replicas
        self.idx = start_idx + rank

    def __iter__(self):
        idx = self.idx
        epoch = None
        order = None
        while True:
            current_epoch = idx // self.dataset_size
            if epoch != current_epoch:
                epoch = current_epoch
                order = np.arange(self.dataset_size)
                if self.shuffle:
                    local_seed = (self.seed + epoch) % (2**32 - 1)
                    np.random.RandomState(local_seed).shuffle(order)
            yield int(order[idx % self.dataset_size])
            idx += self.num_replicas
