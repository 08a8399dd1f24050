"""ImageLoader: infinite batched loader over the class-conditional dataset
(ref ``fastgen/datasets/class_cond_dataloader.py:10-49``).

TPU-native differences:
* yields numpy batches ``{"real": [B,H,W,C] float32 in [-1,1], "condition":
  one-hot, "neg_condition": zeros}`` — NHWC, ready for ``jax.device_put``
  with a batch sharding;
* background prefetch via a single thread (the machine typically gives the
  host few cores; heavy decode pipelines use grain/TF-data in wds_loader).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

import jax

from fastgen_tpu.data.class_cond_dataset import ImageFolderDataset, SyntheticImageDataset
from fastgen_tpu.data.samplers import InfiniteSampler


def _to_batch(images, labels):
    x = np.stack(images).astype(np.float32) / 127.5 - 1.0
    cond = np.stack(labels)
    return {"real": x, "condition": cond, "neg_condition": np.zeros_like(cond)}


class ImageLoader:
    def __init__(self, dataset_path: str = "", s3_path: str = "", batch_size: int = 32,
                 use_labels: bool = True, cache: bool = True, shuffle: bool = True,
                 sampler_start_idx: int = 0, seed: int = 0, prefetch: int = 2,
                 dataset=None, **kwargs):
        if dataset is not None:
            self.dataset = dataset
        else:
            self.dataset = ImageFolderDataset(path=dataset_path, s3_path=s3_path,
                                              use_labels=use_labels, cache=cache, **kwargs)
        self.batch_size = batch_size
        try:
            rank = jax.process_index()
            world = jax.process_count()
        except Exception:
            rank, world = 0, 1
        self.sampler = InfiniteSampler(len(self.dataset), shuffle=shuffle, seed=seed,
                                       start_idx=sampler_start_idx, rank=rank,
                                       num_replicas=world)
        self._prefetch = prefetch

    def _producer(self, q: "queue.Queue", it):
        try:
            while True:
                images, labels = [], []
                for _ in range(self.batch_size):
                    img, onehot = self.dataset[next(it)]
                    images.append(img)
                    labels.append(onehot)
                q.put(_to_batch(images, labels))
        except Exception as e:  # surface worker errors to the consumer
            q.put(e)

    def __iter__(self) -> Iterator[dict]:
        it = iter(self.sampler)
        if self._prefetch <= 0:
            while True:
                images, labels = [], []
                for _ in range(self.batch_size):
                    img, onehot = self.dataset[next(it)]
                    images.append(img)
                    labels.append(onehot)
                yield _to_batch(images, labels)
        q: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        t = threading.Thread(target=self._producer, args=(q, it), daemon=True)
        t.start()
        while True:
            item = q.get()
            if isinstance(item, Exception):
                raise item
            yield item


class SyntheticLoader(ImageLoader):
    """Loader over the synthetic dataset (tests / smoke configs / benchmarks)."""

    def __init__(self, batch_size: int = 32, size: int = 256, resolution: int = 32,
                 channels: int = 3, label_dim: int = 10, **kwargs):
        dataset = SyntheticImageDataset(size=size, resolution=resolution,
                                        channels=channels, label_dim=label_dim)
        super().__init__(dataset=dataset, batch_size=batch_size, **kwargs)


class SyntheticVideoLoader:
    """Synthetic video-latent batches for smoke runs: ``{"real": [B,T,H,W,C],
    "condition"/"neg_condition": {"text_embeds": [B,L,D]}}`` (the contract of
    the WDS video-latent loaders)."""

    def __init__(self, batch_size: int = 2, frames: int = 4, resolution: int = 8,
                 channels: int = 4, text_len: int = 6, text_dim: int = 32,
                 seed: int = 0, sampler_start_idx: int = 0, **kwargs):
        self.batch_size = batch_size
        self.frames = frames
        self.resolution = resolution
        self.channels = channels
        self.text_len = text_len
        self.text_dim = text_dim
        self.seed = seed + sampler_start_idx

    def __iter__(self):
        i = self.seed
        while True:
            rs = np.random.RandomState(i % (1 << 31))
            real = rs.randn(self.batch_size, self.frames, self.resolution,
                            self.resolution, self.channels).astype(np.float32)
            text = rs.randn(self.batch_size, self.text_len,
                            self.text_dim).astype(np.float32)
            yield {"real": real,
                   "condition": {"text_embeds": text},
                   "neg_condition": {"text_embeds": np.zeros_like(text)}}
            i += 1


class SyntheticRawVideoLoader:
    """Synthetic *raw* video batches (pixels + prompt strings) to exercise the
    preprocess_data encode path (ref ``trainer.py:374-476``): ``{"real":
    [B,T,H,W,3] in [-1,1], "condition"/"neg_condition": list[str]}``."""

    def __init__(self, batch_size: int = 1, frames: int = 5, resolution: int = 16,
                 seed: int = 0, sampler_start_idx: int = 0, **kwargs):
        self.batch_size = batch_size
        self.frames = frames
        self.resolution = resolution
        self.seed = seed + sampler_start_idx

    def __iter__(self):
        prompts = ["a red panda", "ocean waves at dusk", "city traffic timelapse"]
        i = self.seed
        while True:
            rs = np.random.RandomState(i % (1 << 31))
            real = rs.uniform(-1, 1, (self.batch_size, self.frames,
                                      self.resolution, self.resolution,
                                      3)).astype(np.float32)
            yield {"real": real,
                   "condition": [prompts[(i + b) % len(prompts)]
                                 for b in range(self.batch_size)],
                   "neg_condition": [""] * self.batch_size}
            i += 1


class SyntheticRawImageLoader:
    """Synthetic raw image batches (pixels + prompt strings), the image
    counterpart of :class:`SyntheticRawVideoLoader`."""

    def __init__(self, batch_size: int = 2, resolution: int = 16,
                 seed: int = 0, sampler_start_idx: int = 0, **kwargs):
        self.batch_size = batch_size
        self.resolution = resolution
        self.seed = seed + sampler_start_idx

    def __iter__(self):
        prompts = ["a watercolor fox", "a neon city skyline", "a bowl of ramen"]
        i = self.seed
        while True:
            rs = np.random.RandomState(i % (1 << 31))
            real = rs.uniform(-1, 1, (self.batch_size, self.resolution,
                                      self.resolution, 3)).astype(np.float32)
            yield {"real": real,
                   "condition": [prompts[(i + b) % len(prompts)]
                                 for b in range(self.batch_size)],
                   "neg_condition": [""] * self.batch_size}
            i += 1
