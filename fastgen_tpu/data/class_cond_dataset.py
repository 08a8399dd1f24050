"""EDM-style class-conditional zip image dataset (ref ``fastgen/datasets/class_cond_dataset.py``).

Reads ``<name>.zip`` with image files plus a ``dataset.json`` of
``{"labels": [[fname, class], ...]}``; yields NHWC uint8 images + one-hot
labels. Plain numpy — no torch Dataset; batching is done by the loader.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Optional

import numpy as np
import PIL.Image

from fastgen_tpu.utils import logging_utils as logger


class ImageFolderDataset:
    def __init__(self, path: str, s3_path: str = "", use_labels: bool = True,
                 max_size: Optional[int] = None, xflip: bool = False,
                 random_seed: int = 0, cache: bool = True, resolution=None, **kwargs):
        self._path = path
        self._use_labels = use_labels
        self._cache = cache
        self._cached_images = {}
        self._zip = None
        self._native = None          # lazy C++ reader (False = disabled)
        self._native_idx = {}
        self._raw_shape = None

        if not os.path.isfile(path):
            raise FileNotFoundError(f"Dataset zip not found: {path}")
        with self._open_zip() as z:
            names = z.namelist()
        self._image_fnames = sorted(
            n for n in names
            if n.lower().endswith((".png", ".jpg", ".jpeg")) and not n.startswith("__"))
        if not self._image_fnames:
            raise IOError(f"No image files found in {path}")

        self._raw_labels = self._load_raw_labels() if use_labels else None

        raw = self._load_raw_image(0)
        self._raw_shape = (len(self._image_fnames),) + raw.shape  # N, H, W, C
        if resolution is not None and raw.shape[0] != resolution:
            raise IOError(f"Image resolution {raw.shape[0]} != requested {resolution}")

        self._raw_idx = np.arange(self._raw_shape[0], dtype=np.int64)
        if max_size is not None and self._raw_idx.size > max_size:
            np.random.RandomState(random_seed % (1 << 31)).shuffle(self._raw_idx)
            self._raw_idx = np.sort(self._raw_idx[:max_size])
        self._xflip = np.zeros(self._raw_idx.size, dtype=np.uint8)
        if xflip:
            self._raw_idx = np.tile(self._raw_idx, 2)
            self._xflip = np.concatenate([self._xflip, np.ones_like(self._xflip)])

    def _open_zip(self):
        return zipfile.ZipFile(self._path)

    def _zipfile(self):
        if self._zip is None:
            self._zip = self._open_zip()
        return self._zip

    def _load_raw_labels(self):
        with self._open_zip() as z:
            if "dataset.json" not in z.namelist():
                logger.warning(f"No dataset.json in {self._path}; labels disabled")
                return None
            labels = json.loads(z.read("dataset.json"))["labels"]
        if labels is None:
            return None
        table = dict(labels)
        arr = np.array([table[fname.replace("\\", "/")] for fname in self._image_fnames])
        return arr.astype(np.int64)

    def _native_reader(self):
        """C++ zip/PNG decode core (``fastgen_tpu/native``) — the counterpart
        of the reference riding torch's C++ DataLoader workers. Lazily opened;
        any unavailability (no g++/zlib, exotic PNGs) falls back to PIL."""
        if self._native is False:
            return None
        if self._native is None:
            try:
                from fastgen_tpu import native

                if not native.available():
                    raise RuntimeError("native core unavailable")
                reader = native.NativeZipReader(self._path)
                names = reader.names()
                self._native_idx = {n: i for i, n in enumerate(names)}
                self._native = reader
            except Exception as e:  # noqa: BLE001 - PIL fallback
                logger.info(f"native zip reader disabled ({e})")
                self._native = False
                return None
        return self._native

    def _load_raw_image(self, raw_idx: int) -> np.ndarray:
        fname = self._image_fnames[raw_idx]
        reader = self._native_reader()
        if reader is not None and fname.lower().endswith(".png") \
                and self._raw_shape is not None and self._raw_shape[3] == 3:
            # .get: the C++ central-directory parse can disagree with
            # zipfile's (zip64 entry counts, >4095-byte names) — any name it
            # missed must fall through to PIL, not KeyError
            nidx = self._native_idx.get(fname)
            if nidx is not None:
                img = reader.decode_png_rgb(nidx, self._raw_shape[1],
                                            self._raw_shape[2])
                if img is not None:
                    return img
        data = self._zipfile().read(fname)
        img = np.asarray(PIL.Image.open(io.BytesIO(data)))
        if img.ndim == 2:
            img = img[:, :, None]
        return img  # HWC uint8

    @property
    def label_dim(self) -> int:
        if self._raw_labels is None:
            return 0
        return int(self._raw_labels.max()) + 1

    @property
    def resolution(self) -> int:
        return self._raw_shape[1]

    @property
    def num_channels(self) -> int:
        return self._raw_shape[3]

    def __len__(self):
        return len(self._raw_idx)

    def __getitem__(self, idx: int):
        raw_idx = int(self._raw_idx[idx])
        if raw_idx in self._cached_images:
            img = self._cached_images[raw_idx]
        else:
            img = self._load_raw_image(raw_idx)
            if self._cache:
                self._cached_images[raw_idx] = img
        if self._xflip[idx]:
            img = img[:, ::-1]
        onehot = np.zeros(self.label_dim, np.float32)
        if self._raw_labels is not None:
            onehot[self._raw_labels[raw_idx]] = 1.0
        return img, onehot

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_zip"] = None  # zip handles don't pickle
        state["_native"] = None  # C++ FILE* handle doesn't pickle either
        return state


class SyntheticImageDataset:
    """Deterministic random dataset for tests/benchmarks (no files needed)."""

    def __init__(self, size: int = 256, resolution: int = 32, channels: int = 3,
                 label_dim: int = 10, seed: int = 0):
        self._size = size
        self._resolution = resolution
        self._channels = channels
        self._label_dim = label_dim
        self._seed = seed

    @property
    def label_dim(self):
        return self._label_dim

    @property
    def resolution(self):
        return self._resolution

    @property
    def num_channels(self):
        return self._channels

    def __len__(self):
        return self._size

    def __getitem__(self, idx: int):
        rs = np.random.RandomState((self._seed + idx) % (1 << 31))
        img = rs.randint(0, 256, (self._resolution, self._resolution, self._channels),
                         dtype=np.uint8)
        onehot = np.zeros(self._label_dim, np.float32)
        if self._label_dim:
            onehot[idx % self._label_dim] = 1.0
        return img, onehot
