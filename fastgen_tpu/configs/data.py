"""Data loader config zoo (ref ``fastgen/configs/data.py``)."""

from __future__ import annotations

import os

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.data.class_cond_dataloader import ImageLoader, SyntheticLoader
from fastgen_tpu.data.wds import WDSLoader

OUTPUT_ROOT = os.environ.get("FASTGEN_OUTPUT_ROOT", "FASTGEN_OUTPUT")
DATA_ROOT_DIR = os.getenv("DATA_ROOT_DIR", f"{OUTPUT_ROOT}/DATA")

CIFAR10_Loader_Config = L(ImageLoader)(
    dataset_path=f"{DATA_ROOT_DIR}/cifar10-32x32.zip",
    s3_path="",
    batch_size=32,
    use_labels=True,
    cache=True,
    shuffle=True,
)

ImageNet64_Loader_Config = L(ImageLoader)(
    dataset_path=f"{DATA_ROOT_DIR}/imagenet-64x64.zip",
    s3_path="",
    batch_size=32,
    use_labels=True,
    cache=False,
    shuffle=True,
)

# KD loaders (ref ``configs/data.py:60-82``): single-step pairs and multi-step
# denoising trajectories from precomputed WDS shards.
Pair_Loader_Config = L(WDSLoader)(
    datatags=["WDS:/path/to/pairs"],
    batch_size=2,
    key_map={"real": "latent.npy", "noise": "noise.npy", "condition": "txt_emb.npy"},
)

Path_Loader_Config = L(WDSLoader)(
    datatags=["WDS:/path/to/paths"],
    batch_size=2,
    key_map={"real": "latent.npy", "path": "path.npy", "condition": "txt_emb.npy"},
)

# Synthetic loader for smoke tests / benchmarks (no files needed)
Synthetic_Loader_Config = L(SyntheticLoader)(
    batch_size=16,
    size=256,
    resolution=16,
    channels=3,
    label_dim=10,
)
