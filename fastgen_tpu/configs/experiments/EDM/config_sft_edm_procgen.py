"""Teacher pretrain: EDM from-scratch DSM training on the procedural
class-conditional dataset (``scripts/make_procedural_dataset.py``).

Stage 1 of the zero-egress quality-evidence pipeline (the counterpart of the
reference's CIFAR-10 recipe, ``configs/experiments/EDM/config_dmd2_cifar10.py``
+ a downloaded EDM teacher, which this environment cannot fetch):

    1. this config  -> 50-step EDM teacher on procgen-32x32
    2. config_dmd2_procgen.py -> 1-step DMD2 student distilled from it
    3. scripts/fid/compute_fid_from_ckpts.py -> fid.json teacher vs student

Sized for a single v5e chip within a few hours; scale ``trainer.max_iter`` up
via CLI override for a longer run.
"""

from __future__ import annotations

from fastgen_tpu.configs.data import DATA_ROOT_DIR
from fastgen_tpu.configs.experiments.EDM.config_sft_edm_cifar10 import (
    create_config as create_cifar_config,
)


def create_config():
    config = create_cifar_config()
    config.log_config.group = "procgen"
    config.log_config.name = "sft_edm_procgen"
    # HBM + live-array census every 500 iters: the quality-pipeline runs have
    # shown a progressive slowdown ~1k iters into a session (QUALITY.md); these
    # rows tell leak-on-device apart from host/data-path degradation
    from fastgen_tpu.configs.callbacks import (GPUStats_CALLBACK,
                                               MemTracker_CALLBACK)

    config.trainer.callbacks.update(**GPUStats_CALLBACK, **MemTracker_CALLBACK)
    for cb in ("device_stats", "mem_tracker"):
        config.trainer.callbacks[cb].logging_iter = 500
    config.dataloader_train.dataset_path = f"{DATA_ROOT_DIR}/procgen-32x32.zip"
    # procgen textures are globally structured: lighter augmentation than the
    # CIFAR recipe (rotations/flips stay label-preserving for all 10 classes);
    # at p=0.06 the sym6-AA geometric warp buys nothing measurable, so use the
    # cheap bilinear path (one full-batch microbatch keeps the MXU fed)
    config.trainer.augment_pipe.p = 0.06
    config.trainer.augment_pipe.antialias = False
    config.dataloader_train.batch_size = 128
    config.trainer.batch_size_global = 128
    config.trainer.max_iter = 12_000
    config.trainer.save_ckpt_iter = 2_000
    config.trainer.validation_iter = 2_000
    config.model.net_optimizer.lr = 1e-4
    return config
