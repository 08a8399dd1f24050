"""DMD2 distillation on the procedural dataset — stage 2 of the zero-egress
quality-evidence pipeline (see ``config_sft_edm_procgen.py``).

Mirrors the reference CIFAR-10 recipe
(``configs/experiments/EDM/config_dmd2_cifar10.py``, reference 1-step FID
1.99) with the teacher swapped for the stage-1 procgen EDM checkpoint. Set
``model.pretrained_model_path`` to the stage-1 Orbax checkpoint directory on
the CLI or rely on the default below.
"""

from __future__ import annotations

import os

from fastgen_tpu.configs.data import DATA_ROOT_DIR, OUTPUT_ROOT
from fastgen_tpu.configs.experiments.EDM.config_dmd2_cifar10 import (
    create_config as create_cifar_config,
)


def create_config():
    config = create_cifar_config()
    config.log_config.group = "procgen"
    config.log_config.name = "dmd2_procgen"
    config.dataloader_train.dataset_path = f"{DATA_ROOT_DIR}/procgen-32x32.zip"
    config.dataloader_train.batch_size = 128
    config.trainer.batch_size_global = 128
    config.trainer.max_iter = 20_000
    config.trainer.save_ckpt_iter = 2_000
    config.trainer.validation_iter = 2_000
    # stage-1 teacher (native Orbax run dir, save_path layout
    # <root>/<project>/<group>/<name>/checkpoints); override on CLI if elsewhere
    config.model.pretrained_model_path = os.path.join(
        OUTPUT_ROOT, "fastgen", "procgen", "sft_edm_procgen", "checkpoints")
    return config
