"""sCD CIFAR-10 recipe (ref ``config_scd_cifar10.py``; reference 1-step FID 3.22)."""

from __future__ import annotations

from fastgen_tpu.configs.experiments.EDM.config_sct_cifar10 import (
    create_config as create_sct_config)


def create_config():
    config = create_sct_config()
    config.log_config.name = "scd_cifar10"
    config.model.loss_config.use_cd = True  # distillation: needs the EDM teacher
    config.model.sample_t_cfg.train_p_std = 1.4
    return config
