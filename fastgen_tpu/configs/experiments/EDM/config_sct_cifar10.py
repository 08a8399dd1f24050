"""sCT CIFAR-10 recipe (ref ``config_sct_cifar10.py``; reference 1-step FID 3.23)."""

from __future__ import annotations

from fastgen_tpu.configs.methods.config_scm import create_config as create_scm_config


def create_config():
    config = create_scm_config()
    config.log_config.group = "cifar10"
    config.log_config.name = "sct_cifar10"
    config.model.input_shape = [32, 32, 3]
    config.model.use_ema = [0.9999]
    config.model.loss_config.use_cd = False
    config.model.sample_t_cfg.train_p_mean = -1.0
    config.model.sample_t_cfg.train_p_std = 1.8  # sCT with the EDM checkpoint
    config.trainer.batch_size_global = 128
    config.trainer.max_iter = 400_000
    return config
