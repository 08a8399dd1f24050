"""CM (ECT) CIFAR-10 recipe (ref ``configs/experiments/EDM/config_cm_cifar10.py``;
reference result: 1-step FID 2.92)."""

from __future__ import annotations

from fastgen_tpu.configs.methods.config_cm import create_config as create_cm_config


def create_config():
    config = create_cm_config()
    config.log_config.group = "cifar10"
    config.log_config.name = "cm_cifar10"
    config.model.input_shape = [32, 32, 3]
    config.model.use_ema = [0.9999]
    config.model.sample_t_cfg.time_dist_type = "lognormal"
    config.model.sample_t_cfg.train_p_mean = -1.1
    config.model.sample_t_cfg.train_p_std = 2.0
    config.model.ct_schedule.batch_size = 128
    config.trainer.batch_size_global = 128
    config.trainer.max_iter = 400_000
    return config
