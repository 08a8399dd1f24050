"""TCM CIFAR-10 recipe (ref ``config_tcm_cifar10.py``; reference 1-step FID 2.70)."""

from __future__ import annotations

from fastgen_tpu.configs.methods.config_tcm import create_config as create_tcm_config


def create_config():
    config = create_tcm_config()
    config.log_config.group = "cifar10"
    config.log_config.name = "tcm_cifar10"
    config.model.input_shape = [32, 32, 3]
    config.model.use_ema = [0.9999]
    config.model.transition_t = 1.0
    config.model.boundary_prob = 0.25
    config.model.w_boundary = 0.1
    config.trainer.batch_size_global = 128
    config.trainer.max_iter = 400_000
    return config
