"""f-distill EDM CIFAR-10 recipe (ref
``configs/experiments/EDM/config_f_distill_cifar10.py``; reference 1-step FID
1.85). KL divergence weighting on top of the DMD2 triad."""

from __future__ import annotations

from fastgen_tpu.configs.methods.config_f_distill import (
    create_config as create_f_distill_config)


def create_config():
    config = create_f_distill_config()
    config.log_config.group = "cifar10"
    config.log_config.name = "f_distill_cifar10"
    config.model.input_shape = [32, 32, 3]
    config.model.f_distill.f_div = "kl"
    config.model.use_ema = [0.9999, 0.99995, 0.9996]
    config.trainer.batch_size_global = 2048
    config.trainer.max_iter = 100_000
    return config
