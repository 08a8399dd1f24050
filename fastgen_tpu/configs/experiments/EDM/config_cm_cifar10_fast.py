"""Fast-schedule CM CIFAR-10 recipe (ref
``configs/experiments/EDM/config_cm_cifar10_fast.py``): short 8k-iter run
with an aggressive ECT curriculum (q=256, huge kimg_per_stage)."""

from __future__ import annotations

from fastgen_tpu.configs.experiments.EDM.config_cm_cifar10 import (
    create_config as create_cm_cifar10_config)


def create_config():
    config = create_cm_cifar10_config()
    config.log_config.name = "cm_cifar10_fast"
    config.model.ct_schedule.kimg_per_stage = 512_000
    config.model.ct_schedule.q = 256.0
    config.model.use_ema = [0.9993]
    config.trainer.max_iter = 8_000
    config.trainer.save_ckpt_iter = 500
    config.trainer.logging_iter = 100
    return config
