"""CM on EDM2-S ImageNet-64 (ref ``configs/experiments/EDM2/config_cm_s.py``;
reference 1-step FID 4.05)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.methods.config_cm import create_config as create_cm_config
from fastgen_tpu.configs.net import EDM2_IN64_S_Config


def create_config():
    config = create_cm_config()
    config.log_config.group = "imagenet64"
    config.log_config.name = "cm_edm2_s"
    config.model.net = copy.deepcopy(EDM2_IN64_S_Config)
    config.model.input_shape = [64, 64, 3]
    config.model.use_ema = [0.9999]
    config.trainer.batch_size_global = 2048
    config.trainer.fsdp = True
    config.trainer.max_iter = 200_000
    return config
