"""SFT on Wan2.2-TI2V-5B I2V (ref
``configs/experiments/WanI2V/config_sft_wan22_5b.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.experiments.WanI2V.config_sft_14b import (
    create_config as create_i2v_sft_config)
from fastgen_tpu.configs.net import Wan22_I2V_5B_Config


def create_config():
    config = create_i2v_sft_config()
    config.log_config.name = "sft_wani2v_wan22_5b"
    config.model.net = copy.deepcopy(Wan22_I2V_5B_Config)
    config.model.input_shape = [21, 44, 80, 48]
    return config
