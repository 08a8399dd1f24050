"""SFT on EDM2-XL ImageNet-64 (ref ``configs/experiments/EDM2/config_sft_xl.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.experiments.EDM2.config_sft_s import (
    create_config as create_sft_s_config)
from fastgen_tpu.configs.net import EDM2_IN64_XL_Config


def create_config():
    config = create_sft_s_config()
    config.log_config.name = "sft_edm2_xl"
    config.model.net = copy.deepcopy(EDM2_IN64_XL_Config)
    return config
