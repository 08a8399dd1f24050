"""Causal SFT on CausalWan-14B (ref
``configs/experiments/WanT2V/config_sft_causal_14b.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.experiments.WanT2V.config_sft_causal import (
    create_config as create_sft_causal_config)
from fastgen_tpu.configs.net import CausalWan_14B_Config


def create_config():
    config = create_sft_causal_config()
    config.log_config.name = "sft_causal_wan14b"
    config.model.net = copy.deepcopy(CausalWan_14B_Config)
    config.model.net_optimizer.lr = 1e-5
    config.trainer.mesh.fsdp = 8
    return config
