"""SFT on VACEWan-14B V2V (ref
``configs/experiments/WanV2V/config_sft_14b.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.experiments.WanV2V.config_sft import (
    create_config as create_v2v_sft_config)
from fastgen_tpu.configs.net import build_vace_wan
from fastgen_tpu.configs.lazy import LazyCall as L

VACEWan_14B_Config = L(build_vace_wan)(
    dim=5120, num_layers=40, num_heads=40, ffn_dim=13824, in_channels=16,
    out_channels=16, text_dim=4096, rope_max_seq_len=1024, num_vace_layers=8,
    net_pred_type="flow", schedule_type="rf")


def create_config():
    config = create_v2v_sft_config()
    config.log_config.name = "sft_vacewan_14b"
    config.model.net = copy.deepcopy(VACEWan_14B_Config)
    config.model.net_optimizer.lr = 1e-5
    config.trainer.mesh.fsdp = 8
    return config
