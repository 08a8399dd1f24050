"""SFT on Cosmos-Predict2.5-2B video2world (ref
``configs/experiments/CosmosPredict2/config_sft_v2w.py``)."""

from __future__ import annotations

from fastgen_tpu.configs.experiments.CosmosPredict2.config_sft import (
    create_config as create_sft_cosmos_config)


def create_config():
    config = create_sft_cosmos_config()
    config.log_config.group = "cosmos_predict2_sft_v2w"
    config.model.net.is_video2world = True
    config.model.net.num_conditioning_frames = 1
    return config
