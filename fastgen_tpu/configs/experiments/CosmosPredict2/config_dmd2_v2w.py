"""DMD2 on Cosmos-Predict2.5-2B video2world (ref
``configs/experiments/CosmosPredict2/config_dmd2_v2w.py``)."""

from __future__ import annotations

from fastgen_tpu.configs.experiments.CosmosPredict2.config_dmd2 import (
    create_config as create_dmd2_cosmos_config)


def create_config():
    config = create_dmd2_cosmos_config()
    config.log_config.group = "cosmos_predict2_dmd2_v2w"
    config.model.net.is_video2world = True
    config.model.net.num_conditioning_frames = 1
    return config
