"""DMD2 on Cosmos-Predict2.5-14B (ref
``configs/experiments/CosmosPredict2/config_dmd2_14b.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.experiments.CosmosPredict2.config_dmd2 import (
    create_config as create_dmd2_cosmos_config)
from fastgen_tpu.configs.net import CKPT_ROOT_DIR, CosmosPredict2_14B_Config


def create_config():
    config = create_dmd2_cosmos_config()
    config.log_config.name = "dmd2_cosmos14b"
    config.model.net = copy.deepcopy(CosmosPredict2_14B_Config)
    config.model.pretrained_model_path = (
        f"{CKPT_ROOT_DIR}/cosmos_predict2/Cosmos-Predict2.5-14B/base.pt")
    config.trainer.mesh.fsdp = 8
    return config
