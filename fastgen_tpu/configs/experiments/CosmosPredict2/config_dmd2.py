"""DMD2 on Cosmos Predict2 video2world (ref ``configs/experiments/
CosmosPredict2/config_dmd2.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_dmd2 import create_config as create_dmd2_config
from fastgen_tpu.configs.net import CosmosPredict2_2B_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_dmd2_config()
    config.log_config.group = "cosmos"
    config.log_config.name = "dmd2_cosmos2b"
    config.model.net = copy.deepcopy(CosmosPredict2_2B_Config)
    config.model.input_shape = [24, 44, 80, 16]
    config.model.gan_loss_weight_gen = 0.0
    config.model.student_sample_steps = 4
    config.model.guidance_scale = 7.0
    config.model.precision_amp = "bfloat16"
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/cosmos_latents"], batch_size=1,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy",
                 "conditioning_latents": "cond_latent.npy",
                 "condition_mask": "cond_mask.npy"})
    config.trainer.fsdp = True
    return config
