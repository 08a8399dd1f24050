"""Self-Forcing on CausalWan-1.3B (ref ``configs/experiments/WanT2V/
config_self_forcing.py``): autoregressive student, bidirectional teacher."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_self_forcing import (
    create_config as create_sf_config)
from fastgen_tpu.configs.net import CausalWan_1_3B_Config, Wan_1_3B_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_sf_config()
    config.log_config.group = "wan_t2v"
    config.log_config.name = "self_forcing_wan1_3b"
    config.model.net = copy.deepcopy(CausalWan_1_3B_Config)
    config.model.teacher = copy.deepcopy(Wan_1_3B_Config)
    config.model.input_shape = [21, 60, 104, 16]
    config.model.student_sample_steps = 4
    config.model.guidance_scale = 5.0
    config.model.context_noise = 0.1
    config.model.precision_amp = "bfloat16"
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/wan_latents"], batch_size=1,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy"},
        files_map={"neg_condition": "/path/to/neg_prompt_emb.npy"})
    config.trainer.fsdp = True
    config.trainer.batch_size_global = 32
    return config
