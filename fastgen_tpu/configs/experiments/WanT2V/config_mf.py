"""MeanFlow on Wan-1.3B T2V (ref ``configs/experiments/WanT2V/config_mf.py``):
mean-velocity few-step distillation; Wan gets an r_embedder for the second
time input."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_mean_flow import (
    create_config as create_mf_config)
from fastgen_tpu.configs.net import Wan_1_3B_Config
from fastgen_tpu.data.wds import VideoWDSLoader


def create_config():
    config = create_mf_config()
    config.log_config.group = "wan_t2v"
    config.log_config.name = "mf_wan1_3b"
    net = copy.deepcopy(Wan_1_3B_Config)
    net.r_timestep = True
    config.model.net = net
    config.model.input_shape = [21, 60, 104, 16]
    config.model.net_optimizer.lr = 1e-5
    config.model.guidance_scale = 3.0
    config.model.sample_t_cfg.time_dist_type = "logitnormal"
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = L(VideoWDSLoader)(
        datatags=["WDS:/path/to/wan_video_latents"], batch_size=1,
        sequence_length=81,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy"})
    config.trainer.fsdp = True
    config.trainer.batch_size_global = 32
    return config
