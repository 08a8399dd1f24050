"""Causal SFT on CausalVACEWan (ref
``configs/experiments/WanV2V/config_sft_causal.py``): diffusion-forcing
warm-start for Self-Forcing v2v."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import (
    create_causal_config as create_causal_sft_config)
from fastgen_tpu.configs.net import CausalVACEWan_1_3B_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_causal_sft_config()
    config.log_config.group = "wan_v2v"
    config.log_config.name = "sft_causal_vacewan"
    config.model.net = copy.deepcopy(CausalVACEWan_1_3B_Config)
    config.model.net.total_num_frames = 21
    config.model.input_shape = [21, 60, 104, 16]
    config.model.net_optimizer.lr = 5e-5
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/vace_latents"], batch_size=1,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy",
                 "vid_context": "depth_latent.npy"})
    config.trainer.fsdp = True
    config.trainer.max_iter = 5000
    config.trainer.batch_size_global = 32
    return config
