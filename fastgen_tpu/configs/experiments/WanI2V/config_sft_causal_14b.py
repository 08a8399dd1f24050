"""Causal SFT on a 14B-width CausalWanI2V (ref
``configs/experiments/WanI2V/config_sft_causal_14b.py``): diffusion-forcing
warm-start for causal I2V distillation."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import (
    create_causal_config as create_causal_sft_config)
from fastgen_tpu.configs.net import CausalWanI2V_1_3B_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_causal_sft_config()
    config.log_config.group = "wan_i2v"
    config.log_config.name = "sft_causal_wani2v_14b"
    net = copy.deepcopy(CausalWanI2V_1_3B_Config)
    # 14B width (ref ``networks/Wan/network.py:641-694`` id->dim map)
    net.dim = 5120
    net.num_layers = 40
    net.num_heads = 40
    net.ffn_dim = 13824
    net.image_embed_dim = 1280
    config.model.net = net
    config.model.input_shape = [21, 60, 104, 16]
    config.model.net_optimizer.lr = 5e-5
    config.model.guidance_scale = 5.0
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/wani2v_latents"], batch_size=1,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy",
                 "first_frame_cond": "ff_cond.npy"})
    config.trainer.fsdp = True
    config.trainer.max_iter = 5000
    config.trainer.batch_size_global = 32
    return config
