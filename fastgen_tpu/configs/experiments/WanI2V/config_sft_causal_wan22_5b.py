"""Causal SFT on CausalWan2.2-TI2V-5B I2V (ref
``configs/experiments/WanI2V/config_sft_causal_wan22_5b.py``):
diffusion-forcing warm start for causal distillation, frame-replacement
first-frame conditioning."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.experiments.WanT2V.config_sft_causal import (
    create_config as create_sft_causal_config)
from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.net import CausalWan22_I2V_5B_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_sft_causal_config()
    config.log_config.group = "wan_i2v"
    config.log_config.name = "sft_causal_wani2v_wan22_5b"
    config.model.net = copy.deepcopy(CausalWan22_I2V_5B_Config)
    config.model.input_shape = [21, 44, 80, 48]
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/wani2v_latents"], batch_size=1,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy",
                 "first_frame_cond": "ff_cond.npy"})
    return config
