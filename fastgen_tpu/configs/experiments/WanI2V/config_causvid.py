"""CausVid on CausalWanI2V (ref ``configs/experiments/WanI2V/...``): causal
image-to-video distillation with first-frame conditioning."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_causvid import create_config as create_causvid_config
from fastgen_tpu.configs.net import CausalWanI2V_1_3B_Config, WanI2V_14B_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_causvid_config()
    config.log_config.group = "wan_i2v"
    config.log_config.name = "causvid_wani2v"
    config.model.net = copy.deepcopy(CausalWanI2V_1_3B_Config)
    config.model.teacher = copy.deepcopy(WanI2V_14B_Config)
    config.model.input_shape = [21, 60, 104, 16]
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/wani2v_latents"], batch_size=1,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy",
                 "first_frame_cond": "ff_cond.npy"})
    config.trainer.fsdp = True
    return config
