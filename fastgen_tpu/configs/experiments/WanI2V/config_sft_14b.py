"""SFT on WanI2V-14B (ref ``configs/experiments/WanI2V/config_sft_14b.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import WanI2V_14B_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_sft_config()
    config.log_config.group = "wan_i2v"
    config.log_config.name = "sft_wani2v_14b"
    config.model.net = copy.deepcopy(WanI2V_14B_Config)
    config.model.input_shape = [21, 60, 104, 16]
    config.model.net_optimizer.lr = 5e-5
    config.model.guidance_scale = 5.0
    config.model.student_sample_steps = 50
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/wani2v_latents"], batch_size=1,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy",
                 "first_frame_cond": "ff_cond.npy"})
    config.trainer.fsdp = True
    config.trainer.batch_size_global = 32
    return config
