"""SFT on CogVideoX-2B (ref ``configs/experiments/CogVideoX/config_sft.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import CogVideoX_2B_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_sft_config()
    config.log_config.group = "cogvideox"
    config.log_config.name = "sft_cogvideox2b"
    config.model.net = copy.deepcopy(CogVideoX_2B_Config)
    config.model.input_shape = [13, 60, 90, 16]
    config.model.net_optimizer.lr = 5e-5
    config.model.guidance_scale = 6.0
    config.model.student_sample_steps = 50
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/cogvideox_latents"], batch_size=2,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy"})
    config.trainer.fsdp = True
    config.trainer.batch_size_global = 32
    return config
