"""DMD2 on CogVideoX-2B (ref ``configs/experiments/CogVideoX/config_dmd2.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.discriminator import Discriminator_CogVideoX2B_Config
from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_dmd2 import create_config as create_dmd2_config
from fastgen_tpu.configs.net import CogVideoX_2B_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_dmd2_config()
    config.log_config.group = "cogvideox"
    config.log_config.name = "dmd2_cogvideox2b"
    config.model.net = copy.deepcopy(CogVideoX_2B_Config)
    config.model.discriminator = copy.deepcopy(Discriminator_CogVideoX2B_Config)
    config.model.input_shape = [13, 60, 90, 16]
    config.model.student_sample_steps = 4
    config.model.guidance_scale = 6.0
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/cogvideox_latents"], batch_size=1,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy"},
        presets_map={"neg_condition": "empty_string"})
    config.trainer.fsdp = True
    return config
