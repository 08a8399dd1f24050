"""Self-Forcing on CausalVACEWan video-to-video (ref
``configs/experiments/WanV2V/config_sf.py``): rollout-trained causal v2v with
depth conditioning."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_self_forcing import (
    create_config as create_sf_config)
from fastgen_tpu.configs.net import CausalVACEWan_1_3B_Config, VACEWan_1_3B_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_sf_config()
    config.log_config.group = "wan_v2v"
    config.log_config.name = "sf_vacewan"
    config.model.net = copy.deepcopy(CausalVACEWan_1_3B_Config)
    config.model.teacher = copy.deepcopy(VACEWan_1_3B_Config)
    config.model.input_shape = [21, 60, 104, 16]
    config.model.net.total_num_frames = 21
    config.model.net_optimizer.lr = 5e-6
    config.model.fake_score_optimizer.lr = 5e-6
    config.model.discriminator_optimizer.lr = 5e-6
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/vace_latents"], batch_size=1,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy",
                 "vid_context": "depth_latent.npy"})
    config.trainer.fsdp = True
    config.trainer.batch_size_global = 32
    return config
