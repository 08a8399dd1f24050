"""SFT on LTX-2 (video-only; the reference carries LTX2 as an in-tree WIP
with its own tests, ``networks/LTX2/`` — no upstream experiment config yet)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import LTX2_Config
from fastgen_tpu.data.wds import VideoWDSLoader


def create_config():
    config = create_sft_config()
    config.log_config.group = "ltx2"
    config.log_config.name = "sft_ltx2"
    config.model.net = copy.deepcopy(LTX2_Config)
    # packed latents: 8 latent frames x 16x16 tokens x 128 channels
    config.model.input_shape = [8, 16, 16, 128]
    config.model.net_optimizer.lr = 1e-5
    config.model.guidance_scale = 4.0
    config.model.student_sample_steps = 40
    config.model.precision_amp = "bfloat16"
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.dataloader_train = L(VideoWDSLoader)(
        datatags=["WDS:/path/to/ltx2_video_latents"], batch_size=1,
        sequence_length=8,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy"})
    config.trainer.fsdp = True
    config.trainer.batch_size_global = 32
    return config
