"""CausVid on CausalWan-1.3B T2V (ref
``configs/experiments/WanT2V/config_causvid.py``): diffusion-forcing student
distilled from the bidirectional Wan-1.3B teacher on latent video shards."""

from __future__ import annotations

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_causvid import (
    create_config as create_causvid_config)
from fastgen_tpu.data.wds import VideoWDSLoader


def create_config():
    config = create_causvid_config()
    config.log_config.group = "wan_t2v"
    config.log_config.name = "causvid_wan1_3b"
    config.model.input_shape = [21, 60, 104, 16]
    config.model.net.total_num_frames = 21
    config.model.gan_loss_weight_gen = 0.001
    config.model.guidance_scale = 5.0
    config.model.student_sample_steps = 4
    config.model.net_optimizer.lr = 5e-5
    config.model.fake_score_optimizer.lr = 5e-5
    config.model.discriminator_optimizer.lr = 5e-5
    config.model.sample_t_cfg.time_dist_type = "shifted"
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = L(VideoWDSLoader)(
        datatags=["WDS:/path/to/wan_video_latents"], batch_size=2,
        sequence_length=81,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy"})
    config.trainer.fsdp = True
    config.trainer.batch_size_global = 64
    return config
