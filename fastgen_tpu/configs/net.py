"""Network config zoo (ref ``fastgen/configs/net.py``).

``build_edm`` keeps the reference's flat-kwargs surface (backbone hyperparams
inline with the precond's) while the flax EDMPrecond takes them as a
``model_kwargs`` dict.
"""

from __future__ import annotations

import os

from fastgen_tpu.configs.lazy import LazyCall as L

OUTPUT_ROOT = os.environ.get("FASTGEN_OUTPUT_ROOT", "FASTGEN_OUTPUT")
CKPT_ROOT_DIR = os.getenv("CKPT_ROOT_DIR", f"{OUTPUT_ROOT}/MODEL")

_EDM_PRECOND_FIELDS = {
    "img_resolution", "img_channels", "label_dim", "sigma_data", "sigma_shift",
    "model_type", "drop_precond", "net_pred_type", "schedule_type", "schedule_kwargs",
}


def build_edm(**kwargs):
    from fastgen_tpu.networks.edm.network import EDMPrecond

    precond = {k: v for k, v in kwargs.items() if k in _EDM_PRECOND_FIELDS}
    model_kwargs = {k: v for k, v in kwargs.items() if k not in _EDM_PRECOND_FIELDS}
    return EDMPrecond(model_kwargs=model_kwargs, **precond)


EDM_CIFAR10_Config = L(build_edm)(
    img_resolution=32,
    img_channels=3,
    label_dim=10,
    sigma_shift=0.0,
    sigma_data=0.5,
    model_type="SongUNet",
    augment_dim=9,
    model_channels=128,
    channel_mult=[2, 2, 2],
    channel_mult_noise=1,
    embedding_type="positional",
    encoder_type="standard",
    decoder_type="standard",
    resample_filter=[1, 1],
    dropout=0.0,
    label_dropout=0,
    r_timestep=False,
    drop_precond=None,
)

EDM_ImageNet64_Config = L(build_edm)(
    img_resolution=64,
    img_channels=3,
    label_dim=1000,
    sigma_shift=0.0,
    sigma_data=0.5,
    model_type="DhariwalUNet",
    augment_dim=0,
    model_channels=192,
    channel_mult=[1, 2, 3, 4],
    channel_mult_emb=4,
    num_blocks=3,
    attn_resolutions=[32, 16, 8],
    dropout=0.0,
    label_dropout=0,
    r_timestep=False,
    drop_precond=None,
)

# Tiny config for smoke tests / CI (CPU-runnable)
EDM_Test_Config = L(build_edm)(
    img_resolution=16,
    img_channels=3,
    label_dim=10,
    sigma_data=0.5,
    model_type="SongUNet",
    model_channels=16,
    channel_mult=[1, 2],
    num_blocks=1,
    attn_resolutions=[8],
    dropout=0.0,
)


def build_dit(**kwargs):
    from fastgen_tpu.networks.dit.network import DiT

    return DiT(**kwargs)


# DiT-XL/2 on 256x256 ImageNet latents (ref ``configs/net.py`` DiT zoo)
DiT_XL2_Config = L(build_dit)(
    input_size=32, patch_size=2, in_channels=4, hidden_size=1152, depth=28,
    num_heads=16, num_classes=1000, class_dropout_prob=0.1,
    enable_class_dropout=True, net_pred_type="flow", schedule_type="rf")

DiT_B2_Config = L(build_dit)(
    input_size=32, patch_size=2, in_channels=4, hidden_size=768, depth=12,
    num_heads=12, num_classes=1000, class_dropout_prob=0.1,
    enable_class_dropout=True, net_pred_type="flow", schedule_type="rf")

DiT_Test_Config = L(build_dit)(
    input_size=8, patch_size=2, in_channels=4, hidden_size=64, depth=2,
    num_heads=4, num_classes=10, class_dropout_prob=0.1,
    net_pred_type="flow", schedule_type="rf")


def build_wan(**kwargs):
    from fastgen_tpu.networks.wan.network import WanVideoDiT

    return WanVideoDiT(**kwargs)


def build_causal_wan(**kwargs):
    from fastgen_tpu.networks.wan.network import CausalWanVideoDiT

    return CausalWanVideoDiT(**kwargs)


# Wan2.1-1.3B T2V (ref ``configs/net.py`` Wan zoo; inner_dim map
# ``Wan/network.py:641-694``): dim 1536, 30 layers, 12 heads, ffn 8960
Wan_1_3B_Config = L(build_wan)(
    dim=1536, num_layers=30, num_heads=12, ffn_dim=8960, in_channels=16,
    out_channels=16, text_dim=4096, rope_max_seq_len=1024,
    net_pred_type="flow", schedule_type="rf")

# Wan2.1-14B T2V: dim 5120, 40 layers, 40 heads, ffn 13824
Wan_14B_Config = L(build_wan)(
    dim=5120, num_layers=40, num_heads=40, ffn_dim=13824, in_channels=16,
    out_channels=16, text_dim=4096, rope_max_seq_len=1024,
    net_pred_type="flow", schedule_type="rf")

CausalWan_14B_Config = L(build_causal_wan)(
    dim=5120, num_layers=40, num_heads=40, ffn_dim=13824, in_channels=16,
    out_channels=16, text_dim=4096, rope_max_seq_len=1024,
    chunk_size=3, total_num_frames=21, frame_height=60, frame_width=104,
    net_pred_type="flow", schedule_type="rf")

CausalWan_1_3B_Config = L(build_causal_wan)(
    dim=1536, num_layers=30, num_heads=12, ffn_dim=8960, in_channels=16,
    out_channels=16, text_dim=4096, rope_max_seq_len=1024,
    chunk_size=3, total_num_frames=21, frame_height=60, frame_width=104,
    net_pred_type="flow", schedule_type="rf")

# Tiny video configs for smoke tests
Wan_Test_Config = L(build_wan)(
    dim=96, num_layers=2, num_heads=4, ffn_dim=128, in_channels=4,
    out_channels=4, text_dim=32, rope_max_seq_len=64,
    net_pred_type="flow", schedule_type="rf")

CausalWan_Test_Config = L(build_causal_wan)(
    dim=96, num_layers=2, num_heads=4, ffn_dim=128, in_channels=4,
    out_channels=4, text_dim=32, rope_max_seq_len=64,
    chunk_size=2, total_num_frames=4, frame_height=8, frame_width=8,
    net_pred_type="flow", schedule_type="rf")


def build_edm2(**kwargs):
    from fastgen_tpu.networks.edm2.network import EDM2Precond

    precond_fields = {"img_resolution", "img_channels", "label_dim", "sigma_data",
                      "sigma_shift", "logvar_channels", "drop_precond",
                      "net_pred_type", "schedule_type", "schedule_kwargs"}
    precond = {k: v for k, v in kwargs.items() if k in precond_fields}
    model_kwargs = {k: v for k, v in kwargs.items() if k not in precond_fields}
    return EDM2Precond(model_kwargs=model_kwargs, **precond)


# EDM2 ImageNet-64 S (ref ``configs/net.py`` EDM2_IN64_S_Config)
EDM2_IN64_S_Config = L(build_edm2)(
    img_resolution=64, img_channels=3, label_dim=1000, sigma_data=0.5,
    sigma_shift=0.0, logvar_channels=128, model_channels=192,
    channel_mult=[1, 2, 3, 4], channel_mult_noise=None, channel_mult_emb=None,
    num_blocks=3, attn_resolutions=[16, 8], dropout=0.0)

EDM2_IN64_XL_Config = L(build_edm2)(
    img_resolution=64, img_channels=3, label_dim=1000, sigma_data=0.5,
    sigma_shift=0.0, logvar_channels=128, model_channels=448,
    channel_mult=[1, 2, 3, 4], channel_mult_noise=None, channel_mult_emb=None,
    num_blocks=3, attn_resolutions=[16, 8], dropout=0.0)

EDM2_Test_Config = L(build_edm2)(
    img_resolution=16, img_channels=3, label_dim=10, sigma_data=0.5,
    logvar_channels=32, model_channels=16, channel_mult=[1, 2], num_blocks=1,
    attn_resolutions=[8], dropout=0.0)


def build_sd15(**kwargs):
    from fastgen_tpu.networks.sd.unet import StableDiffusion15

    return StableDiffusion15(**kwargs)


def build_sdxl(**kwargs):
    from fastgen_tpu.networks.sd.unet import StableDiffusionXL

    return StableDiffusionXL(**kwargs)


def build_flux(**kwargs):
    from fastgen_tpu.networks.flux.network import Flux

    return Flux(**kwargs)


def build_cogvideox(**kwargs):
    from fastgen_tpu.networks.cogvideox.network import CogVideoX

    return CogVideoX(**kwargs)


def build_cosmos(**kwargs):
    from fastgen_tpu.networks.cosmos.network import CosmosPredict2

    return CosmosPredict2(**kwargs)


def build_wan_i2v(**kwargs):
    from fastgen_tpu.networks.wan.network_i2v import WanI2V

    return WanI2V(**kwargs)


def build_causal_wan_i2v(**kwargs):
    from fastgen_tpu.networks.wan.network_i2v import CausalWanI2V

    return CausalWanI2V(**kwargs)


def build_vace_wan(**kwargs):
    from fastgen_tpu.networks.wan.network_vace import VACEWan

    return VACEWan(**kwargs)


def build_causal_vace_wan(**kwargs):
    from fastgen_tpu.networks.wan.network_vace import CausalVACEWan

    return CausalVACEWan(**kwargs)


SD15_Config = L(build_sd15)(context_dim=768, in_channels=4)

SDXL_Config = L(build_sdxl)(context_dim=2048, in_channels=4)

# Flux.1-dev: 19 joint + 38 single blocks, dim 3072, guidance-distilled
Flux_Config = L(build_flux)(
    dim=3072, num_layers=19, num_single_layers=38, num_heads=24,
    in_channels=16, text_dim=4096, pooled_dim=768, guidance_embeds=True)

CogVideoX_2B_Config = L(build_cogvideox)(
    dim=1920, num_layers=30, num_heads=30, in_channels=16, text_dim=4096,
    use_rotary=False)

CogVideoX_5B_Config = L(build_cogvideox)(
    dim=3072, num_layers=42, num_heads=48, in_channels=16, text_dim=4096,
    use_rotary=True)

CosmosPredict2_2B_Config = L(build_cosmos)(
    dim=2048, num_layers=28, num_heads=16, ffn_dim=8192, in_channels=16,
    out_channels=16, text_dim=1024, rope_max_seq_len=1024)

# 14B (ref ``configs/net.py`` CosmosPredict2_14B_Config: 5120 ch, 36 blocks,
# 40 heads)
CosmosPredict2_14B_Config = L(build_cosmos)(
    dim=5120, num_layers=36, num_heads=40, ffn_dim=20480, in_channels=16,
    out_channels=16, text_dim=1024, rope_max_seq_len=1024,
    remat_mode="block_wise")

WanI2V_14B_Config = L(build_wan_i2v)(
    dim=5120, num_layers=40, num_heads=40, ffn_dim=13824, in_channels=16,
    out_channels=16, text_dim=4096, rope_max_seq_len=1024, image_embed_dim=1280)

CausalWanI2V_1_3B_Config = L(build_causal_wan_i2v)(
    dim=1536, num_layers=30, num_heads=12, ffn_dim=8960, in_channels=16,
    out_channels=16, text_dim=4096, rope_max_seq_len=1024,
    chunk_size=3, total_num_frames=21, frame_height=60, frame_width=104)

VACEWan_1_3B_Config = L(build_vace_wan)(
    dim=1536, num_layers=30, num_heads=12, ffn_dim=8960, in_channels=16,
    out_channels=16, text_dim=4096, rope_max_seq_len=1024, num_vace_layers=8)

CausalVACEWan_1_3B_Config = L(build_causal_vace_wan)(
    dim=1536, num_layers=30, num_heads=12, ffn_dim=8960, in_channels=16,
    out_channels=16, text_dim=4096, rope_max_seq_len=1024, num_vace_layers=8,
    chunk_size=3, total_num_frames=21, frame_height=60, frame_width=104)


def build_ltx2(**kwargs):
    from fastgen_tpu.networks.ltx2.network import LTX2VideoDiT

    return LTX2VideoDiT(**kwargs)


# LTX-2 video-only transformer (ref ``networks/LTX2/transformer_ltx2.py:791``;
# full size: 32 heads x 128, 48 layers, 128 packed latent channels, Gemma3
# connector captions 3840-d)
LTX2_Config = L(build_ltx2)(
    in_channels=128, out_channels=128, num_heads=32, head_dim=128,
    num_layers=48, caption_channels=3840, rope_max_seq_len=4096,
    remat=True, net_pred_type="flow", schedule_type="rf")

LTX2_Test_Config = L(build_ltx2)(
    in_channels=4, out_channels=4, num_heads=4, head_dim=24, num_layers=2,
    caption_channels=32, rope_max_seq_len=64,
    net_pred_type="flow", schedule_type="rf")


SD15_Test_Config = L(build_sd15)(
    context_dim=16, in_channels=4, img_resolution=16,
    block_out_channels=[8, 16], transformer_depths=[1, 0], fixed_num_heads=2)


def build_depth_annotator(**kwargs):
    from fastgen_tpu.networks.annotators import DepthAnnotator

    return DepthAnnotator(**kwargs)


# VACE on-the-fly depth control (ref vace_depth_annotator.py:15-139; weights
# expected at the reference's default cache path when available locally)
DepthAnnotator_Config = L(build_depth_annotator)(
    variant="vitl",
    params_path=f"{OUTPUT_ROOT}/.cache/annotators/depth_anything_v2_vitl.pth",
    input_size=518)


WanI2V_Test_Config = L(build_wan_i2v)(
    dim=96, num_layers=2, num_heads=4, ffn_dim=128, in_channels=4,
    out_channels=4, text_dim=32, rope_max_seq_len=64, image_embed_dim=16,
    net_pred_type="flow", schedule_type="rf")

VACEWan_Test_Config = L(build_vace_wan)(
    dim=96, num_layers=2, num_heads=4, ffn_dim=128, in_channels=4,
    out_channels=4, text_dim=32, rope_max_seq_len=64, num_vace_layers=1,
    net_pred_type="flow", schedule_type="rf")


# Wan2.2 TI2V-5B (ref ``configs/net.py`` Wan22_*_5B_Config; inner_dim 3072,
# ``Wan/network.py:686-689`` expand_timesteps; 48-ch 16x-spatial VAE latents).
Wan22_T2V_5B_Config = L(build_wan)(
    dim=3072, num_layers=30, num_heads=24, ffn_dim=14336, in_channels=48,
    out_channels=48, text_dim=4096, rope_max_seq_len=1024,
    net_pred_type="flow", schedule_type="rf")

# frame-replacement I2V (no concat mask, no CLIP image encoder;
# ref ``WanI2V/network.py:184-190``)
Wan22_I2V_5B_Config = L(build_wan_i2v)(
    dim=3072, num_layers=30, num_heads=24, ffn_dim=14336, in_channels=48,
    out_channels=48, text_dim=4096, rope_max_seq_len=1024,
    concat_mask=False, net_pred_type="flow", schedule_type="rf")

CausalWan22_I2V_5B_Config = L(build_causal_wan_i2v)(
    dim=3072, num_layers=30, num_heads=24, ffn_dim=14336, in_channels=48,
    out_channels=48, text_dim=4096, rope_max_seq_len=1024, concat_mask=False,
    chunk_size=3, total_num_frames=21, frame_height=44, frame_width=80,
    net_pred_type="flow", schedule_type="rf")


CausalWanI2V_Test_Config = L(build_causal_wan_i2v)(
    dim=96, num_layers=2, num_heads=4, ffn_dim=128, in_channels=4,
    out_channels=4, text_dim=32, rope_max_seq_len=64,
    chunk_size=1, total_num_frames=3, frame_height=8, frame_width=8,
    net_pred_type="flow", schedule_type="rf")


CausalVACEWan_Test_Config = L(build_causal_vace_wan)(
    dim=96, num_layers=2, num_heads=4, ffn_dim=128, in_channels=4,
    out_channels=4, text_dim=32, rope_max_seq_len=64, num_vace_layers=1,
    chunk_size=1, total_num_frames=3, frame_height=8, frame_width=8,
    net_pred_type="flow", schedule_type="rf")
