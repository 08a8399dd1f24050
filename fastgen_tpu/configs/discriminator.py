"""Discriminator config zoo (ref ``fastgen/configs/discriminator.py``)."""

from __future__ import annotations

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.networks.discriminators import (
    Discriminator_EDM,
    Discriminator_ImageDiT,
    Discriminator_SD15,
    Discriminator_SDXL,
)

Discriminator_EDM_CIFAR10_Config = L(Discriminator_EDM)(
    feature_indices=(0, 1, 2),
    all_res=(32, 16, 8),
    in_channels=256,
)

Discriminator_EDM_ImageNet64_Config = L(Discriminator_EDM)(
    feature_indices=None,
    all_res=(64, 32, 16, 8),
    in_channels=768,
)

Discriminator_SD15_Res512_Config = L(Discriminator_SD15)(
    feature_indices=None,
    all_res=(32, 16, 8, 8, 8),
    in_channels=1280,
)

Discriminator_SDXL_Res512_Config = L(Discriminator_SDXL)(
    feature_indices=None,
    all_res=(32, 16, 16, 16),
    in_channels=1280,
)

Discriminator_SDXL_Res1024_Config = L(Discriminator_SDXL)(
    feature_indices=None,
    all_res=(64, 32, 32, 32),
    in_channels=1280,
)

Discriminator_Flux_Config = L(Discriminator_ImageDiT)(
    feature_indices=None,
    num_blocks=57,
    inner_dim=3072,
)

# Tiny head for smoke tests (matches EDM_Test_Config feature shapes)
Discriminator_EDM_Test_Config = L(Discriminator_EDM)(
    feature_indices=(0, 1),
    all_res=(16, 8),
    in_channels=32,
)


from fastgen_tpu.networks.discriminators import Discriminator_VideoDiT

# 2B patchify spatial-2; inner_dim=1920//4 (ref ``discriminator.py``)
Discriminator_CogVideoX2B_Config = L(Discriminator_VideoDiT)(
    feature_indices=None, num_blocks=30, disc_type="dit_simple_conv3d",
    inner_dim=1920 // 4)

Discriminator_Wan_Config = L(Discriminator_VideoDiT)(
    feature_indices=None, num_blocks=30, disc_type="dit_conv1d_2d",
    inner_dim=1536 // 4)


# 14B patchify: spatial-2, temporal-1; inner_dim=5120; 40 layers
Discriminator_Wan_14B_Config = L(Discriminator_VideoDiT)(
    feature_indices=None, num_blocks=40, disc_type="dit_simple_conv3d",
    inner_dim=5120 // 4)

# Wan2.2-5B: inner_dim=3072; 30 layers
Discriminator_Wan22_5B_Config = L(Discriminator_VideoDiT)(
    feature_indices=None, num_blocks=30, disc_type="dit_simple_conv3d",
    inner_dim=3072 // 4)

# CogVideoX-5B: inner_dim=3072; 42 layers
Discriminator_CogVideoX5B_Config = L(Discriminator_VideoDiT)(
    feature_indices=None, num_blocks=42, disc_type="dit_simple_conv3d",
    inner_dim=3072 // 4)

# Cosmos Predict2.5 (inner_dim must match the model's, ref discriminator.py)
Discriminator_CosmosPredict2_2B_Config = L(Discriminator_VideoDiT)(
    feature_indices=None, num_blocks=28, disc_type="dit_simple_conv3d",
    inner_dim=2048)

Discriminator_CosmosPredict2_14B_Config = L(Discriminator_VideoDiT)(
    feature_indices=None, num_blocks=36, disc_type="dit_simple_conv3d",
    inner_dim=5120)
