"""CausVid method config (ref ``fastgen/configs/methods/config_causvid.py``)."""

from __future__ import annotations

import copy
from typing import Optional

import attrs

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_dmd2 import (
    Config as DMD2Config,
    ModelConfig as DMD2ModelConfig,
    create_config as create_dmd2_config,
)
from fastgen_tpu.configs.net import CausalWan_1_3B_Config, Wan_1_3B_Config
from fastgen_tpu.methods.distribution_matching.causvid import CausVidModel


@attrs.define(slots=False)
class ModelConfig(DMD2ModelConfig):
    net: dict = attrs.field(factory=lambda: copy.deepcopy(CausalWan_1_3B_Config))
    # bidirectional teacher (and fake_score) architecture
    teacher: Optional[dict] = attrs.field(factory=lambda: copy.deepcopy(Wan_1_3B_Config))
    # video latents [T, H, W, C]
    input_shape: list = attrs.field(factory=lambda: [21, 60, 104, 16])
    gan_loss_weight_gen: float = 0.0
    student_sample_steps: int = 4
    # noise level on cached context frames
    context_noise: float = 0.0


@attrs.define(slots=False)
class Config(DMD2Config):
    model: ModelConfig = attrs.field(factory=ModelConfig)
    model_class: dict = attrs.field(factory=lambda: L(CausVidModel)(config=None))


def create_config() -> Config:
    base = create_dmd2_config()
    config = Config()
    config.trainer = base.trainer
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    return config
