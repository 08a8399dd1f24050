"""LADD method config (ref ``fastgen/configs/methods/config_ladd.py``)."""

from __future__ import annotations


import attrs

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_dmd2 import (
    Config as DMD2Config,
    ModelConfig as DMD2ModelConfig,
    create_config as create_dmd2_config,
)
from fastgen_tpu.methods.distribution_matching.ladd import LADDModel


@attrs.define(slots=False)
class ModelConfig(DMD2ModelConfig):
    student_update_freq: int = 2
    gan_loss_weight_gen: float = 1.0
    gan_r1_reg_weight: float = 0.0


@attrs.define(slots=False)
class Config(DMD2Config):
    model: ModelConfig = attrs.field(factory=ModelConfig)
    model_class: dict = attrs.field(factory=lambda: L(LADDModel)(config=None))


def create_config() -> Config:
    base = create_dmd2_config()
    config = Config()
    config.trainer = base.trainer
    config.dataloader_train = base.dataloader_train
    config.model.sample_t_cfg.time_dist_type = "polynomial"
    return config
