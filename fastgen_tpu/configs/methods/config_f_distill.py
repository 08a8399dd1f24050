"""f-distill method config (ref ``fastgen/configs/methods/config_f_distill.py``)."""

from __future__ import annotations


import attrs

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_dmd2 import (
    Config as DMD2Config,
    ModelConfig as DMD2ModelConfig,
    create_config as create_dmd2_config,
)
from fastgen_tpu.methods.distribution_matching.f_distill import FdistillModel


@attrs.define(slots=False)
class FDistillConfig:
    # f-divergence: rkl | kl | js | sf | neyman | sh | jf
    f_div: str = "kl"
    # clamp range for the density ratio
    ratio_lower: float = 1e-3
    ratio_upper: float = 1e3
    # per-t-bin EMA ratio normalization
    ratio_normalization: bool = True
    bin_num: int = 100
    ratio_ema_rate: float = 0.99


@attrs.define(slots=False)
class ModelConfig(DMD2ModelConfig):
    f_distill: FDistillConfig = attrs.field(factory=FDistillConfig)
    gan_loss_weight_gen: float = 0.001


@attrs.define(slots=False)
class Config(DMD2Config):
    model: ModelConfig = attrs.field(factory=ModelConfig)
    model_class: dict = attrs.field(factory=lambda: L(FdistillModel)(config=None))


def create_config() -> Config:
    base = create_dmd2_config()
    config = Config()
    config.trainer = base.trainer
    config.dataloader_train = base.dataloader_train
    config.model.sample_t_cfg.time_dist_type = "polynomial"
    return config
