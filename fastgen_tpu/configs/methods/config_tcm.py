"""TCM method config (ref ``fastgen/configs/methods/config_tcm.py``)."""

from __future__ import annotations


import attrs

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_cm import (
    Config as CMConfig,
    ModelConfig as CMModelConfig,
    create_config as create_cm_config,
)
from fastgen_tpu.methods.consistency_model.cm import TCMModel


@attrs.define(slots=False)
class ModelConfig(CMModelConfig):
    # probability of sampling the boundary time step
    boundary_prob: float = 0.25
    # weighting coefficient for the boundary loss
    w_boundary: float = 0.1
    # critical time step at the stage boundary
    transition_t: float = 1.0


@attrs.define(slots=False)
class Config(CMConfig):
    model: ModelConfig = attrs.field(factory=ModelConfig)
    model_class: dict = attrs.field(factory=lambda: L(TCMModel)(config=None))


def create_config() -> Config:
    base = create_cm_config()
    config = Config()
    config.trainer = base.trainer
    config.dataloader_train = base.dataloader_train
    config.model.sample_t_cfg.time_dist_type = "lognormal"
    return config
