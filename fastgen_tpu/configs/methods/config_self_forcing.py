"""Self-Forcing method config (ref ``fastgen/configs/methods/config_self_forcing.py``)."""

from __future__ import annotations

import attrs

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_causvid import (
    Config as CausVidConfig,
    ModelConfig as CausVidModelConfig,
    create_config as create_causvid_config,
)
from fastgen_tpu.methods.distribution_matching.self_forcing import SelfForcingModel


@attrs.define(slots=False)
class ModelConfig(CausVidModelConfig):
    enable_gradient_in_rollout: bool = True
    start_gradient_frame: int = 0
    # one exit step shared across blocks (allows one compiled program per step)
    same_step_across_blocks: bool = True
    last_step_only: bool = False
    context_noise: float = 0.0


@attrs.define(slots=False)
class Config(CausVidConfig):
    model: ModelConfig = attrs.field(factory=ModelConfig)
    model_class: dict = attrs.field(factory=lambda: L(SelfForcingModel)(config=None))


def create_config() -> Config:
    base = create_causvid_config()
    config = Config()
    config.trainer = base.trainer
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    return config
