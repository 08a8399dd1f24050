"""MeanFlow method config (ref ``fastgen/configs/methods/config_mean_flow.py``)."""

from __future__ import annotations

from typing import List, Optional

import attrs

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_cm import (
    Config as CMConfig,
    ModelConfig as CMModelConfig,
    SampleTConfig as CMSampleTConfig,
    create_config as create_cm_config,
)
from fastgen_tpu.methods.consistency_model.mean_flow import MeanFlowModel


@attrs.define(slots=False)
class SampleTConfig(CMSampleTConfig):
    time_dist_type: str = "lognormal"
    train_p_mean: float = -1.1
    train_p_std: float = 2.0
    # ratio of the batch that trains the mean-velocity (r < t) objective;
    # the rest gets r = t (plain flow matching)
    r_sample_ratio: float = 0.0


@attrs.define(slots=False)
class SampleRConfig(CMSampleTConfig):
    # whether r uses its own distribution
    enabled: bool = False
    time_dist_type: str = "lognormal"
    train_p_mean: float = -1.1
    train_p_std: float = 2.0


@attrs.define(slots=False)
class LossConfig:
    use_cd: bool = False
    use_squared_l2: bool = False
    use_jvp_finite_diff: bool = False
    jvp_finite_diff_eps: float = 1e-4
    # adaptive weight: "poly_<p>" or "exp_<c>_<s>"
    norm_method: str = "poly_1.0"
    norm_const: float = 1e-1
    tangent_warmup_steps: int = 0
    tangent_spatial_invariance: bool = False
    # "l2" | "opt_grad"
    loss_type: str = "opt_grad"
    # CM-compat fields used by the shared base
    huber_const: float = 0.0
    weighting_ct_loss: str = "one"


@attrs.define(slots=False)
class ModelConfig(CMModelConfig):
    sample_t_cfg: SampleTConfig = attrs.field(factory=SampleTConfig)
    sample_r_cfg: SampleRConfig = attrs.field(factory=SampleRConfig)
    loss_config: LossConfig = attrs.field(factory=LossConfig)
    precision_amp_jvp: Optional[str] = None
    guidance_mixture_ratio: Optional[float] = None
    cond_dropout_prob: Optional[float] = None
    cond_keys_no_dropout: List[str] = attrs.field(factory=list)
    guidance_t_start: float = 0.0
    guidance_t_end: float = 1.0


@attrs.define(slots=False)
class Config(CMConfig):
    model: ModelConfig = attrs.field(factory=ModelConfig)
    model_class: dict = attrs.field(factory=lambda: L(MeanFlowModel)(config=None))


def create_config() -> Config:
    base = create_cm_config()
    config = Config()
    config.trainer = base.trainer
    config.dataloader_train = base.dataloader_train
    return config
