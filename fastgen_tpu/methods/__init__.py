"""Training methods (ref ``fastgen/methods/__init__.py``)."""

from fastgen_tpu.methods.base import FastGenModel, MethodState  # noqa: F401
from fastgen_tpu.methods.fine_tuning.sft import CausalSFTModel, SFTModel  # noqa: F401
from fastgen_tpu.methods.distribution_matching.dmd2 import DMD2Model  # noqa: F401
from fastgen_tpu.methods.distribution_matching.f_distill import FdistillModel  # noqa: F401
from fastgen_tpu.methods.distribution_matching.ladd import LADDModel  # noqa: F401
from fastgen_tpu.methods.consistency_model.cm import CMModel, TCMModel  # noqa: F401
from fastgen_tpu.methods.consistency_model.scm import SCMModel  # noqa: F401
from fastgen_tpu.methods.consistency_model.mean_flow import MeanFlowModel  # noqa: F401
from fastgen_tpu.methods.knowledge_distillation.kd import CausalKDModel, KDModel  # noqa: F401
