"""Optimizer / LR-schedule configs on optax.

TPU-native counterpart of ``fastgen/configs/opt.py`` + ``fastgen/utils/
lr_scheduler.py``: torch optimizers -> optax transforms, LambdaLR schedulers ->
jnp-traced schedule functions composed into the transform (so the schedule runs
inside the jitted train step with no host sync).

Public surface parity:
* ``get_optimizer(optim_type=..., lr=..., weight_decay=..., betas=..., eps=...)``
* ``BaseOptimizerConfig`` / ``RAdamOptimizerConfig`` / ``BaseSchedulerConfig``
* ``get_scheduler`` returns the schedule *function* used when building the
  final optax chain via ``make_optimizer``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.lazy import instantiate
from fastgen_tpu.utils import logging_utils as logger


class LambdaLinearScheduler:
    """Multi-cycle warmup + linear-interp LR multiplier (ref ``lr_scheduler.py``,
    LambdaLinearScheduler). Returns a jnp-traceable multiplier of the step."""

    def __init__(self, warm_up_steps: Sequence[int], cycle_lengths: Sequence[int],
                 f_start: Sequence[float], f_max: Sequence[float], f_min: Sequence[float],
                 verbosity_interval: int = 0):
        n = len(warm_up_steps)
        assert n == len(f_min) == len(f_max) == len(f_start) == len(cycle_lengths)
        self.warm_up_steps = list(warm_up_steps)
        self.cycle_lengths = list(cycle_lengths)
        self.f_start = list(f_start)
        self.f_max = list(f_max)
        self.f_min = list(f_min)
        self.cum_cycles = np.cumsum([0] + list(cycle_lengths))

    def _cycle_schedule(self, i: int, n):
        warm = float(self.warm_up_steps[i])
        warm_f = ((self.f_max[i] - self.f_start[i]) / max(warm, 1.0)) * n + self.f_start[i]
        denom = max(float(self.cycle_lengths[i]) - warm, 1.0)
        t = jnp.clip((n - warm) / denom, 0.0, 1.0)
        # linear decay from f_max at warm to f_min at cycle end
        decay_f = self.f_max[i] + (self.f_min[i] - self.f_max[i]) * t
        return jnp.where(n < warm, warm_f, decay_f)

    def schedule(self, n):
        n = jnp.asarray(n, jnp.float32)
        out = self._cycle_schedule(len(self.cycle_lengths) - 1,
                                   n - self.cum_cycles[len(self.cycle_lengths) - 1])
        for i in reversed(range(len(self.cycle_lengths) - 1)):
            out = jnp.where(n <= self.cum_cycles[i + 1],
                            self._cycle_schedule(i, n - self.cum_cycles[i]), out)
        return out

    def __call__(self, n):
        return self.schedule(n)


class LambdaWarmUpCosineScheduler2(LambdaLinearScheduler):
    """Cosine variant (ref ``lr_scheduler.py`` LambdaWarmUpCosineScheduler2)."""

    def _cycle_schedule(self, i: int, n):
        warm = float(self.warm_up_steps[i])
        warm_f = ((self.f_max[i] - self.f_start[i]) / max(warm, 1.0)) * n + self.f_start[i]
        denom = max(float(self.cycle_lengths[i]) - warm, 1.0)
        t = jnp.clip((n - warm) / denom, 0.0, 1.0)
        cos_f = self.f_min[i] + 0.5 * (self.f_max[i] - self.f_min[i]) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < warm, warm_f, cos_f)


class LambdaInverseSquareRootScheduler:
    """Warmup then 1/sqrt(1 + n/timescale) decay (ref ``lr_scheduler.py``
    LambdaInverseSquareRootScheduler; used by the EDM2 CM/sCM/TCM recipes)."""

    def __init__(self, warm_up_steps: int = 0, decay_start_step: Optional[int] = None,
                 timescale: Optional[float] = None, f_min: float = 0.0):
        self.warm_up_steps = warm_up_steps
        self.decay_start = (decay_start_step if decay_start_step is not None
                            else warm_up_steps)
        self.timescale = float(timescale if timescale is not None
                               else max(self.decay_start, 1))
        self.f_min = f_min

    def schedule(self, n):
        n = jnp.asarray(n, jnp.float32)
        warm_f = n / max(float(self.warm_up_steps), 1.0)
        decay_f = jax.lax.rsqrt(jnp.maximum(
            1.0 + (n - self.decay_start) / self.timescale, 1.0))
        out = jnp.where(n < self.warm_up_steps, warm_f, jnp.maximum(decay_f, self.f_min))
        return out

    def __call__(self, n):
        return self.schedule(n)


class ConstantScheduler:
    def __init__(self, f: float = 1.0):
        self.f = f

    def schedule(self, n):
        return jnp.full((), self.f, jnp.float32)

    def __call__(self, n):
        return self.schedule(n)


class OptimizerSpec:
    """Holds optimizer hyperparameters; ``build(schedule)`` makes the optax tx."""

    def __init__(self, optim_type: str = "adamw", lr: float = 1e-4,
                 weight_decay: float = 0.01, betas=(0.9, 0.999), eps: float = 1e-8,
                 fused: bool = False, **kwargs):
        if optim_type not in ("adam", "adamw", "radam"):
            logger.error(f"Unknown optimizer type: {optim_type}, using adamw")
            optim_type = "adamw"
        self.optim_type = optim_type
        self.lr = lr
        self.weight_decay = weight_decay
        self.betas = tuple(betas)
        self.eps = eps

    def build(self, schedule_fn=None) -> optax.GradientTransformation:
        if schedule_fn is None:
            lr = self.lr
        else:
            def lr(step):
                return self.lr * schedule_fn(step)
        b1, b2 = self.betas
        if self.optim_type == "adam":
            # torch Adam applies weight_decay as L2 on the gradient
            return optax.chain(
                optax.add_decayed_weights(self.weight_decay) if self.weight_decay
                else optax.identity(),
                optax.adam(lr, b1=b1, b2=b2, eps=self.eps))
        if self.optim_type == "radam":
            tx = optax.radam(lr, b1=b1, b2=b2, eps=self.eps)
            if self.weight_decay:
                tx = optax.chain(optax.add_decayed_weights(self.weight_decay), tx)
            return tx
        return optax.adamw(lr, b1=b1, b2=b2, eps=self.eps,
                           weight_decay=self.weight_decay)


def get_optimizer(model=None, optim_type: str = "adam", lr: float = 1e-4,
                  weight_decay: float = 0.01, **kwargs) -> OptimizerSpec:
    """Config-surface twin of the reference's factory; returns an OptimizerSpec
    (params are pytrees, not modules, so `model` is accepted and ignored)."""
    return OptimizerSpec(optim_type=optim_type, lr=lr, weight_decay=weight_decay, **kwargs)


def get_scheduler(optimizer=None, scheduler_config=None):
    """Instantiate the scheduler config into a schedule object."""
    if scheduler_config is None:
        return ConstantScheduler()
    return instantiate(scheduler_config)


def make_optimizer(opt_cfg, sched_cfg=None) -> optax.GradientTransformation:
    """Build the final optax transform from (optimizer, scheduler) configs."""
    spec = instantiate(opt_cfg) if isinstance(opt_cfg, dict) else opt_cfg
    if not isinstance(spec, OptimizerSpec):
        raise TypeError(f"optimizer config must produce an OptimizerSpec, got {type(spec)}")
    sched = get_scheduler(None, sched_cfg)
    return spec.build(sched.schedule if sched is not None else None)


def grad_sanitize_and_clip(max_norm: Optional[float], posinf: Optional[float] = None,
                           neginf: Optional[float] = None) -> optax.GradientTransformation:
    """TPU-native twin of the reference ``GradClipCallback`` grad pass
    (``callbacks/grad_clip.py:133-219``): per-leaf ``nan_to_num`` (NaN -> 0,
    ±Inf -> posinf/neginf, defaulting to the dtype extremes like torch), then
    a global-norm clip. Composes *in front of* the optimizer transform inside
    the jitted apply step — the same seam the reference's
    ``on_optimizer_step_begin`` hook sits at, with no host round-trip."""

    def sanitize(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=posinf, neginf=neginf),
            updates)
        return updates, state

    tx = optax.GradientTransformation(lambda params: optax.EmptyState(), sanitize)
    if max_norm is not None:
        tx = optax.chain(tx, optax.clip_by_global_norm(max_norm))
    return tx


BaseOptimizerConfig = L(get_optimizer)(
    model=None, optim_type="adamw", lr=1e-4, weight_decay=0.01,
    betas=(0.9, 0.999), eps=1e-8, fused=False)

RAdamOptimizerConfig = L(get_optimizer)(
    model=None, optim_type="radam", lr=1e-4, weight_decay=0.01,
    betas=(0.9, 0.999), eps=1e-8)

BaseSchedulerConfig = L(LambdaLinearScheduler)(
    warm_up_steps=[1000], cycle_lengths=[10000000000],
    f_start=[1.0e-6], f_max=[1.0], f_min=[1.0])
