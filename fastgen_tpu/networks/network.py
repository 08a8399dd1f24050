"""Base network interface for fastgen-tpu.

TPU-native counterpart of the reference's ``FastGenNetwork`` ABC
(``fastgen/networks/network.py:13-209``) as a flax.linen Module:

* same forward contract: ``net(x_t, t, condition=..., r=..., feature_indices=...,
  return_logvar=..., fwd_pred_type=...)`` where the raw output in
  ``net_pred_type`` space is converted to the requested ``fwd_pred_type`` via
  the noise schedule's pred-type algebra;
* the canonical image layout is **NHWC** (TPU conv layout), not torch NCHW;
* ``feature_indices``/``return_features_early`` are static arguments — jit
  specializes a features-only program instead of dynamically early-exiting
  (reference short-circuits at runtime, ``EDM/network.py:893-897``);
* no meta-device machinery: abstract init is ``jax.eval_shape`` and weights are
  ``jax.device_put`` with a NamedSharding (see parallel/).

Causal (autoregressive video) networks additionally carry ``chunk_size`` /
``total_num_frames`` and operate on explicit fixed-shape KV-cache pytrees
passed in and out of ``__call__`` (pure-functional replacement of the
reference's mutable external caches, ``network_causal.py:703-816``).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional, Tuple

import flax.linen as nn

from fastgen_tpu.ops.schedules import NET_PRED_TYPES, get_noise_schedule


@lru_cache(maxsize=64)
def cached_noise_schedule(schedule_type: str, kwargs_items: Tuple = ()):
    return get_noise_schedule(schedule_type, **dict(kwargs_items))


class FastGenNetwork(nn.Module):
    """Base linen module for all backbones.

    Subclass fields configure the backbone; ``net_pred_type`` and
    ``schedule_type`` mirror the reference. The noise schedule is a host-side
    object cached by configuration (its tables become jit constants).
    """

    net_pred_type: str = "x0"
    schedule_type: str = "edm"
    schedule_kwargs: Tuple = ()  # tuple of (key, value) pairs, hashable

    @property
    def noise_scheduler(self):
        if self.net_pred_type not in NET_PRED_TYPES:
            raise ValueError(
                f"Unsupported net_pred_type {self.net_pred_type!r}; supported: {NET_PRED_TYPES}")
        return cached_noise_schedule(self.schedule_type, tuple(self.schedule_kwargs))

    def convert_output(self, x_t, out, t, fwd_pred_type: Optional[str]):
        """Convert raw output from net_pred_type to fwd_pred_type."""
        target = fwd_pred_type or self.net_pred_type
        return self.noise_scheduler.convert_model_output(
            x_t, out, t, src_pred_type=self.net_pred_type, target_pred_type=target)


class CausalFastGenNetwork(FastGenNetwork):
    """Base for causal/autoregressive networks (ref ``network.py:211-276``).

    KV caches are explicit pytrees with static shapes
    ``[B, total_tokens, heads, head_dim]`` threaded through ``__call__``;
    ``init_cache(batch)`` builds the zero cache, replacing ``clear_caches()``.
    """

    chunk_size: int = 3
    total_num_frames: int = 21

    def init_cache(self, batch_size: int, dtype=None) -> Any:
        raise NotImplementedError
