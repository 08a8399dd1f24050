"""Callback config presets (ref ``fastgen/configs/callbacks.py``)."""

from __future__ import annotations

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.callbacks.basic import (
    CTScheduleCallback,
    DeviceStatsCallback,
    EMACallback,
    GradClipCallback,
    MemTrackerCallback,
    ParamCountCallback,
    TrainProfilerCallback,
    WandbCallback,
)

WANDB_CALLBACK = {"wandb": L(WandbCallback)()}
GradClip_CALLBACK = {"grad_clip": L(GradClipCallback)(grad_norm=10.0,
                                                      model_key="net")}
GPUStats_CALLBACK = {"device_stats": L(DeviceStatsCallback)()}
MemTracker_CALLBACK = {"mem_tracker": L(MemTrackerCallback)()}
TrainProfiler_CALLBACK = {"train_profiler": L(TrainProfilerCallback)()}
ParamCount_CALLBACK = {"param_count": L(ParamCountCallback)()}
EMA_CALLBACK = {"ema": L(EMACallback)()}
CTSchedule_CALLBACK = {"ct_schedule": L(CTScheduleCallback)()}

DEFAULT_CALLBACKS = {
    **GradClip_CALLBACK,
    **GPUStats_CALLBACK,
    **TrainProfiler_CALLBACK,
    **ParamCount_CALLBACK,
    **WANDB_CALLBACK,
}
