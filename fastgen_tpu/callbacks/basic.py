"""Concrete callbacks (ref ``fastgen/callbacks/``).

* ``WandbCallback`` — metrics logging with distributed loss averaging and
  sample-image dumps (ref ``wandb.py:185-404``). Falls back to JSONL when
  wandb is unavailable (it is not in this image); the jsonl file has the same
  scalars so dashboards can be rebuilt.
* ``TrainProfilerCallback`` — wall-clock decomposition (ref ``train_profiler.py``).
* ``DeviceStatsCallback`` — TPU/host memory stats via jax (ref ``gpu_stats.py``).
* ``MemTrackerCallback`` — per-iteration live-array census + optional device
  memory profile dump (ref ``gpu_mem_profiler.py``).
* ``ParamCountCallback`` — per-net param counts (ref ``param_count.py``).
* ``GradClipCallback`` — logging-only: clipping itself composes into the optax
  chain (``clip_grad_norm`` is a transform, not a mutation pass).
* ``EMACallback`` — parity shim: EMA is a sharded lerp fused into the train
  step (better than the reference's per-step ``full_tensor()`` gather).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fastgen_tpu.callbacks.callback import Callback
from fastgen_tpu.parallel.mesh import is_rank0
from fastgen_tpu.utils import logging_utils as logger


class WandbCallback(Callback):
    """Scalar/image logging; wandb if importable, else JSONL
    (``<save_path>/metrics.jsonl``)."""

    def __init__(self, config=None, trainer=None, logging_iter: Optional[int] = None,
                 save_samples: bool = True, **kwargs):
        super().__init__(config, trainer)
        self.logging_iter = logging_iter or getattr(config.trainer, "logging_iter", 100)
        self.save_samples = save_samples
        self._wandb = None
        self._file = None
        self._pending = []

    def on_app_begin(self):
        if not is_rank0():
            return
        save_path = self.config.log_config.save_path
        os.makedirs(save_path, exist_ok=True)
        mode = self.config.log_config.wandb_mode
        if mode == "wandb":
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=self.config.log_config.project,
                           group=self.config.log_config.group,
                           name=self.config.log_config.name, dir=save_path)
            except ImportError:
                logger.warning("wandb not available; falling back to jsonl")
        if self._wandb is None and mode != "disabled":
            self._file = open(os.path.join(save_path, "metrics.jsonl"), "a")

    def _log(self, record: dict):
        if self._wandb is not None:
            self._wandb.log(record, step=record.get("iteration"))
        elif self._file is not None:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()

    # flush the pending window even off the logging_iter boundary once it
    # holds this many iterations' scalars: thousands of live tiny device
    # buffers degrade dispatch, and fetching them one-by-one at the boundary
    # is a round-trip per buffer — a resumed run whose first boundary sat
    # ~1000 iters out stalled for minutes in exactly that device_get
    # (quality/v5/teacher.log faulthandler dump, callbacks/basic.py:83)
    MAX_PENDING = 200

    def on_training_step_end(self, model, state=None, data_batch=None,
                             loss_map=None, outputs=None, iteration=0):
        # Keep the device scalars as-is: a per-iteration float(v) is a
        # blocking device->host round-trip per key (through the TPU tunnel
        # that was ~70 ms of "host" time per training step) and it stops the
        # host from running ahead of the async dispatch queue.
        if loss_map:
            self._pending.append(dict(loss_map))
        flush = (iteration % self.logging_iter == 0
                 or len(self._pending) >= self.MAX_PENDING)
        if flush and self._pending:
            if is_rank0():
                # ONE on-device stack per key, then one transfer per key —
                # constant round-trips regardless of the window length
                # (device_get over the raw list is a round-trip per scalar)
                per_key: Dict[str, list] = {}
                for lm in self._pending:
                    for k, v in lm.items():
                        per_key.setdefault(k, []).append(v)
                stacked = {}
                for k, vs in per_key.items():
                    try:
                        vals = [jnp.asarray(v, jnp.float32) for v in vs]
                        # scalars only, like float(v) before: non-scalar
                        # entries (per-sample losses, grids) are not metrics
                        if any(v.ndim != 0 for v in vals):
                            continue
                        stacked[k] = jnp.stack(vals)
                    except (TypeError, ValueError):
                        continue
                window = jax.device_get(stacked)
                self._sums = getattr(self, "_sums", {})
                self._counts = getattr(self, "_counts", {})
                for k, arr in window.items():
                    self._sums[k] = self._sums.get(k, 0.0) + float(arr.sum())
                    self._counts[k] = self._counts.get(k, 0) + arr.size
                if iteration % self.logging_iter == 0:
                    record = {"iteration": int(iteration)}
                    for k, s in self._sums.items():
                        record[f"train/{k}"] = s / max(self._counts[k], 1)
                    self._log(record)
                    self._sums, self._counts = {}, {}
            self._pending = []

    def _dump_grid(self, model, gen, name: str):
        import PIL.Image

        # latent-space outputs decode through the model's VAE before
        # saving (ref wandb.py get_sample_map VAE decode, :225-334)
        vae = getattr(model, "vae", None)
        if vae is not None and gen.shape[-1] == model.input_shape[-1] \
                and model.input_shape[-1] != 3:
            gen = vae.decode(gen)
        arr = np.asarray(gen, np.float32)
        if arr.ndim == 5:        # video: save the middle frame per sample
            arr = arr[:, arr.shape[1] // 2]
        if arr.ndim != 4:
            return
        arr = np.nan_to_num(arr)
        arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
        n = min(arr.shape[0], 16)
        side = int(np.ceil(np.sqrt(n)))
        h, w, c = arr.shape[1:]
        grid = np.zeros((side * h, side * w, c), np.uint8)
        for i in range(n):
            r, col = divmod(i, side)
            grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = arr[i]
        out_dir = os.path.join(self.config.log_config.save_path, "samples")
        os.makedirs(out_dir, exist_ok=True)
        PIL.Image.fromarray(grid.squeeze()).save(
            os.path.join(out_dir, f"{name}.png"))

    def on_validation_step_end(self, model, state=None, data_batch=None,
                               loss_map=None, outputs=None, iteration=0, idx=0):
        if not is_rank0():
            return
        # held-out loss record (ref logs validation loss_map through the
        # wandb loss record, ``callbacks/wandb.py`` _LossDictRecord); one
        # synchronous write per validation — cadence is rare, cost is noise
        if loss_map:
            record = {"iteration": int(iteration), "val_idx": int(idx)}
            for k, v in loss_map.items():
                try:
                    record[f"val/{k}"] = float(v)
                except (TypeError, ValueError):
                    continue
            self._log(record)
        if not outputs:
            return
        if not self.save_samples:
            return
        gen = outputs.get("gen_rand")
        if gen is None:
            return
        try:
            self._dump_grid(model, gen, f"iter_{int(iteration):07d}_{idx}")
        except Exception as e:
            logger.warning(f"sample dump failed: {e}")
        # teacher reference samples beside the student's
        # (ref wandb.py:241 visualize_teacher)
        if getattr(self.config.trainer, "visualize_teacher", False) and \
                idx == 0 and state is not None and "teacher" in state.params \
                and model.teacher is not None and hasattr(model.teacher, "sample"):
            try:
                import jax

                n = min(int(gen.shape[0]), 4)
                noise = jax.random.normal(
                    jax.random.PRNGKey(int(iteration)),
                    (n,) + tuple(model.input_shape), model.precision)
                cond = model.example_condition(n)
                teacher = model.teacher
                gen_t = teacher.apply(state.params["teacher"], noise,
                                      method=teacher.sample, condition=cond,
                                      num_steps=8)
                self._dump_grid(model, gen_t,
                                f"iter_{int(iteration):07d}_teacher")
            except Exception as e:
                logger.warning(f"teacher sample dump failed: {e}")

    def on_app_end(self, model=None, iteration=0):
        if self._wandb is not None:
            self._wandb.finish()
        if self._file is not None:
            self._file.close()


class TrainProfilerCallback(Callback):
    """Iteration timing decomposition + jax.profiler trace capture
    (ref ``train_profiler.py:20-138``).

    Per-iteration decomposition, TPU-async-aware:

    * ``data`` — ``on_training_step_begin`` -> first accum-step begin
      (host-side batch fetch + preprocess + H2D)
    * ``step`` — dispatch + device execution of the jitted train step,
      measured by blocking on ``loss_map`` at step end
    * ``host`` — gap between the previous step's end and this step's begin
      (callbacks, logging, checkpoint polling)

    The reference's fwd/bwd/optimizer split is a CUDA-event concept; under
    XLA one fused step executes, so the per-op split lives in the profiler
    trace instead: set ``trace_start_iter`` to capture ``trace_num_iters``
    iterations as a TensorBoard/Perfetto trace (full fwd/bwd op timeline)
    under ``<save_path>/profile``.
    """

    def __init__(self, config=None, trainer=None, logging_iter: int = 100,
                 trace_start_iter: Optional[int] = None,
                 trace_num_iters: int = 2, trace_dir: Optional[str] = None,
                 **kwargs):
        super().__init__(config, trainer)
        self.logging_iter = logging_iter
        self.trace_start_iter = trace_start_iter
        self.trace_num_iters = trace_num_iters
        self._trace_dir = trace_dir
        self._tracing = False
        self._t_step = None
        self._t_data_end = None
        self._t_prev_end = None
        self.iter_times = []
        self.data_times = []
        self.host_times = []
        self.last_rate = None

    @property
    def trace_dir(self) -> str:
        return self._trace_dir or os.path.join(
            self.config.log_config.save_path, "profile")

    def on_training_step_begin(self, model, state=None, iteration=0):
        now = time.perf_counter()
        if self._t_prev_end is not None:
            self.host_times.append(now - self._t_prev_end)
        self._t_step = now
        self._t_data_end = None
        if (self.trace_start_iter is not None and not self._tracing
                and iteration == self.trace_start_iter and is_rank0()):
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True
            logger.info(f"profiler trace started -> {self.trace_dir}")

    def on_training_accum_step_begin(self, model, state=None, iteration=0):
        if self._t_data_end is None and self._t_step is not None:
            self.data_times.append(time.perf_counter() - self._t_step)
            self._t_data_end = time.perf_counter()

    def on_training_step_end(self, model, state=None, data_batch=None,
                             loss_map=None, outputs=None, iteration=0):
        if self._t_step is None:
            return
        if loss_map:
            # async dispatch: block so the step time includes device exec
            jax.block_until_ready(list(loss_map.values()))
        now = time.perf_counter()
        self.iter_times.append(now - self._t_step)
        self._t_prev_end = now
        for buf in (self.iter_times, self.data_times, self.host_times):
            if len(buf) > 200:
                del buf[:-100]
        if (self._tracing and self.trace_start_iter is not None
                and iteration >= self.trace_start_iter + self.trace_num_iters - 1):
            jax.profiler.stop_trace()
            self._tracing = False
            logger.info(f"profiler trace written -> {self.trace_dir}")
        if iteration and iteration % self.logging_iter == 0:
            w = self.logging_iter
            mean = float(np.mean(self.iter_times[-w:]))
            data = float(np.mean(self.data_times[-w:])) if self.data_times else 0.0
            host = float(np.mean(self.host_times[-w:])) if self.host_times else 0.0
            step = max(mean - data, 0.0)
            self.last_rate = 1.0 / max(mean, 1e-9)
            logger.info(
                f"iter {iteration}: {mean*1000:.1f} ms/iter "
                f"(data {data*1000:.1f} | step {step*1000:.1f} | "
                f"host {host*1000:.1f} ms, {self.last_rate:.2f} it/s)")

    def on_train_end(self, model, state=None, iteration=0):
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False


class DeviceStatsCallback(Callback):
    """Device memory stats via jax (ref ``gpu_stats.py:21-92``)."""

    def __init__(self, config=None, trainer=None, logging_iter: int = 500, **kwargs):
        super().__init__(config, trainer)
        self.logging_iter = logging_iter

    def on_training_step_end(self, model, state=None, data_batch=None,
                             loss_map=None, outputs=None, iteration=0):
        if iteration % self.logging_iter != 0 or not is_rank0():
            return
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats:
                used = stats.get("bytes_in_use", 0) / 2**30
                limit = stats.get("bytes_limit", 0) / 2**30
                logger.info(f"device mem: {used:.2f} / {limit:.2f} GiB")
        except Exception:
            pass


class MemTrackerCallback(Callback):
    """Live-array census + device memory profile dumps
    (ref ``gpu_mem_profiler.py:20-134``)."""

    def __init__(self, config=None, trainer=None, logging_iter: int = 1000,
                 save_profile: bool = False, **kwargs):
        super().__init__(config, trainer)
        self.logging_iter = logging_iter
        self.save_profile = save_profile

    def on_training_step_end(self, model, state=None, data_batch=None,
                             loss_map=None, outputs=None, iteration=0):
        if iteration % self.logging_iter != 0 or not is_rank0():
            return
        try:
            arrs = jax.live_arrays()
            total = sum(a.size * a.dtype.itemsize for a in arrs) / 2**30
            logger.info(f"live arrays: {len(arrs)} holding {total:.2f} GiB")
            if self.save_profile:
                out = os.path.join(self.config.log_config.save_path,
                                   f"memory_{iteration:07d}.prof")
                jax.profiler.save_device_memory_profile(out)
        except Exception:
            pass


class ParamCountCallback(Callback):
    """Log per-net parameter counts once (ref ``param_count.py:33``)."""

    def on_train_begin(self, model, state=None, iteration=0):
        if not is_rank0() or state is None:
            return
        for name, tree in state.params.items():
            n = sum(p.size for p in jax.tree_util.tree_leaves(tree))
            logger.info(f"params[{name}]: {n/1e6:.2f}M")


class GradClipCallback(Callback):
    """Grad sanitize (NaN->0, ±Inf->posinf/neginf) + global-norm clip for one
    net key (ref ``callbacks/grad_clip.py:118-219``). The actual pass is an
    optax transform composed into that net's optimizer chain inside the
    jitted step (``methods/base.py _finalize_optimizers``); the trainer reads
    this callback's spec to wire it. Accepts both the reference's ``grad_norm``
    and the legacy ``clip_norm`` parameter names."""

    def __init__(self, config=None, trainer=None, clip_norm: Optional[float] = None,
                 grad_norm: Optional[float] = None, model_key: str = "net",
                 posinf: Optional[float] = None, neginf: Optional[float] = None,
                 **kwargs):
        super().__init__(config, trainer)
        self.clip_norm = grad_norm if grad_norm is not None else clip_norm
        self.model_key = model_key
        self.posinf = posinf
        self.neginf = neginf

    def clip_spec(self) -> dict:
        return {"norm": self.clip_norm, "posinf": self.posinf,
                "neginf": self.neginf}


class EMACallback(Callback):
    """Parity shim: EMA is fused into the jitted train step as a sharded lerp
    (see ``methods/base.py``); nothing to do per-step on the host."""


class CTScheduleCallback(Callback):
    """Parity shim (ref ``callbacks/ct_schedule.py:20``): the ECT curriculum
    ratio is computed inside the jitted CM step from the traced iteration
    (``CMModel.ct_ratio``, driven by ``model.ct_schedule`` config) — this
    callback only logs the current stage/ratio."""

    def __init__(self, config=None, trainer=None, logging_iter: int = 1000, **kwargs):
        super().__init__(config, trainer)
        self.logging_iter = logging_iter

    def on_training_step_end(self, model, state=None, data_batch=None,
                             loss_map=None, outputs=None, iteration=0):
        if iteration % self.logging_iter != 0 or not is_rank0():
            return
        cs = getattr(model.config, "ct_schedule", None)
        if cs is None or not getattr(cs, "enabled", False):
            return
        nimg = iteration * cs.batch_size
        stage = nimg // (cs.kimg_per_stage * 1000)
        ratio = min(1 - 1 / cs.q ** (stage + 1), cs.ratio_limit)
        logger.info(f"ct_schedule: kimg={nimg/1e3:.1f} stage={stage} ratio={ratio:.4f}")
