"""Self-Forcing: DMD2 where gen_data comes from an autoregressive rollout with
gradient only at a randomly-sampled exit step per block
(ref ``fastgen/methods/distribution_matching/self_forcing.py``).

TPU-first control flow: with ``same_step_across_blocks`` (the reference
default) the exit step is sampled **in Python** per iteration from an
iteration-seeded RNG — identical on every host, replacing the reference's
rank-0 sample + ``dist.broadcast`` (``self_forcing.py:73-89``) — and encoded
into the phase name, so the trainer compiles at most ``student_sample_steps``
student programs, each with a fully static rollout (static chunk spans, static
step counts, fixed-shape KV caches). Gradients flow only through the exit-step
forward; cache writes and re-noising use stop_gradient like the reference's
``no_grad`` regions (``self_forcing.py:191-235``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from fastgen_tpu.methods.base import convert_cfg_to_dict
from fastgen_tpu.methods.distribution_matching.causvid import CausVidModel, chunk_schedule


class SelfForcingModel(CausVidModel):
    @property
    def phases(self) -> Tuple[str, ...]:
        steps = self.config.student_sample_steps
        return tuple(f"student_exit{s}" for s in range(steps)) + ("critic",)

    def phase_for_iteration(self, iteration: int) -> str:
        if iteration % self.config.student_update_freq != 0:
            return "critic"
        if self.config.last_step_only:
            exit_step = self.config.student_sample_steps - 1
        else:
            # iteration-seeded draw, identical on every host
            exit_step = int(np.random.RandomState(iteration).randint(
                self.config.student_sample_steps))
        return f"student_exit{exit_step}"

    def trainable_keys(self, phase: str):
        return super().trainable_keys(
            "student" if phase.startswith("student") else "critic")

    def compute_losses(self, params, batch, rng, iteration, phase):
        if phase.startswith("student_exit"):
            self._current_exit_step = int(phase[len("student_exit"):])
            phase = "student"
        return super().compute_losses(params, batch, rng, iteration, phase)

    def _generate_noise_and_time(self, rng, real_data):
        """Pure-noise student input (ref ``self_forcing.py:40-72``)."""
        batch_size = real_data.shape[0]
        ns = self.net.noise_scheduler
        k_stud, k_t, k_eps = jax.random.split(rng, 3)
        eps_student = jax.random.normal(k_stud, (batch_size,) + self.input_shape,
                                        real_data.dtype)
        t_student = jnp.full((batch_size,), ns.max_t, jnp.float32)
        input_student = ns.latents(eps_student)
        t = ns.sample_t(k_t, batch_size, **convert_cfg_to_dict(self.config.sample_t_cfg))
        eps = jax.random.normal(k_eps, real_data.shape, real_data.dtype)
        return input_student, t_student, t, eps

    def gen_data_from_net(self, params, input_student, t_student, condition, rng):
        exit_step = getattr(self, "_current_exit_step",
                            self.config.student_sample_steps - 1)
        return self.rollout_with_gradient(
            params, input_student, rng, condition=condition, exit_step=exit_step,
            enable_gradient=self.config.enable_gradient_in_rollout,
            start_gradient_frame=self.config.start_gradient_frame)

    def rollout_with_gradient(self, params, noise, rng, condition=None,
                              exit_step: int = 0, enable_gradient: bool = True,
                              start_gradient_frame: int = 0):
        """AR rollout, grads only at the per-block exit step
        (ref ``self_forcing.py:91-241``)."""
        net = self.nets["net"]
        ns = net.noise_scheduler
        batch_size, num_frames = noise.shape[0], noise.shape[1]
        spans = chunk_schedule(num_frames, net.chunk_size)
        sample_steps = self.config.student_sample_steps
        t_list = self.config.sample_t_cfg.t_list
        if t_list is None:
            t_list = ns.get_t_list(sample_steps)
        else:
            t_list = np.asarray(t_list, np.float32)

        params_net = params["net"]
        cache = net.init_cache(batch_size, dtype=noise.dtype, max_frames=num_frames)
        cross_kv = net.apply(params_net, condition, method=net.precompute_cross_kv)

        blocks = []
        for (start, end) in spans:
            noisy = noise[:, start:end]
            x0_pred = None
            for step in range(exit_step + 1):
                t_b = jnp.full((batch_size,), float(t_list[step]), jnp.float32)
                is_exit = step == exit_step
                grads_on = (is_exit and enable_gradient
                            and start >= start_gradient_frame)
                x0_pred, _ = net.apply(
                    params_net, noisy, t_b, cache, start, condition=condition,
                    cross_kv=cross_kv, fwd_pred_type="x0", store_kv=False,
                    method=net.forward_chunk)
                if not grads_on:
                    x0_pred = jax.lax.stop_gradient(x0_pred)
                if not is_exit:
                    t_next = float(t_list[step + 1])
                    tn_b = jnp.full((batch_size,), t_next, jnp.float32)
                    if self.config.student_sample_type == "sde":
                        rng, sub = jax.random.split(rng)
                        eps = jax.random.normal(sub, x0_pred.shape, x0_pred.dtype)
                    else:
                        eps = ns.x0_to_eps(noisy, x0_pred, t_b)
                    noisy = ns.forward_process(x0_pred, eps, tn_b)
            blocks.append(x0_pred)

            # cache update with the finished block, no grads
            x_cache = jax.lax.stop_gradient(x0_pred)
            t_cache = jnp.zeros((batch_size,), jnp.float32)
            if self.config.context_noise > 0:
                rng, sub = jax.random.split(rng)
                t_cache = jnp.full((batch_size,), self.config.context_noise, jnp.float32)
                x_cache = ns.forward_process(
                    x_cache, jax.random.normal(sub, x_cache.shape, x_cache.dtype),
                    t_cache)
            _, cache = net.apply(
                params_net, x_cache, t_cache, cache, start, condition=condition,
                cross_kv=cross_kv, fwd_pred_type="x0", store_kv=True,
                method=net.forward_chunk)

        return jnp.concatenate(blocks, axis=1)
