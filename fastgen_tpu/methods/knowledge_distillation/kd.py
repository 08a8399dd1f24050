"""KD / CausalKD: regression on precomputed teacher trajectories
(ref ``fastgen/methods/knowledge_distillation/KD.py``).

Data contract (from the Pair/Path WDS loaders):
* single-step: ``{"real": clean, "noise": noise, "condition": cond}``
* multi-step:  ``{"real": clean, "path": [B, S, ...]}`` where S denoising steps
  align with ``sample_t_cfg.t_list``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from fastgen_tpu.methods.base import FastGenModel
from fastgen_tpu.methods.common_loss import mse


class KDModel(FastGenModel):
    def compute_losses(self, params, batch, rng, iteration, phase):
        denoised_data = batch["real"]
        condition = batch.get("condition")
        batch_size = denoised_data.shape[0]
        ns = self.net.noise_scheduler
        k_t, k_drop = jax.random.split(rng)

        if self.config.student_sample_steps == 1:
            if "noise" in batch and batch["noise"] is not None:
                input_student = batch["noise"]
            elif "path" in batch and batch["path"] is not None:
                input_student = batch["path"][:, 0]
            else:
                raise ValueError("noise or path must be provided for KDModel")
            t_student = jnp.full((batch_size,), ns.max_t, jnp.float32)
        else:
            assert "path" in batch and batch["path"] is not None
            path = batch["path"]  # [B, S, ...]
            num_inf_steps = path.shape[1]
            assert num_inf_steps % self.config.student_sample_steps == 0, (
                "path steps must be divisible by student_sample_steps")
            t_student, ids = ns.sample_from_t_list(
                k_t, batch_size, sample_steps=self.config.student_sample_steps,
                t_list=self.config.sample_t_cfg.t_list, return_ids=True)
            path_indices = ids * (num_inf_steps // self.config.student_sample_steps)
            gather_idx = path_indices.reshape((batch_size,) + (1,) * (path.ndim - 1))
            input_student = jnp.take_along_axis(path, gather_idx, axis=1).squeeze(1)

        gen_data = self.apply_net(params, "net", input_student, t_student,
                                  condition=condition, fwd_pred_type="x0",
                                  train=True, rngs={"dropout": k_drop})
        loss = 0.5 * mse(gen_data, denoised_data)
        loss_map = {"total_loss": loss, "recon_loss": loss}
        outputs = {"gen_rand": gen_data, "input_rand": input_student}
        return loss_map, outputs


class CausalKDModel(KDModel):
    """KD with per-chunk inhomogeneous t gathered from the path
    (ref ``KD.py:136-211``). Video layout [B, S, T, H, W, C]."""

    def compute_losses(self, params, batch, rng, iteration, phase):
        denoise_path = batch["path"]     # [B, S, T, H, W, C]
        denoised_data = batch["real"]    # [B, T, H, W, C]
        condition = batch.get("condition")
        batch_size, num_steps = denoise_path.shape[0], denoise_path.shape[1]
        num_frames = denoise_path.shape[2]
        ns = self.net.noise_scheduler
        k_t, k_drop = jax.random.split(rng)

        t_inhom, ids = ns.sample_t_inhom(
            k_t, batch_size, num_frames, self.net.chunk_size,
            sample_steps=self.config.student_sample_steps,
            t_list=self.config.sample_t_cfg.t_list)  # [B, T]

        # gather per-frame inputs from the path; step index S+? == clean data
        path_all = jnp.concatenate(
            [denoise_path, denoised_data[:, None]], axis=1)  # [B, S+1, T, ...]
        gather_idx = ids.reshape(batch_size, 1, num_frames,
                                 *(1,) * (denoise_path.ndim - 3))
        noisy = jnp.take_along_axis(path_all, gather_idx, axis=1).squeeze(1)

        gen_data = self.apply_net(params, "net", noisy, t_inhom,
                                  condition=condition, fwd_pred_type="x0",
                                  train=True, rngs={"dropout": k_drop})
        loss = 0.5 * mse(gen_data, denoised_data)
        return {"total_loss": loss, "recon_loss": loss}, {"gen_rand_train": gen_data}
