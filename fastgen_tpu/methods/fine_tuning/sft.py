"""SFT / CausalSFT: plain denoising fine-tuning (ref ``fastgen/methods/fine_tuning/sft.py``)."""

from __future__ import annotations


import jax

from fastgen_tpu.methods.base import FastGenModel, convert_cfg_to_dict
from fastgen_tpu.methods.common_loss import denoising_score_matching_loss


class SFTModel(FastGenModel):
    """Supervised fine-tuning on the net's own pred type (ref ``sft.py:20-161``)."""

    def compute_losses(self, params, batch, rng, iteration, phase):
        real_data, condition, neg_condition = self._prepare_training_data(batch)
        batch_size = real_data.shape[0]
        ns = self.net.noise_scheduler
        k_t, k_eps, k_mix, k_drop = jax.random.split(rng, 4)

        t = ns.sample_t(k_t, batch_size, **convert_cfg_to_dict(self.config.sample_t_cfg))
        eps = jax.random.normal(k_eps, real_data.shape, real_data.dtype)

        cond_dropout = getattr(self.config, "cond_dropout_prob", None)
        condition_train = self.mix_condition(
            k_mix, condition, neg_condition, cond_dropout,
            keys_no_dropout=getattr(self.config, "cond_keys_no_dropout", ()))

        noisy = ns.forward_process(real_data, eps, t)
        net_pred = self.apply_net(params, "net", noisy, t, condition=condition_train,
                                  train=True, rngs={"dropout": k_drop})

        loss = denoising_score_matching_loss(
            self.net.net_pred_type, net_pred=net_pred, noise_scheduler=ns,
            x0=real_data, eps=eps, t=t)
        loss_map = {"total_loss": loss, "dsm_loss": loss}
        outputs = {"gen_train": net_pred}
        return loss_map, outputs

    def generator_fn(self, params_net, noise, rng=None, condition=None,
                     neg_condition=None, num_steps: int = None, **kwargs):
        """SFT 'student' sampling = the net's own multi-step sampler
        (ref ``sft.py:98-109``)."""
        net = self.net
        num_steps = num_steps or self.config.student_sample_steps
        return net.apply(params_net, noise, method=net.sample, condition=condition,
                         neg_condition=neg_condition,
                         guidance_scale=self.config.guidance_scale,
                         num_steps=num_steps, **kwargs)


class CausalSFTModel(SFTModel):
    """SFT with per-chunk inhomogeneous t (diffusion forcing; ref ``sft.py:164-247``).

    Data layout [B, T, H, W, C] (time-major video latents, NHWC frames);
    t_inhom is [B, T] and broadcasts as [B, T, 1, 1, 1].
    """

    def compute_losses(self, params, batch, rng, iteration, phase):
        real_data, condition, neg_condition = self._prepare_training_data(batch)
        batch_size = real_data.shape[0]
        seq_len = real_data.shape[1]
        ns = self.net.noise_scheduler
        k_t, k_eps, k_mix, k_drop = jax.random.split(rng, 4)

        eps = jax.random.normal(k_eps, real_data.shape, real_data.dtype)
        t_inhom = ns.sample_t_inhom_sft(
            k_t, batch_size, seq_len, self.net.chunk_size,
            **convert_cfg_to_dict(self.config.sample_t_cfg))
        t_expanded = t_inhom[:, :, None, None, None]
        noisy = ns.forward_process(real_data, eps, t_expanded)

        cond_dropout = getattr(self.config, "cond_dropout_prob", None)
        condition_train = self.mix_condition(
            k_mix, condition, neg_condition, cond_dropout,
            keys_no_dropout=getattr(self.config, "cond_keys_no_dropout", ()))

        net_pred = self.apply_net(params, "net", noisy, t_inhom,
                                  condition=condition_train, train=True,
                                  rngs={"dropout": k_drop})
        loss = denoising_score_matching_loss(
            self.net.net_pred_type, net_pred=net_pred, noise_scheduler=ns,
            x0=real_data, eps=eps, t=t_expanded)
        return {"total_loss": loss, "dsm_loss": loss}, {"gen_train": net_pred}
