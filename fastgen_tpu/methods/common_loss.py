"""Shared training losses (ref ``fastgen/methods/common_loss.py``).

Pure jnp functions. The VSD pseudo-target trick and fp32 weight island follow
the reference exactly (``common_loss.py:63-103``); gradient stopping uses
``jax.lax.stop_gradient`` instead of ``torch.no_grad``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from fastgen_tpu.utils import expand_like


def mse(a, b):
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def denoising_score_matching_loss(pred_type: str, net_pred, x0=None, eps=None,
                                  noise_scheduler=None, t=None):
    """DSM objective per pred type (ref ``common_loss.py:12-60``)."""
    if pred_type == "x0":
        assert x0 is not None
        return mse(x0, net_pred)
    if pred_type == "eps":
        assert eps is not None
        return mse(eps, net_pred)
    if pred_type == "v":
        assert x0 is not None and eps is not None and t is not None and noise_scheduler is not None
        alpha_t = expand_like(noise_scheduler.alpha(t), x0).astype(x0.dtype)
        sigma_t = expand_like(noise_scheduler.sigma(t), x0).astype(x0.dtype)
        v = alpha_t * eps - sigma_t * x0
        return mse(v, net_pred)
    if pred_type == "flow":
        assert x0 is not None and eps is not None
        return mse(eps - x0, net_pred)
    raise NotImplementedError(f"Unknown prediction type {pred_type}")


def variational_score_distillation_loss(gen_data, teacher_x0, fake_score_x0,
                                        additional_scale=None):
    """VSD loss with the pseudo-target trick (ref ``common_loss.py:63-103``).

    grad wrt gen_data is w * (fake_score_x0 - teacher_x0); implemented as
    0.5*MSE against a stop-gradient pseudo target. Weight w = 1/mean|gen - x0^T|
    is computed in fp32.
    """
    dims = tuple(range(1, teacher_x0.ndim))
    gen32 = jax.lax.stop_gradient(gen_data).astype(jnp.float32)
    teach32 = jax.lax.stop_gradient(teacher_x0).astype(jnp.float32)
    diff_abs_mean = jnp.mean(jnp.abs(gen32 - teach32), axis=dims, keepdims=True)
    w = 1.0 / (diff_abs_mean + 1e-6)
    if additional_scale is not None:
        w = w * expand_like(additional_scale.astype(jnp.float32), w)
    w = w.astype(gen_data.dtype)
    vsd_grad = (fake_score_x0 - teacher_x0) * w
    pseudo_target = jax.lax.stop_gradient(gen_data - vsd_grad)
    return 0.5 * mse(gen_data, pseudo_target)


def gan_loss_generator(fake_logits):
    """Non-saturating generator loss softplus(-D(G)) (ref ``common_loss.py:106-119``)."""
    assert fake_logits.ndim == 2, f"fake_logits has shape {fake_logits.shape}"
    return jnp.mean(jax.nn.softplus(-fake_logits.astype(jnp.float32)))


def gan_loss_discriminator(real_logits, fake_logits):
    """softplus(D(G)) + softplus(-D(x)) (ref ``common_loss.py:122-136``)."""
    assert fake_logits.ndim == 2 and real_logits.ndim == 2
    return (jnp.mean(jax.nn.softplus(fake_logits.astype(jnp.float32)))
            + jnp.mean(jax.nn.softplus(-real_logits.astype(jnp.float32))))
