"""Multistep ODE solvers for teacher sampling.

The reference samples its video/image teachers with diffusers'
``UniPCMultistepScheduler`` (``Wan/network.py:919``, ``cosmos_predict2/
network.py:1152``) / DPM (``CogVideoX/network.py:584``) — high-order
data-prediction multistep methods that reach 50-step Euler quality in
20–30 steps. This module provides a TPU-native equivalent:
**DPM-Solver++(2M)** (Lu et al. 2022, the method UniPC reduces to at order 2
without the corrector), written against the framework's noise-schedule
algebra so every ``alpha(t)/sigma(t)`` schedule (RF, EDM, DDPM-table) uses
the same code.

Update rule in log-SNR time (lambda = log(alpha/sigma), h_i = lambda_{i+1} -
lambda_i), data-prediction form::

    D_i     = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1},  r_i = h_{i-1}/h_i
    x_{i+1} = (sigma_{i+1}/sigma_i) x_i - alpha_{i+1} (e^{-h_i} - 1) D_i

with a first-order (DDIM) step for i = 0. The t grid is static, so every
scalar coefficient (sigma ratios, e^{-h}-1, the 2M mixing weight) is
precomputed host-side with numpy; the network evaluations run under one
``lax.scan`` over the stacked coefficient table — XLA compiles a single
denoiser step and loops it on device, keeping the HLO O(1) in num_steps
(an unrolled 50-step video transformer graph exceeds compile-RPC size
limits and multiplies compile time for zero runtime benefit).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["dpm_solver_2m", "shifted_t_grid"]

_EPS = 1e-8


def shifted_t_grid(max_t: float, num_steps: int, shift: float = 1.0) -> np.ndarray:
    """Descending t grid with UniPC's flow-shift warp (more steps near t=1)."""
    t = np.linspace(max_t, 0.0, num_steps + 1)
    if shift and shift != 1.0:
        t = shift * t / (1.0 + (shift - 1.0) * t)
    return t


def dpm_solver_2m(x0_fn: Callable, noise_schedule, noise: jnp.ndarray,
                  t_list: Sequence[float],
                  latents: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Integrate from ``t_list[0]`` down to ``t_list[-1]``.

    ``x0_fn(x, t_scalar[, step_idx]) -> x0`` is one denoising forward
    returning the data prediction (callers convert via
    ``fwd_pred_type='x0'``); ``noise`` seeds the initial latents unless
    ``latents`` is given. The final step returns the last x0 prediction when
    ``t_list[-1] == 0`` (sigma -> 0 limit).

    The steps run under ``lax.scan``, so ``t_scalar`` and the optional
    ``step_idx`` (int32) reach ``x0_fn`` as *traced* scalars: per-step value
    differences (e.g. a step-dependent CFG scale) must be expressed as a
    gather from a precomputed table, and per-step *structural* differences
    (different layers, different graph) need separate ``dpm_solver_2m``
    calls chained via ``latents=`` (the 2M history restarts first-order at
    the seam, the standard multistep-restart behavior).
    """
    import inspect

    n_fn_args = len(inspect.signature(x0_fn).parameters)
    ns = noise_schedule
    t_list = [float(t) for t in t_list]

    def a(t):
        return float(np.asarray(ns.alpha(jnp.float32(t))))

    def s(t):
        return max(float(np.asarray(ns.sigma(jnp.float32(t)))), 0.0)

    x = ns.latents(noise, t_init=jnp.asarray(t_list[0], jnp.float32)) \
        if latents is None else latents
    lam = [np.log(max(a(t), _EPS) / max(s(t), _EPS)) for t in t_list]

    # Host-side pass over the static grid: per-step scalar coefficients
    # (t_cur, sigma ratio, alpha*phi, 2M mixing weight, 2M-enable flag).
    coeffs = []
    endpoint_t = None
    h_prev = None
    for i in range(len(t_list) - 1):
        t_cur, t_next = t_list[i], t_list[i + 1]
        if s(t_next) <= _EPS or t_next <= 0.0:
            # sigma -> 0 endpoint: first-order (x = alpha(0) * x0 = x0).
            # Deliberately NOT the 2M combination: h -> inf there, so the
            # second-order coefficient 1/(2r) = h/(2 h_prev) diverges —
            # diffusers likewise forces lower_order_final whenever
            # final_sigmas_type == "zero" for exactly this reason.
            endpoint_t = t_cur
            break
        h = lam[i + 1] - lam[i]
        ratio = s(t_next) / max(s(t_cur), _EPS)
        phi = np.expm1(-h)
        if h_prev is None or abs(h_prev) < _EPS:
            inv_2r, use_2m = 0.0, 0.0   # first-order (DDIM) warmup step
        else:
            inv_2r, use_2m = h / (2.0 * h_prev), 1.0   # 1/(2r), r = h_prev/h
        coeffs.append((t_cur, ratio, a(t_next) * phi, inv_2r, use_2m))
        h_prev = h

    if coeffs:
        def step(carry, sc):
            i, c = sc
            x, x0_prev = carry
            args = (x, c[0]) if n_fn_args < 3 else (x, c[0], i)
            x0_cur = x0_fn(*args).astype(x.dtype)
            d = jnp.where(c[4] > 0,
                          (1.0 + c[3]).astype(x.dtype) * x0_cur
                          - c[3].astype(x.dtype) * x0_prev,
                          x0_cur)
            x = c[1].astype(x.dtype) * x - c[2].astype(x.dtype) * d
            return (x, x0_cur), None

        table = jnp.asarray(np.array(coeffs, np.float32))
        idxs = jnp.arange(len(coeffs), dtype=jnp.int32)
        (x, x0_prev), _ = jax.lax.scan(step, (x, jnp.zeros_like(x)),
                                       (idxs, table))
    if endpoint_t is not None:
        args = (x, endpoint_t) if n_fn_args < 3 else (x, endpoint_t, len(coeffs))
        x = x0_fn(*args)
    return x


def net_dpm2m_sample(net, noise, condition=None, neg_condition=None,
                     guidance_scale: Optional[float] = None,
                     num_steps: int = 50, shift: float = 1.0,
                     **net_kwargs) -> jnp.ndarray:
    """Shared ``solver="dpm2m"`` branch for the teacher samplers: x0-space
    CFG (affine-equivalent to velocity/eps CFG), conditioning preservation,
    flow-shift grid. Extra ``net_kwargs`` ride into every forward (e.g.
    Flux's embedded ``guidance``)."""
    ns = net.noise_scheduler
    use_cfg = (guidance_scale is not None and guidance_scale > 1.0
               and neg_condition is not None)

    def x0_fn(x, t_cur):
        tb = jnp.full((x.shape[0],), t_cur, jnp.float32)
        x0 = net(x, tb, condition=condition, fwd_pred_type="x0", **net_kwargs)
        if use_cfg:
            x0_neg = net(x, tb, condition=neg_condition, fwd_pred_type="x0",
                         **net_kwargs)
            x0 = x0_neg + guidance_scale * (x0 - x0_neg)
        preserve = getattr(net, "preserve_conditioning", None)
        return preserve(x0, condition) if preserve is not None else x0

    return dpm_solver_2m(x0_fn, ns, noise,
                         shifted_t_grid(ns.max_t, num_steps, shift))
