"""Noise schedules: the forward-process/pred-type algebra core of the framework.

TPU-native re-design of the reference's ``fastgen/networks/noise_schedule.py``:

* Same math contract: ``x_t = alpha(t) x_0 + sigma(t) eps``, pred-type algebra
  (x0/eps/v/flow), t-samplers (uniform/lognormal/logitnormal/polynomial/
  shifted/log_t), ``get_t_list``, inhomogeneous per-chunk t for diffusion
  forcing (reference ``noise_schedule.py:342-407``).
* Pure functions + explicit ``jax.random`` keys — every sampler is jittable and
  reproducible across hosts by seeding identically (this replaces the
  reference's rank-0 sample + broadcast patterns).
* Precision: the reference computes schedule math in float64
  (``noise_schedule.py:425-449``). TPU f64 is emulated and slow, so tensor math
  runs in float32 islands and only the [B]-shaped timestep math optionally uses
  f64 (cheap). Parity tests check the fp32 path against the f64 formulas.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fastgen_tpu.utils import expand_like

NET_PRED_TYPES = ("x0", "eps", "v", "flow")


def _compute_dtype(*arrays) -> jnp.dtype:
    """float32 compute islands; bump to f64 only if inputs already are (x64 mode)."""
    for a in arrays:
        if hasattr(a, "dtype") and a.dtype == jnp.float64:
            return jnp.float64
    return jnp.float32


class BaseNoiseSchedule:
    """Forward process ``x_t = alpha(t) x_0 + sigma(t) eps`` plus pred-type algebra.

    Stateless w.r.t. JAX: all tables are host numpy constants baked into the
    jitted program; all randomness flows through explicit PRNG keys.
    """

    # concrete subclasses override
    def _alpha(self, t):
        raise NotImplementedError

    def _sigma(self, t):
        raise NotImplementedError

    def _alpha_prime(self, t):
        raise NotImplementedError

    def _sigma_prime(self, t):
        raise NotImplementedError

    def __init__(self, min_t: float, max_t: float, num_steps: int,
                 clamp_min: float = 1e-6, t_dtype=jnp.float32):
        assert min_t >= 0 and max_t > min_t
        self.min_t = float(min_t)
        self.max_t = float(max_t)
        self.num_steps = int(num_steps)
        self.clamp_min = float(clamp_min)
        self.t_dtype = t_dtype
        self._supported_time_dist_types = (
            "lognormal", "logitnormal", "uniform", "polynomial", "shifted", "log_t")

    # ------------------------------------------------------------------ basics
    @property
    def max_sigma(self) -> float:
        raise NotImplementedError

    @property
    def sigmas(self) -> np.ndarray:
        """All noise scales as a host numpy table (baked as a jit constant)."""
        raise NotImplementedError

    def rescale_t(self, t):
        """Rescale t to the range the raw backbone consumes (identity for EDM)."""
        return self._rescale_t(t)

    def _rescale_t(self, t):
        return t

    def non_zero_clamp(self, x):
        c = jnp.asarray(self.clamp_min, dtype=x.dtype)
        return jnp.where(x >= 0, jnp.maximum(x, c), jnp.minimum(x, -c))

    def safe_clamp(self, t, min=None, max=None):
        if min is not None:
            t = jnp.maximum(t, jnp.asarray(min, dtype=t.dtype))
        if max is not None:
            t = jnp.minimum(t, jnp.asarray(max, dtype=t.dtype))
        return t

    def alpha(self, t):
        return self._alpha(jnp.asarray(t))

    def sigma(self, t):
        return self._sigma(jnp.asarray(t))

    def alpha_prime(self, t):
        return self._alpha_prime(jnp.asarray(t))

    def sigma_prime(self, t):
        return self._sigma_prime(jnp.asarray(t))

    # ------------------------------------------------------- forward process
    def latents(self, noise, t_init=None):
        """Scale pure noise by sigma at the initial time (ref ``noise_schedule.py:72-88``)."""
        if t_init is None:
            t_init = jnp.asarray(self.max_t, dtype=self.t_dtype)
        else:
            t_init = jnp.asarray(t_init, dtype=self.t_dtype)
        cd = _compute_dtype(noise)
        sigma = expand_like(self._sigma(t_init.astype(cd)), noise)
        return (noise.astype(cd) * sigma).astype(noise.dtype)

    def forward_process(self, x, eps, t):
        """x_t = alpha(t) x + sigma(t) eps (ref ``noise_schedule.py:425-449``)."""
        cd = _compute_dtype(x)
        t = jnp.asarray(t).astype(cd)
        alpha_t = expand_like(self._alpha(t), x)
        sigma_t = expand_like(self._sigma(t), x)
        out = x.astype(cd) * alpha_t + eps.astype(cd) * sigma_t
        return out.astype(x.dtype)

    def cond_velocity(self, x, eps, t):
        """dx/dt = alpha'(t) x_0 + sigma'(t) eps (ref ``noise_schedule.py:451-476``)."""
        cd = _compute_dtype(x)
        t = jnp.asarray(t).astype(cd)
        ap = expand_like(self._alpha_prime(t), x)
        sp = expand_like(self._sigma_prime(t), x)
        out = x.astype(cd) * ap + eps.astype(cd) * sp
        return out.astype(x.dtype)

    # ------------------------------------------------------ pred-type algebra
    def x0_to_eps(self, xt, x0, t):
        cd = _compute_dtype(xt)
        t = jnp.asarray(t).astype(cd)
        alpha_t = expand_like(self._alpha(t), xt)
        sigma_t = expand_like(self._sigma(t), xt)
        eps = (xt.astype(cd) - x0.astype(cd) * alpha_t) / self.non_zero_clamp(sigma_t)
        return eps.astype(xt.dtype)

    def eps_to_x0(self, xt, eps, t):
        cd = _compute_dtype(xt)
        t = jnp.asarray(t).astype(cd)
        alpha_t = expand_like(self._alpha(t), xt)
        sigma_t = expand_like(self._sigma(t), xt)
        x0 = (xt.astype(cd) - eps.astype(cd) * sigma_t) / self.non_zero_clamp(alpha_t)
        return x0.astype(xt.dtype)

    def v_to_x0(self, xt, v, t):
        """x0 = alpha(t) xt - sigma(t) v. Valid only when alpha^2+sigma^2=1."""
        cd = _compute_dtype(xt)
        t = jnp.asarray(t).astype(cd)
        alpha_t = expand_like(self._alpha(t), xt)
        sigma_t = expand_like(self._sigma(t), xt)
        x0 = xt.astype(cd) * alpha_t - v.astype(cd) * sigma_t
        return x0.astype(xt.dtype)

    def x0_to_v(self, xt, x0, t):
        """v = (alpha(t) xt - x0) / sigma(t). Valid only when alpha^2+sigma^2=1."""
        cd = _compute_dtype(xt)
        t = jnp.asarray(t).astype(cd)
        alpha_t = expand_like(self._alpha(t), xt)
        sigma_t = expand_like(self._sigma(t), xt)
        v = (xt.astype(cd) * alpha_t - x0.astype(cd)) / self.non_zero_clamp(sigma_t)
        return v.astype(xt.dtype)

    def flow_to_x0(self, xt, v, t):
        """Generic flow->x0 via alpha/sigma primes (ref ``noise_schedule.py:610-645``)."""
        cd = _compute_dtype(xt)
        t = jnp.asarray(t).astype(cd)
        alpha_t = expand_like(self._alpha(t), xt)
        sigma_t = expand_like(self._sigma(t), xt)
        ap = expand_like(self._alpha_prime(t), xt)
        sp = expand_like(self._sigma_prime(t), xt)
        xt_coeff = sp / self.non_zero_clamp(sigma_t)
        x0_coeff = xt_coeff * alpha_t - ap
        x0 = (xt.astype(cd) * xt_coeff - v.astype(cd)) / self.non_zero_clamp(x0_coeff)
        return x0.astype(xt.dtype)

    def x0_to_flow(self, xt, x0, t):
        """flow = cond_velocity(x0, x0_to_eps(xt, x0, t), t)."""
        return self.cond_velocity(x0, self.x0_to_eps(xt, x0, t), t)

    def convert_model_output(self, xt, model_output, t, src_pred_type="x0",
                             target_pred_type="eps"):
        """Convert a model output between pred types (ref ``noise_schedule.py:666-726``)."""
        if src_pred_type == target_pred_type:
            return model_output
        for p in (src_pred_type, target_pred_type):
            if p not in NET_PRED_TYPES:
                raise ValueError(f"Unsupported pred_type {p!r}; supported: {NET_PRED_TYPES}")

        if src_pred_type == "x0":
            x0 = model_output
        elif src_pred_type == "eps":
            x0 = self.eps_to_x0(xt, model_output, t)
        elif src_pred_type == "v":
            x0 = self.v_to_x0(xt, model_output, t)
        else:  # flow
            x0 = self.flow_to_x0(xt, model_output, t)

        if target_pred_type == "x0":
            return x0
        if target_pred_type == "eps":
            return self.x0_to_eps(xt, x0, t)
        if target_pred_type == "v":
            return self.x0_to_v(xt, x0, t)
        return self.x0_to_flow(xt, x0, t)

    # -------------------------------------------------------------- snr utils
    def sqrt_snr(self, t):
        t = jnp.asarray(t)
        return self._alpha(t) / self.non_zero_clamp(self._sigma(t))

    def sqrt_snr_to_t(self, sqrt_snr_t):
        raise NotImplementedError

    def closest_sigma_idx(self, sigma_t):
        """Index of the nearest entry in ``self.sigmas`` (ref ``noise_schedule.py:478-504``)."""
        sigma_t = jnp.asarray(sigma_t)
        shape = sigma_t.shape
        flat = sigma_t.reshape(-1)
        sigmas = jnp.asarray(self.sigmas, dtype=flat.dtype)
        right = jnp.searchsorted(sigmas, flat, side="right")
        left = jnp.clip(right - 1, 0, None)
        right = jnp.clip(right, None, sigmas.shape[0] - 1)
        use_right = jnp.abs(sigmas[right] - flat) < jnp.abs(sigmas[left] - flat)
        idx = jnp.where(use_right, right, left)
        return idx.reshape(shape)

    def sigma_idx_to_t(self, sigma_idx):
        raise NotImplementedError

    # ------------------------------------------------------------- t samplers
    def get_t_list(self, sample_steps: int) -> np.ndarray:
        """[max_t ... 0], len = sample_steps+1 (host numpy; static under jit)."""
        return np.linspace(self.max_t, 0.0, sample_steps + 1, dtype=np.float64).astype(
            np.dtype(self.t_dtype))

    def sample_from_t_list(self, key, n: int, sample_steps: int, t_list=None,
                           return_ids: bool = False):
        """Uniformly pick non-terminal entries of t_list (ref ``noise_schedule.py:274-304``)."""
        if t_list is None:
            t_list = self.get_t_list(sample_steps)
        t_list = jnp.asarray(t_list, dtype=self.t_dtype)
        ids = jax.random.randint(key, (n,), 0, t_list.shape[0] - 1)
        if return_ids:
            return t_list[ids], ids
        return t_list[ids]

    def next_in_t_list(self, ids, sample_steps: int, t_list=None, stride: int = 1):
        if t_list is None:
            t_list = self.get_t_list(sample_steps)
        t_list = jnp.asarray(t_list, dtype=self.t_dtype)
        return t_list[ids + stride]

    def sample_t_inhom(self, key, n: int, seq_len: int, chunk_size: int,
                       sample_steps: int, t_list=None):
        """Block-wise independent t for diffusion forcing (ref ``noise_schedule.py:342-383``).

        First chunk absorbs the remainder; returns (t, ids), both [n, seq_len].
        """
        if t_list is None:
            t_list = self.get_t_list(sample_steps)
        t_list = jnp.asarray(t_list, dtype=self.t_dtype)
        num_chunks = seq_len // chunk_size
        remaining = seq_len % chunk_size
        unique_id = jax.random.randint(key, (n, num_chunks), 0, t_list.shape[0])
        first = jnp.repeat(unique_id[:, :1], chunk_size + remaining, axis=1)
        rest = jnp.repeat(unique_id[:, 1:], chunk_size, axis=1)
        ids = jnp.concatenate([first, rest], axis=1)
        return t_list[ids], ids

    def sample_t_inhom_sft(self, key, n: int, seq_len: int, chunk_size: int,
                           **sample_t_kwargs):
        """Block-wise independent continuous t for SFT (ref ``noise_schedule.py:385-407``)."""
        num_chunks = seq_len // chunk_size
        remaining = seq_len % chunk_size
        flat_t = self.sample_t(key, n * num_chunks, **sample_t_kwargs)
        t = flat_t.reshape(n, num_chunks)
        first = jnp.repeat(t[:, :1], chunk_size + remaining, axis=1)
        rest = jnp.repeat(t[:, 1:], chunk_size, axis=1)
        return jnp.concatenate([first, rest], axis=1)

    def _resolve_range(self, min_t, max_t):
        min_t = self.min_t if min_t is None else max(float(min_t), self.min_t)
        max_t = self.max_t if max_t is None else min(float(max_t), self.max_t)
        return min_t, max_t

    def sample_t(self, key, n: int, time_dist_type: str = "uniform", **kwargs):
        raise NotImplementedError

    # shared sampler pieces -------------------------------------------------
    def _uniform_sample(self, key, n, min_t, max_t):
        u = jax.random.uniform(key, (n,), dtype=self.t_dtype)
        return u * (max_t - min_t) + min_t

    def _logitnormal_sample(self, key, n, mean, std, min_t, max_t):
        z = jax.random.normal(key, (n,), dtype=self.t_dtype)
        return jax.nn.sigmoid(z * std + mean) * (max_t - min_t) + min_t

    def _truncated_lognormal_sample(self, key, n, mean, std, min_t, max_t):
        """Inverse-CDF sampling of a log-space truncated normal
        (ref ``noise_schedule.py:819-843``)."""
        from jax.scipy.special import ndtri
        from jax.scipy.stats import norm

        log_min = jnp.log(jnp.maximum(jnp.asarray(min_t, jnp.float32), self.clamp_min))
        log_max = jnp.log(jnp.asarray(max_t, jnp.float32))
        cdf_min = norm.cdf((log_min - mean) / std)
        cdf_max = norm.cdf((log_max - mean) / std)
        u = jax.random.uniform(key, (n,), dtype=jnp.float32) * (cdf_max - cdf_min) + cdf_min
        t = jnp.exp(ndtri(u) * std + mean)
        return t.astype(self.t_dtype)

    def _truncated_log_t_sample(self, key, n, mean, std, min_t, max_t, df):
        """Truncated log-space Student-t via bisection on the t-CDF.

        The reference uses scipy's ppf on host (``noise_schedule.py:845-876``);
        here we invert the CDF with a fixed-iteration bisection so the sampler
        is jittable on device. CDF via the regularized incomplete beta.
        """
        from jax.scipy.special import betainc

        df = jnp.asarray(df, jnp.float32)

        def t_cdf(x):
            # Student-t CDF; x shaped [n]
            ib = betainc(df / 2.0, 0.5, df / (df + x * x))
            return jnp.where(x >= 0, 1.0 - 0.5 * ib, 0.5 * ib)

        log_min = jnp.log(jnp.maximum(jnp.asarray(min_t, jnp.float32), self.clamp_min))
        log_max = jnp.log(jnp.asarray(max_t, jnp.float32))
        lo_std = (log_min - mean) / std
        hi_std = (log_max - mean) / std
        a = t_cdf(jnp.asarray(lo_std)[None])[0]
        b = t_cdf(jnp.asarray(hi_std)[None])[0]
        u = jax.random.uniform(key, (n,), dtype=jnp.float32) * (b - a) + a

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            below = t_cdf(mid) < u
            return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

        lo = jnp.full((n,), lo_std, jnp.float32)
        hi = jnp.full((n,), hi_std, jnp.float32)
        lo, hi = jax.lax.fori_loop(0, 64, body, (lo, hi))
        x = 0.5 * (lo + hi)
        t = jnp.exp(x * std + mean)
        return t.astype(self.t_dtype)


class EDMNoiseSchedule(BaseNoiseSchedule):
    """EDM (Karras et al. 2022): alpha=1, sigma=t, t in [0.002, 80]
    (ref ``noise_schedule.py:729-1035``). Sigma table uses Karras rho-spacing."""

    def __init__(self, min_t: float = 0.002, max_t: float = 80.0, rho: float = 7.0,
                 min_step_percent: float = 0.002, max_step_percent: float = 0.998,
                 num_steps: int = 1000, **kwargs):
        super().__init__(min_t, max_t, num_steps, **kwargs)
        ramp = np.linspace(0, 1, num_steps, dtype=np.float64)
        min_inv_rho = min_t ** (1 / rho)
        max_inv_rho = max_t ** (1 / rho)
        self._sigmas = ((max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho)[::-1].copy()
        self._min_step = int(min_step_percent * num_steps)
        self._max_step = int(max_step_percent * num_steps)

    @property
    def max_sigma(self) -> float:
        return self.max_t

    @property
    def sigmas(self) -> np.ndarray:
        return self._sigmas

    def _alpha(self, t):
        return jnp.ones_like(t)

    def _sigma(self, t):
        return t

    def _alpha_prime(self, t):
        return jnp.zeros_like(t)

    def _sigma_prime(self, t):
        return jnp.ones_like(t)

    def sigma_idx_to_t(self, sigma_idx):
        return jnp.asarray(self._sigmas, dtype=self.t_dtype)[sigma_idx]

    def sqrt_snr_to_t(self, sqrt_snr_t):
        return 1.0 / self.non_zero_clamp(jnp.asarray(sqrt_snr_t))

    def get_t_list(self, sample_steps: int) -> np.ndarray:
        """Rho-spaced sigma indices, last entry exactly 0 (ref ``noise_schedule.py:940-973``)."""
        indices = np.linspace(self._max_step, self._min_step, sample_steps + 1).astype(np.int64)
        t_list = self._sigmas[indices].copy()
        t_list[-1] = 0.0
        return np.minimum(t_list, self.max_t).astype(np.dtype(self.t_dtype))

    def sample_t(self, key, n: int, time_dist_type: str = "polynomial",
                 train_p_mean: float = -1.2, train_p_std: float = 1.2,
                 min_t=0.002, max_t=80.0, log_t_df: float = 0.01, **kwargs):
        assert time_dist_type in self._supported_time_dist_types
        min_t, max_t = self._resolve_range(min_t, max_t)
        if time_dist_type == "lognormal":
            t = self._truncated_lognormal_sample(key, n, train_p_mean, train_p_std, min_t, max_t)
        elif time_dist_type == "log_t":
            t = self._truncated_log_t_sample(key, n, train_p_mean, train_p_std, min_t, max_t,
                                             log_t_df)
        elif time_dist_type == "uniform":
            t = self._uniform_sample(key, n, min_t, max_t)
        elif time_dist_type == "polynomial":
            idx = jax.random.randint(key, (n,), self._min_step, self._max_step + 1)
            t = jnp.asarray(self._sigmas, dtype=self.t_dtype)[idx]
        else:
            raise ValueError(f"Unsupported time_dist_type {time_dist_type!r} for EDM")
        return self.safe_clamp(t, min_t, max_t)

    def flow_to_x0(self, xt, v, t):
        """x0 = xt - t * v (EDM special case, ref ``noise_schedule.py:975-1004``)."""
        cd = _compute_dtype(xt)
        t_e = expand_like(jnp.asarray(t).astype(cd), xt)
        return (xt.astype(cd) - v.astype(cd) * t_e).astype(xt.dtype)

    def x0_to_flow(self, xt, x0, t):
        """flow = (xt - x0) / t (EDM special case)."""
        cd = _compute_dtype(xt)
        t_e = expand_like(jnp.asarray(t).astype(cd), xt)
        return ((xt.astype(cd) - x0.astype(cd)) / self.non_zero_clamp(t_e)).astype(xt.dtype)


class AlphasNoiseSchedule(BaseNoiseSchedule):
    """DDPM-style table schedule: alpha(t)=sqrt(abar[ti]), sigma(t)=sqrt(1-abar[ti]),
    ti = floor(num_steps * t) (ref ``noise_schedule.py:1038-1245``)."""

    def __init__(self, alphas_cumprod, min_t: float = 0.0, max_t: float = 0.999,
                 num_steps: int = 1000, **kwargs):
        super().__init__(min_t, max_t, num_steps, **kwargs)
        assert 0 <= min_t < max_t <= 0.999
        self._alphas_cumprod = np.asarray(alphas_cumprod, dtype=np.float64)
        assert len(self._alphas_cumprod) == num_steps

    def _rescale_t(self, t):
        return self.num_steps * t

    @property
    def max_sigma(self) -> float:
        idx = int(self.num_steps * self.max_t)
        return float(np.sqrt(1 - self._alphas_cumprod[idx]))

    @property
    def sigmas(self) -> np.ndarray:
        return np.sqrt(1 - self._alphas_cumprod)

    def _t_to_idx(self, t):
        idx = (self.num_steps * t).astype(jnp.int32)
        return jnp.clip(idx, 0, len(self._alphas_cumprod) - 1)

    def _abar(self, t):
        table = jnp.asarray(self._alphas_cumprod, dtype=_compute_dtype(t))
        return table[self._t_to_idx(t)]

    def _alpha(self, t):
        return jnp.sqrt(self._abar(t)).astype(t.dtype)

    def _sigma(self, t):
        return jnp.sqrt(1.0 - self._abar(t)).astype(t.dtype)

    def _alpha_prime(self, t):
        raise NotImplementedError("Table-based schedule has no analytic alpha'")

    def _sigma_prime(self, t):
        raise NotImplementedError("Table-based schedule has no analytic sigma'")

    def sigma_idx_to_t(self, sigma_idx):
        return sigma_idx.astype(self.t_dtype) / self.num_steps

    def sqrt_snr_to_t(self, sqrt_snr_t):
        sqrt_snr_t = jnp.asarray(sqrt_snr_t, jnp.float32)
        sigma_t = 1.0 / (1.0 + sqrt_snr_t**2)
        return self.sigma_idx_to_t(self.closest_sigma_idx(sigma_t))

    def sample_t(self, key, n: int, time_dist_type: str = "logitnormal",
                 train_p_mean: float = 0.0, train_p_std: float = 1.0,
                 min_t=0.001, max_t=0.999, **kwargs):
        assert time_dist_type in self._supported_time_dist_types
        min_t, max_t = self._resolve_range(min_t, max_t)
        if time_dist_type == "logitnormal":
            t = self._logitnormal_sample(key, n, train_p_mean, train_p_std, min_t, max_t)
        elif time_dist_type == "uniform":
            t = self._uniform_sample(key, n, min_t, max_t)
        else:
            raise ValueError(f"Unsupported time_dist_type {time_dist_type!r} for Alphas")
        return self.safe_clamp(t, min_t, max_t)


def _ddpm_alphas_cumprod(num_steps=1000, beta_start=0.00085, beta_end=0.012,
                         beta_schedule="scaled_linear", rescale_zero_snr=False,
                         snr_shift_scale=1.0) -> np.ndarray:
    """Compute the DDPM/DDIM alphas_cumprod table locally (no HF download).

    Matches diffusers' DDIMScheduler/CogVideoXDPMScheduler construction used by
    the reference's SD/SDXL/CogVideoX schedules (``noise_schedule.py:1248-1303``).
    """
    if beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, num_steps, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_steps, dtype=np.float64)
    else:
        raise ValueError(f"Unknown beta_schedule {beta_schedule!r}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    if snr_shift_scale != 1.0:
        alphas_cumprod = alphas_cumprod / (snr_shift_scale + (1 - snr_shift_scale) * alphas_cumprod)
    if rescale_zero_snr:
        # Lin et al. 2023, "Common Diffusion Noise Schedules are Flawed"
        abar_sqrt = np.sqrt(alphas_cumprod)
        abar_sqrt_0 = abar_sqrt[0].copy()
        abar_sqrt_T = abar_sqrt[-1].copy()
        abar_sqrt = abar_sqrt - abar_sqrt_T
        abar_sqrt = abar_sqrt * abar_sqrt_0 / (abar_sqrt_0 - abar_sqrt_T)
        alphas_cumprod = abar_sqrt**2
    return alphas_cumprod


class SDNoiseSchedule(AlphasNoiseSchedule):
    """Stable Diffusion 1.5 schedule (scaled_linear betas 0.00085->0.012)."""

    def __init__(self, *args, **kwargs):
        super().__init__(_ddpm_alphas_cumprod(), *args, **kwargs)


class SDXLNoiseSchedule(AlphasNoiseSchedule):
    """SDXL base schedule (same beta parameterization as SD1.5)."""

    def __init__(self, *args, **kwargs):
        super().__init__(_ddpm_alphas_cumprod(), *args, **kwargs)


class CogVideoXNoiseSchedule(AlphasNoiseSchedule):
    """CogVideoX schedule: zero-SNR-rescaled scaled_linear with optional SNR shift
    (ref ``noise_schedule.py:1262-1303``)."""

    def __init__(self, *args, model_id: str = "THUDM/CogVideoX-5b", **kwargs):
        snr_shift_scale = 1.0 if model_id == "THUDM/CogVideoX-5b" else 3.0
        table = _ddpm_alphas_cumprod(rescale_zero_snr=True, snr_shift_scale=snr_shift_scale)
        # zero-SNR rescale makes the terminal abar exactly 0 -> sigma=1; clamp the
        # terminal entry so sqrt/log math stays finite
        table[-1] = max(table[-1], 1e-12)
        super().__init__(table, *args, **kwargs)


class RFNoiseSchedule(BaseNoiseSchedule):
    """Rectified flow: alpha=1-t, sigma=t, t in [0, 0.999]
    (ref ``noise_schedule.py:1306-1486``)."""

    def __init__(self, min_t: float = 0.0, max_t: float = 0.999, num_steps: int = 1000,
                 **kwargs):
        super().__init__(min_t, max_t, num_steps, **kwargs)
        assert 0 <= min_t < max_t <= 0.999
        self._sigmas = np.linspace(min_t, max_t, num_steps, dtype=np.float64)

    @property
    def max_sigma(self) -> float:
        idx = int(self.num_steps * self.max_t)
        return float(self._sigmas[idx])

    @property
    def sigmas(self) -> np.ndarray:
        return self._sigmas

    def _rescale_t(self, t):
        return self.num_steps * t

    def _alpha(self, t):
        return 1.0 - t

    def _sigma(self, t):
        return t

    def _alpha_prime(self, t):
        return -jnp.ones_like(t)

    def _sigma_prime(self, t):
        return jnp.ones_like(t)

    def sigma_idx_to_t(self, sigma_idx):
        return sigma_idx.astype(self.t_dtype) / self.num_steps

    def sqrt_snr_to_t(self, sqrt_snr_t):
        sqrt_snr_t = jnp.asarray(sqrt_snr_t, jnp.float32)
        return 1.0 / (sqrt_snr_t + 1.0)

    def sample_t(self, key, n: int, time_dist_type: str = "logitnormal",
                 train_p_mean: float = 0.0, train_p_std: float = 1.0,
                 min_t=0.001, max_t=0.999, shift: float = 5.0, **kwargs):
        assert time_dist_type in self._supported_time_dist_types
        min_t, max_t = self._resolve_range(min_t, max_t)
        if time_dist_type == "logitnormal":
            t = self._logitnormal_sample(key, n, train_p_mean, train_p_std, min_t, max_t)
        elif time_dist_type == "uniform":
            t = self._uniform_sample(key, n, min_t, max_t)
        elif time_dist_type == "shifted":
            assert shift >= 1
            t = self._uniform_sample(key, n, min_t, max_t)
            t = t * shift / (t * (shift - 1) + 1)
        else:
            raise ValueError(f"Unsupported time_dist_type {time_dist_type!r} for RF")
        return self.safe_clamp(t, min_t, max_t)

    def flow_to_x0(self, xt, v, t):
        """x0 = xt - t * v (RF special case)."""
        cd = _compute_dtype(xt)
        t_e = expand_like(jnp.asarray(t).astype(cd), xt)
        return (xt.astype(cd) - v.astype(cd) * t_e).astype(xt.dtype)

    def x0_to_flow(self, xt, x0, t):
        """flow = (xt - x0) / t (RF special case)."""
        cd = _compute_dtype(xt)
        t_e = expand_like(jnp.asarray(t).astype(cd), xt)
        return ((xt.astype(cd) - x0.astype(cd)) / self.non_zero_clamp(t_e)).astype(xt.dtype)


class TrigNoiseSchedule(BaseNoiseSchedule):
    """TrigFlow: alpha=cos(t), sigma=sin(t), t in [0, pi/2]
    (ref ``noise_schedule.py:1489-1651``)."""

    def __init__(self, min_t: float = 0.0, max_t: float = float(np.pi / 2),
                 num_steps: int = 1000, **kwargs):
        super().__init__(min_t, max_t, num_steps, **kwargs)
        self._sigmas = np.sin(np.linspace(min_t, max_t, num_steps, dtype=np.float64))

    @property
    def max_sigma(self) -> float:
        return float(np.sin(self.max_t))

    @property
    def sigmas(self) -> np.ndarray:
        return self._sigmas

    def _alpha(self, t):
        return jnp.cos(t)

    def _sigma(self, t):
        return jnp.sin(t)

    def _alpha_prime(self, t):
        return -jnp.sin(t)

    def _sigma_prime(self, t):
        return jnp.cos(t)

    def sigma_idx_to_t(self, sigma_idx):
        return (sigma_idx.astype(self.t_dtype) / (self.num_steps - 1)
                * (self.max_t - self.min_t) + self.min_t)

    def sqrt_snr(self, t):
        t = jnp.asarray(t)
        return 1.0 / self.non_zero_clamp(jnp.tan(t))

    def sqrt_snr_to_t(self, sqrt_snr_t):
        sqrt_snr_t = jnp.asarray(sqrt_snr_t, jnp.float32)
        return jnp.arctan2(jnp.ones_like(sqrt_snr_t), sqrt_snr_t)

    def sample_t(self, key, n: int, time_dist_type: str = "uniform",
                 train_p_mean: float = 0.0, train_p_std: float = 1.0,
                 min_t=0.0, max_t=float(np.pi / 2), **kwargs):
        assert time_dist_type in self._supported_time_dist_types
        min_t, max_t = self._resolve_range(min_t, max_t)
        if time_dist_type == "logitnormal":
            t = self._logitnormal_sample(key, n, train_p_mean, train_p_std, min_t, max_t)
        elif time_dist_type == "uniform":
            t = self._uniform_sample(key, n, min_t, max_t)
        else:
            raise ValueError(f"Unsupported time_dist_type {time_dist_type!r} for Trig")
        return self.safe_clamp(t, min_t, max_t)

    def flow_to_x0(self, xt, v, t):
        """x0 = cos(t) xt - sin(t) v (ref ``noise_schedule.py:1613-1633``)."""
        cd = _compute_dtype(xt)
        t = jnp.asarray(t).astype(cd)
        cos_t = expand_like(jnp.cos(t), xt)
        sin_t = expand_like(jnp.sin(t), xt)
        return (xt.astype(cd) * cos_t - v.astype(cd) * sin_t).astype(xt.dtype)

    def x0_to_flow(self, xt, x0, t):
        """v = (cos(t) xt - x0) / sin(t)."""
        cd = _compute_dtype(xt)
        t = jnp.asarray(t).astype(cd)
        cos_t = expand_like(jnp.cos(t), xt)
        sin_t = expand_like(jnp.sin(t), xt)
        return ((xt.astype(cd) * cos_t - x0.astype(cd)) / self.non_zero_clamp(sin_t)).astype(xt.dtype)


NOISE_SCHEDULES = {
    "edm": EDMNoiseSchedule,
    "alphas": AlphasNoiseSchedule,
    "sd": SDNoiseSchedule,
    "sdxl": SDXLNoiseSchedule,
    "cogvideox": CogVideoXNoiseSchedule,
    "rf": RFNoiseSchedule,
    "rectified_flow": RFNoiseSchedule,
    "trig": TrigNoiseSchedule,
}


def get_noise_schedule(name: str, **kwargs) -> BaseNoiseSchedule:
    """Factory (ref ``noise_schedule.py:1667-1696``)."""
    if name not in NOISE_SCHEDULES:
        available = ", ".join(sorted(NOISE_SCHEDULES))
        raise KeyError(f"Unknown noise schedule {name!r}. Available: {available}")
    return NOISE_SCHEDULES[name](**kwargs)


def list_noise_schedules():
    return list(NOISE_SCHEDULES)
