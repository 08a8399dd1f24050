"""CausVid: DMD2 for causal (autoregressive) video
(ref ``fastgen/methods/distribution_matching/causvid.py``).

Student is a CausalWanVideoDiT trained with diffusion forcing (per-chunk
inhomogeneous t, one parallel block-causal forward — no rollout); teacher/
fake_score are bidirectional. Generation is block-autoregressive with the
explicit KV-cache pytrees (ref ``causvid.py:87-185``).
"""

from __future__ import annotations

import functools
import numpy as np
import jax
import jax.numpy as jnp

from fastgen_tpu.methods.base import convert_cfg_to_dict
from fastgen_tpu.methods.distribution_matching.dmd2 import DMD2Model


def chunk_schedule(num_frames: int, chunk_size: int):
    """[(start, end)] with the first chunk absorbing the remainder
    (ref ``causvid.py:120-128``)."""
    num_chunks = num_frames // chunk_size
    remaining = num_frames % chunk_size
    if num_chunks == 0:
        return [(0, remaining)]
    spans = [(0, chunk_size + remaining)]
    for i in range(1, num_chunks):
        start = chunk_size * i + remaining
        spans.append((start, start + chunk_size))
    return spans


class CausVidModel(DMD2Model):
    def _generate_noise_and_time(self, rng, real_data):
        """(noisy_real, t_inhom [B,T], t [B], eps) (ref ``causvid.py:23-65``)."""
        assert real_data.ndim == 5, "CausVid only works for video data [B,T,H,W,C]"
        batch_size, num_frames = real_data.shape[0], real_data.shape[1]
        ns = self.net.noise_scheduler
        chunk_size = self.net.chunk_size
        k_inhom, k_eps_i, k_t, k_eps = jax.random.split(rng, 4)

        eps_inhom = jax.random.normal(k_eps_i, (batch_size,) + self.input_shape,
                                      real_data.dtype)
        t_inhom, _ = ns.sample_t_inhom(
            k_inhom, batch_size, num_frames, chunk_size,
            sample_steps=self.config.student_sample_steps,
            t_list=self.config.sample_t_cfg.t_list)
        t_exp = t_inhom[:, :, None, None, None]
        noisy_real = ns.forward_process(real_data, eps_inhom, t_exp)

        t = ns.sample_t(k_t, batch_size, **convert_cfg_to_dict(self.config.sample_t_cfg))
        eps = jax.random.normal(k_eps, real_data.shape, real_data.dtype)
        return noisy_real, t_inhom, t, eps

    def gen_data_from_net(self, params, input_student, t_student, condition, rng):
        """Diffusion-forcing student forward: one parallel pass with the
        block-causal mask (teacher forcing; no rollout)."""
        return self.apply_net(params, "net", input_student, t_student,
                              condition=condition, fwd_pred_type="x0",
                              causal=True, train=True, rngs={"dropout": rng})

    # ------------------------------------------------------------ generation
    def _chunk_fns(self, net_key: str, width: int):
        """(denoise, store) jitted chunk forwards, cached on the model so
        repeated generator calls reuse the traced/compiled programs (a fresh
        jax.jit wrapper per call would re-trace the full 30-block graph every
        generation — ~5x wall clock at Wan-1.3B scale). One program per
        distinct chunk WIDTH: start_frame is traced, so all same-width chunks
        share the executable."""
        if not hasattr(self, "_chunk_fn_cache"):
            self._chunk_fn_cache = {}
        key = (net_key, width)
        if key not in self._chunk_fn_cache:
            net = self.nets[net_key]
            denoise = jax.jit(functools.partial(
                net.apply, method=net.forward_chunk, fwd_pred_type="x0",
                store_kv=False))
            # donate the cache so the updated cache aliases the old buffers
            # (a full-length cache is ~6 GB for Wan-1.3B@480p; without
            # donation both live across the store pass -> OOM)
            store = jax.jit(functools.partial(
                net.apply, method=net.forward_chunk, fwd_pred_type="x0",
                store_kv=True), donate_argnums=3)
            self._chunk_fn_cache[key] = (denoise, store)
        return self._chunk_fn_cache[key]

    def _student_sample_loop(self, params_net, x, t_list, rng, condition=None,
                            student_sample_type: str = "sde",
                            context_noise: float = 0.0, net_key: str = "net",
                            **kwargs):
        """Block-autoregressive few-step sampling with KV caches
        (ref ``causvid.py:87-185``). Chunk/step loops are static -> one XLA
        program; cache threading is functional."""
        net = self.nets[net_key]
        ns = net.noise_scheduler
        batch_size, num_frames = x.shape[0], x.shape[1]
        spans = chunk_schedule(num_frames, net.chunk_size)

        cache = net.init_cache(batch_size, dtype=x.dtype, max_frames=num_frames)
        cross_kv = net.apply(params_net, condition, method=net.precompute_cross_kv)
        get_fns = functools.partial(self._chunk_fns, net_key)

        out_chunks = []
        for (start, end) in spans:
            denoise, store = get_fns(end - start)
            start_t = jnp.asarray(start, jnp.int32)
            x_next = x[:, start:end]
            for step, (t_cur, t_next) in enumerate(zip(t_list[:-1], t_list[1:])):
                t_b = jnp.full((batch_size,), float(t_cur), jnp.float32)
                x_cur = x_next
                x_next, _ = denoise(params_net, x_cur, t_b, cache, start_t,
                                    condition=condition, cross_kv=cross_kv)
                if float(t_next) > 0:
                    tn_b = jnp.full((batch_size,), float(t_next), jnp.float32)
                    if student_sample_type == "sde":
                        rng, sub = jax.random.split(rng)
                        eps = jax.random.normal(sub, x_next.shape, x_next.dtype)
                    elif student_sample_type == "ode":
                        eps = ns.x0_to_eps(x_cur, x_next, t_b)
                    else:
                        raise NotImplementedError(student_sample_type)
                    x_next = ns.forward_process(x_next, eps, tn_b)
            out_chunks.append(x_next)

            # cache-store pass with the finalized block (ref ``causvid.py:160-180``)
            x_cache = x_next
            t_cache = jnp.zeros((batch_size,), jnp.float32)
            if context_noise > 0:
                rng, sub = jax.random.split(rng)
                t_cache = jnp.full((batch_size,), context_noise, jnp.float32)
                x_cache = ns.forward_process(
                    x_next, jax.random.normal(sub, x_next.shape, x_next.dtype), t_cache)
            _, cache = store(params_net, x_cache, t_cache, cache, start_t,
                             condition=condition, cross_kv=cross_kv)

        return jnp.concatenate(out_chunks, axis=1)

    def generator_fn(self, params_net, noise, rng=None, student_sample_steps: int = 1,
                     t_list=None, condition=None, student_sample_type: str = "sde",
                     context_noise: float = 0.0, net_key: str = "net", **kwargs):
        net = self.nets[net_key]
        ns = net.noise_scheduler
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if t_list is None:
            t_list = ns.get_t_list(student_sample_steps)
        else:
            t_list = np.asarray(t_list, np.float32)
        latents = ns.latents(noise, t_init=jnp.asarray(float(t_list[0]), jnp.float32))
        out = self._student_sample_loop(
            params_net, latents, t_list, rng, condition=condition,
            student_sample_type=student_sample_type, context_noise=context_noise,
            net_key=net_key)
        return out.astype(noise.dtype)
