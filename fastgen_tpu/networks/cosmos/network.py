"""Cosmos Predict2 video DiT in flax.linen
(ref ``fastgen/networks/cosmos_predict2/network.py`` — a from-scratch DiT with
a video2world conditioning path).

Shares the Wan-style block stack (3D RoPE self-attn + text cross-attn + AdaLN)
and adds Cosmos's video2world conditioning: a per-frame ``condition_mask``
channel is concatenated to the latents and ``conditioning_latents`` replace
the masked (context) frames — timesteps are zeroed on conditioned frames
(ref ``_compute_timestep_inputs`` / trainer video2world path,
``trainer.py:455-471``). Selective activation checkpointing maps to
``jax.checkpoint`` over the block stack (``remat_mode``: none | block_wise |
aggressive; ref ``modules.py:54-90`` SACConfig/CheckpointMode)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.wan.network import WanVideoDiT
from fastgen_tpu.ops.schedules import NET_PRED_TYPES


class CosmosPredict2(WanVideoDiT):
    """(ref ``cosmos_predict2/network.py:692``)."""

    # video2world: conditioning latents + mask channel appended to the input
    is_video2world: bool = True
    num_conditioning_frames: int = 1
    # 'none' | 'block_wise' | 'aggressive' (SACConfig equivalent)
    remat_mode: str = "none"
    net_pred_type: str = "flow"
    schedule_type: str = "rf"

    def setup(self):
        super().setup()
        # patch embedding consumes latents + conditioning latents + mask
        in_mult = 2 if self.is_video2world else 1
        self.cond_patch_embedding = (
            nn.Conv(self.dim, self.patch_size, strides=self.patch_size,
                    padding="VALID", name="cond_patch_embedding")
            if self.is_video2world else None)

    def _patchify_with_conditioning(self, x, conditioning_latents, condition_mask):
        tokens, grid = self._patchify(x)
        if self.cond_patch_embedding is not None:
            if conditioning_latents is None:
                conditioning_latents = jnp.zeros_like(x)
            if condition_mask is None:
                condition_mask = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
            cond_in = jnp.concatenate(
                [conditioning_latents,
                 jnp.broadcast_to(condition_mask, x.shape[:-1] + (1,))], axis=-1)
            cond_tokens = self.cond_patch_embedding(cond_in)
            b, f, hp, wp, d = cond_tokens.shape
            tokens = tokens + cond_tokens.reshape(b, f * hp * wp, d)
        return tokens, grid

    def __call__(self, x_t, t, condition=None, r=None,
                 return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (),
                 return_logvar: bool = False,
                 fwd_pred_type: Optional[str] = None,
                 skip_layers: Optional[Tuple[int, ...]] = None,
                 train: bool = False, **kwargs):
        if fwd_pred_type is not None:
            assert fwd_pred_type in NET_PRED_TYPES
        conditioning_latents = condition_mask = None
        if isinstance(condition, dict):
            conditioning_latents = condition.get("conditioning_latents")
            condition_mask = condition.get("condition_mask")
            text_embeds = condition.get("text_embeds")
        else:
            text_embeds = condition
        if text_embeds is None:
            text_embeds = jnp.zeros((x_t.shape[0], 1, self.text_dim), x_t.dtype)

        # conditioned (context) frames get t=0 (they are clean)
        if condition_mask is not None:
            frame_mask = condition_mask[:, :, 0, 0, 0]  # [B, T]
            if t.ndim == 1:
                t = jnp.repeat(t[:, None], x_t.shape[1], axis=1)
            t = t * (1.0 - frame_mask.astype(t.dtype))
            if conditioning_latents is not None:
                x_t = jnp.where(condition_mask.astype(bool),
                                conditioning_latents, x_t)

        x_in, t_in = x_t, t
        tokens, grid = self._patchify_with_conditioning(
            x_t, conditioning_latents, condition_mask)
        f, hp, wp = grid
        frame_seqlen = hp * wp
        from fastgen_tpu.networks.wan.network import _build_rope

        cos, sin = _build_rope(self._rope_tables, self._rope_splits, f, hp, wp)
        t_frames = self._per_frame_t(t, f)
        temb, timestep_proj = self._time_embeds(self.condition_embedder, t_frames)
        context = self._embed_text(text_embeds)

        def run_block(block, x):
            def fn(x_):
                out, _ = block(x_, timestep_proj, context, (cos, sin), frame_seqlen)
                return out
            if self.remat_mode in ("block_wise", "aggressive"):
                policy = (None if self.remat_mode == "aggressive" else
                          jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
                return jax.checkpoint(fn, policy=policy)(x)
            return fn(x)

        features = []
        x = tokens
        for idx, block in enumerate(self.blocks):
            if skip_layers is not None and idx in skip_layers:
                continue
            x = run_block(block, x)
            if idx in feature_indices:
                features.append(x.reshape(x.shape[0], f, hp, wp, self.dim))
            if return_features_early and len(features) == len(feature_indices):
                return features
        if return_features_early:
            return features

        shift, scale = [p_.squeeze(2) for p_ in jnp.split(
            self.out_scale_shift_table[:, None].astype(jnp.float32)
            + temb[:, :, None].astype(jnp.float32), 2, axis=2)]
        xn = self.norm_out(x.astype(jnp.float32)).reshape(
            x.shape[0], f, frame_seqlen, self.dim)
        xn = xn * (1 + scale[:, :, None]) + shift[:, :, None]
        x = xn.reshape(x.shape[0], f * frame_seqlen, self.dim).astype(x_t.dtype)
        x = self.proj_out(x)
        out = self._unpatchify(x, grid, x_t.shape[0])

        t_conv = t_in if t_in.ndim == 1 else t_in[:, :, None, None, None]
        out = self.noise_scheduler.convert_model_output(
            x_in, out, t_conv, src_pred_type=self.net_pred_type,
            target_pred_type=fwd_pred_type or self.net_pred_type)

        # conditioned frames pass through unchanged (preserve context)
        if condition_mask is not None and conditioning_latents is not None \
                and (fwd_pred_type or self.net_pred_type) == "x0":
            out = jnp.where(condition_mask.astype(bool), conditioning_latents, out)

        result = out if not feature_indices else [out, features]
        if return_logvar:
            assert self.logvar_linear is not None
            return result, self.logvar_linear(temb.mean(axis=1))
        return result

    def preserve_conditioning(self, x, condition):
        """Hook used by the generic student sample loop (ref ``model.py:343``)."""
        if isinstance(condition, dict) and condition.get("condition_mask") is not None \
                and condition.get("conditioning_latents") is not None:
            return jnp.where(condition["condition_mask"].astype(bool),
                             condition["conditioning_latents"], x)
        return x

    def sample(self, noise, condition=None, neg_condition=None,
               guidance_scale: Optional[float] = 5.0, num_steps: int = 50,
               shift: float = 5.0, solver: str = "euler",
               skip_layers: Optional[Tuple[int, ...]] = None,
               skip_layers_start_percent: float = 0.0, **kwargs):
        """Teacher sampler with CFG + SLG, text2world and video2world
        (ref ``cosmos_predict2/network.py:1093-1270``, FlowUniPC there —
        Euler flow stepping here; the reference's analytic-velocity
        replacement for conditioning frames is equivalent to pinning them via
        ``preserve_conditioning`` after every step, which is what we do).
        ``__call__`` already gives conditioning frames t=0 and swaps them
        into the input, so the loop only needs the per-step pin."""
        import numpy as np

        if solver == "dpm2m":
            # the generic multistep branch in WanVideoDiT.sample handles CFG,
            # SLG and per-step conditioning preservation
            from fastgen_tpu.networks.wan.network import WanVideoDiT

            return WanVideoDiT.sample(
                self, noise, condition=condition, neg_condition=neg_condition,
                guidance_scale=guidance_scale, num_steps=num_steps,
                shift=shift, solver="dpm2m", skip_layers=skip_layers,
                skip_layers_start_percent=skip_layers_start_percent, **kwargs)
        ns = self.noise_scheduler
        t_list = np.linspace(ns.max_t, 0.0, num_steps + 1)
        if shift and shift != 1.0:   # UniPC flow_shift grid (Cosmos default 5.0)
            t_list = shift * t_list / (1.0 + (shift - 1.0) * t_list)
        x = ns.latents(noise, t_init=jnp.asarray(float(t_list[0]), jnp.float32))
        x = self.preserve_conditioning(x, condition)
        use_cfg = guidance_scale is not None and guidance_scale > 1.0 and \
            neg_condition is not None
        b = x.shape[0]
        for idx, (t_cur, t_next) in enumerate(zip(t_list[:-1], t_list[1:])):
            tb = jnp.full((b,), t_cur, jnp.float32)
            v = self(x, tb, condition=condition, fwd_pred_type="flow")
            if use_cfg:
                slg = (skip_layers if skip_layers is not None
                       and idx >= skip_layers_start_percent * num_steps else None)
                v_neg = self(x, tb, condition=neg_condition,
                             fwd_pred_type="flow", skip_layers=slg)
                v = v_neg + guidance_scale * (v - v_neg)
            x = x - jnp.asarray(t_cur - t_next, x.dtype) * v
            x = self.preserve_conditioning(x, condition)
        return x
