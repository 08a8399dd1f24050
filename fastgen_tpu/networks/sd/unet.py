"""Stable Diffusion UNet2DCondition in flax.linen, NHWC
(ref ``fastgen/networks/SD15/network.py`` + ``SDXL/network.py``; the reference
wraps diffusers' UNet2DConditionModel and monkey-patches ``classify_forward``
for feature extraction — here the UNet is native).

Covers both layouts via config:
* SD 1.5:  blocks (CrossAttn 320, CrossAttn 640, CrossAttn 1280, Down 1280),
  transformer depth 1, context dim 768
* SDXL:    blocks (Down 320, CrossAttn 640 d2, CrossAttn 1280 d10),
  context dim 2048, additional pooled-text + time_ids embedding

Feature extraction (for the SD/SDXL discriminators): sample after each down
block and after the mid block (ref ``classify_forward``,
``SD15/network.py:218-286``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.network import FastGenNetwork
from fastgen_tpu.ops.attention import dot_product_attention
from fastgen_tpu.ops.schedules import NET_PRED_TYPES


def timestep_embedding(t, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True, downscale_freq_shift: float = 0.0):
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32)
                    / (half - downscale_freq_shift))
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


def _groups_for(ch: int, groups: int = 32) -> int:
    import math

    return math.gcd(groups, ch)


class ResnetBlock2D(nn.Module):
    out_channels: int
    emb_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, emb):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=_groups_for(in_ch, self.groups),
                         epsilon=1e-5, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv1")(h)
        temb = nn.Dense(self.out_channels, name="time_emb_proj")(nn.silu(emb))
        h = h + temb[:, None, None, :]
        h = nn.GroupNorm(num_groups=_groups_for(self.out_channels, self.groups),
                         epsilon=1e-5, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class CrossAttnBlock(nn.Module):
    """BasicTransformerBlock: self-attn, cross-attn, GEGLU FFN."""

    dim: int
    num_heads: int
    context_dim: int
    attn_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x, context):
        def mha(h, ctx, name):
            head_dim = self.dim // self.num_heads
            q = nn.Dense(self.dim, use_bias=False, name=f"{name}_q")(h)
            k = nn.Dense(self.dim, use_bias=False, name=f"{name}_k")(ctx)
            v = nn.Dense(self.dim, use_bias=False, name=f"{name}_v")(ctx)
            b, n, _ = q.shape
            l = k.shape[1]
            q = q.reshape(b, n, self.num_heads, head_dim)
            k = k.reshape(b, l, self.num_heads, head_dim)
            v = v.reshape(b, l, self.num_heads, head_dim)
            out = dot_product_attention(q, k, v, impl=self.attn_impl)
            return nn.Dense(self.dim, name=f"{name}_out")(out.reshape(b, n, self.dim))

        # eps 1e-5 / exact gelu: diffusers BasicTransformerBlock's LayerNorm
        # keeps the torch default eps and GEGLU uses exact (non-tanh) gelu —
        # pinned by the replica parity test (tests/test_converter_replicas.py)
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + mha(h, h, "attn1")
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = x + mha(h, context, "attn2")
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        gate = nn.Dense(self.dim * 8, name="ff_proj")(h)
        a, g = jnp.split(gate, 2, axis=-1)
        x = x + nn.Dense(self.dim, name="ff_out")(a * nn.gelu(g, approximate=False))
        return x


class SpatialTransformer(nn.Module):
    dim: int
    num_heads: int
    depth: int
    context_dim: int
    groups: int = 32
    attn_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(num_groups=_groups_for(c, self.groups), epsilon=1e-6,
                         name="norm")(x)
        x = nn.Conv(self.dim, (1, 1), name="proj_in")(x).reshape(b, h * w, self.dim)
        for i in range(self.depth):
            x = CrossAttnBlock(self.dim, self.num_heads, self.context_dim,
                               self.attn_impl, name=f"block_{i}")(x, context)
        x = nn.Conv(self.dim, (1, 1), name="proj_out")(x.reshape(b, h, w, self.dim))
        return x + res


class UNet2DCondition(nn.Module):
    """Configurable SD-style latent UNet."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    cross_attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    transformer_depths: Tuple[int, ...] = (1, 1, 1, 0)
    layers_per_block: int = 2
    attention_head_dim: int = 8        # SD15: heads = channels // 40 via head_dim=8?  heads below
    num_heads_per_channels: int = 64   # heads = channels // this (SDXL-style)
    fixed_num_heads: Optional[int] = 8  # SD15 uses 8 heads everywhere
    context_dim: int = 768
    addition_embed_dim: Optional[int] = None  # SDXL: 2816 projected input
    attn_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x, t, context, added_cond=None,
                 feature_indices: Tuple[int, ...] = (),
                 return_features_early: bool = False):
        c0 = self.block_out_channels[0]
        temb = timestep_embedding(t, c0)
        emb = nn.Dense(c0 * 4, name="time_embedding_1")(temb)
        emb = nn.Dense(c0 * 4, name="time_embedding_2")(nn.silu(emb))
        if self.addition_embed_dim is not None and added_cond is not None:
            add = nn.Dense(c0 * 4, name="add_embedding_1")(added_cond)
            add = nn.Dense(c0 * 4, name="add_embedding_2")(nn.silu(add))
            emb = emb + add

        def heads_for(ch):
            return self.fixed_num_heads or max(1, ch // self.num_heads_per_channels)

        sample = nn.Conv(c0, (3, 3), padding=((1, 1), (1, 1)), name="conv_in")(x)
        down_samples = [sample]
        features = []
        fidx = 0
        for bi, ch in enumerate(self.block_out_channels):
            for li in range(self.layers_per_block):
                sample = ResnetBlock2D(ch, c0 * 4, name=f"down_{bi}_res_{li}")(
                    sample, emb)
                if self.cross_attn_blocks[bi]:
                    sample = SpatialTransformer(
                        ch, heads_for(ch), self.transformer_depths[bi],
                        self.context_dim, attn_impl=self.attn_impl,
                        name=f"down_{bi}_attn_{li}")(sample, context)
                down_samples.append(sample)
            if bi < len(self.block_out_channels) - 1:
                sample = nn.Conv(ch, (3, 3), strides=(2, 2),
                                 padding=((1, 1), (1, 1)),
                                 name=f"down_{bi}_downsample")(sample)
                down_samples.append(sample)
            if fidx in feature_indices:
                features.append(sample)
            fidx += 1

        # mid
        mid_ch = self.block_out_channels[-1]
        sample = ResnetBlock2D(mid_ch, c0 * 4, name="mid_res_0")(sample, emb)
        sample = SpatialTransformer(mid_ch, heads_for(mid_ch),
                                    max(self.transformer_depths), self.context_dim,
                                    attn_impl=self.attn_impl,
                                    name="mid_attn")(sample, context)
        sample = ResnetBlock2D(mid_ch, c0 * 4, name="mid_res_1")(sample, emb)
        if fidx in feature_indices:
            features.append(sample)
        fidx += 1

        if return_features_early:
            assert len(features) == len(feature_indices)
            return features

        # up
        for bi, ch in enumerate(reversed(self.block_out_channels)):
            rbi = len(self.block_out_channels) - 1 - bi
            for li in range(self.layers_per_block + 1):
                skip = down_samples.pop()
                sample = jnp.concatenate([sample, skip], axis=-1)
                sample = ResnetBlock2D(ch, c0 * 4, name=f"up_{bi}_res_{li}")(
                    sample, emb)
                if self.cross_attn_blocks[rbi]:
                    sample = SpatialTransformer(
                        ch, heads_for(ch), self.transformer_depths[rbi],
                        self.context_dim, attn_impl=self.attn_impl,
                        name=f"up_{bi}_attn_{li}")(sample, context)
            if bi < len(self.block_out_channels) - 1:
                b_, h_, w_, c_ = sample.shape
                sample = jax.image.resize(sample, (b_, h_ * 2, w_ * 2, c_),
                                          method="nearest")
                sample = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                                 name=f"up_{bi}_upsample")(sample)

        sample = nn.GroupNorm(num_groups=_groups_for(sample.shape[-1]),
                              epsilon=1e-5, name="conv_norm_out")(sample)
        sample = nn.silu(sample)
        sample = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                         name="conv_out")(sample)
        return sample if not feature_indices else [sample, features]


class StableDiffusion15(FastGenNetwork):
    """SD 1.5 latent UNet (ref ``SD15/network.py:438``); eps-pred, sd schedule.

    Text/VAE encoders consume precomputed embeddings/latents (the latent WDS
    path); CLIP/VAE ports are gated behind the preprocessors API."""

    net_pred_type: str = "eps"
    schedule_type: str = "sd"
    in_channels: int = 4
    context_dim: int = 768
    attn_impl: Optional[str] = None
    img_resolution: int = 512
    # SD1.5 defaults; overridable for toy-size tests
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    transformer_depths: Tuple[int, ...] = (1, 1, 1, 0)
    fixed_num_heads: int = 8

    def setup(self):
        self.unet = UNet2DCondition(
            in_channels=self.in_channels, out_channels=self.in_channels,
            block_out_channels=tuple(self.block_out_channels),
            cross_attn_blocks=tuple(d > 0 for d in self.transformer_depths),
            transformer_depths=tuple(self.transformer_depths),
            fixed_num_heads=self.fixed_num_heads,
            context_dim=self.context_dim, attn_impl=self.attn_impl, name="unet")

    def _context(self, condition, batch, dtype):
        if isinstance(condition, dict):
            condition = condition.get("text_embeds")
        if condition is None:
            condition = jnp.zeros((batch, 77, self.context_dim), dtype)
        return condition

    def __call__(self, x_t, t, condition=None, r=None,
                 return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (),
                 return_logvar: bool = False,
                 fwd_pred_type: Optional[str] = None,
                 train: bool = False, **kwargs):
        if return_features_early and not feature_indices:
            return []
        if fwd_pred_type is not None:
            assert fwd_pred_type in NET_PRED_TYPES
        context = self._context(condition, x_t.shape[0], x_t.dtype)
        t_model = self.noise_scheduler.rescale_t(t)
        out = self.unet(x_t, t_model, context,
                        feature_indices=tuple(feature_indices),
                        return_features_early=return_features_early)
        if return_features_early:
            return out

        def _post(o):
            return self.convert_output(x_t, o, t, fwd_pred_type)

        if not feature_indices:
            return _post(out)
        return [_post(out[0]), out[1]]

    def sample(self, noise, condition=None, neg_condition=None,
               guidance_scale: Optional[float] = 7.5, num_steps: int = 50,
               solver: str = "euler", **kwargs):
        """DDIM sampling (the reference uses diffusers' DDIM for SD teachers);
        ``solver="dpm2m"`` switches to the second-order multistep."""
        if solver == "dpm2m":
            from fastgen_tpu.ops.solvers import net_dpm2m_sample

            return net_dpm2m_sample(self, noise, condition, neg_condition,
                                    guidance_scale, num_steps)
        ns = self.noise_scheduler
        t_list = np.linspace(ns.max_t, 0.0, num_steps + 1)
        x = ns.latents(noise, t_init=jnp.asarray(float(t_list[0]), jnp.float32))
        use_cfg = (guidance_scale is not None and guidance_scale > 1.0
                   and neg_condition is not None)
        b = x.shape[0]

        # lax.scan over the schedule: one compiled step, O(1) HLO in
        # num_steps (see EDMPrecond.sample)
        def step(x, pair):
            t_cur, t_next = pair[0], pair[1]
            tb = jnp.full((b,), t_cur, jnp.float32)
            x0 = self(x, tb, condition=condition, fwd_pred_type="x0")
            if use_cfg:
                x0_neg = self(x, tb, condition=neg_condition, fwd_pred_type="x0")
                x0 = x0_neg + guidance_scale * (x0 - x0_neg)
            eps = ns.x0_to_eps(x, x0, tb)
            x_fwd = ns.forward_process(x0, eps, jnp.full((b,), t_next, jnp.float32))
            # final step (t_next == 0) lands on the clean prediction
            return jnp.where(t_next > 0, x_fwd, x0), None

        t_arr = jnp.asarray(t_list, jnp.float32)
        pairs = jnp.stack([t_arr[:-1], t_arr[1:]], axis=1)
        x, _ = jax.lax.scan(step, x, pairs)
        return x


class StableDiffusionXL(StableDiffusion15):
    """SDXL base UNet (ref ``SDXL/network.py:159``); dual-CLIP context 2048 +
    pooled-text/time-ids additional embedding."""

    schedule_type: str = "sdxl"
    context_dim: int = 2048
    addition_embed_dim: int = 2816  # 1280 pooled + 6*256 time ids
    img_resolution: int = 1024

    def setup(self):
        self.unet = UNet2DCondition(
            in_channels=self.in_channels, out_channels=self.in_channels,
            block_out_channels=(320, 640, 1280),
            cross_attn_blocks=(False, True, True),
            transformer_depths=(0, 2, 10), fixed_num_heads=None,
            num_heads_per_channels=64,
            context_dim=self.context_dim,
            addition_embed_dim=self.addition_embed_dim,
            attn_impl=self.attn_impl, name="unet")

    def __call__(self, x_t, t, condition=None, r=None,
                 return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (),
                 return_logvar: bool = False,
                 fwd_pred_type: Optional[str] = None,
                 train: bool = False, **kwargs):
        if return_features_early and not feature_indices:
            return []
        if fwd_pred_type is not None:
            assert fwd_pred_type in NET_PRED_TYPES
        batch = x_t.shape[0]
        added = None
        if isinstance(condition, dict):
            added = condition.get("added_cond")
        if added is None:
            added = jnp.zeros((batch, self.addition_embed_dim), x_t.dtype)
        context = self._context(condition, batch, x_t.dtype)
        t_model = self.noise_scheduler.rescale_t(t)
        out = self.unet(x_t, t_model, context, added_cond=added,
                        feature_indices=tuple(feature_indices),
                        return_features_early=return_features_early)
        if return_features_early:
            return out

        def _post(o):
            return self.convert_output(x_t, o, t, fwd_pred_type)

        if not feature_indices:
            return _post(out)
        return [_post(out[0]), out[1]]
