"""Checkpoint-compatible Wan 2.1 video VAE (flax, ``AutoencoderKLWan`` layout).

The reference wraps diffusers ``AutoencoderKLWan`` as a frozen encoder/decoder
(``WanVideoEncoder``, ref ``fastgen/networks/Wan/network.py:484-541``;
CogVideoX uses the same causal-VAE contract at ``CogVideoX/network.py:302-347``).
This module reproduces that network exactly — layer structure, parameter
layout (via ``utils/torch_convert.convert_wan_vae``), and the chunked
feat-cache forward semantics — so real ``Wan-AI/Wan2.1-*-Diffusers`` VAE
weights load and produce matching latents/pixels. The repo's
``video_vae.CausalVideoVAE`` remains as the lightweight *behavioral* VAE for
raw-pixel smoke configs; this is the weight-compatible one.

Architecture notes (diffusers ``autoencoder_kl_wan.py``):

* **WanCausalConv3d** — Conv3d whose temporal padding is ``2*pad_t`` ZEROS on
  the left (not symmetric, not replicate). In chunked mode the left pad is
  replaced by up to ``CACHE_T=2`` cached trailing frames of the previous
  chunk, which makes per-chunk processing bit-identical to full-sequence.
* **WanRMS_norm** — ``x / max(||x||_2(ch), 1e-12) * sqrt(C) * gamma``
  (torch ``F.normalize`` over the channel dim).
* **Encoder** — conv_in, flat ``down_blocks`` = [2×res]·4 levels with a
  Resample between levels (spatial: pad-right/bottom-1 + stride-2 conv;
  temporal for ``temperal_downsample[i]``: stride-2 kernel-3 causal conv whose
  first chunk passes through unconvolved), mid (res, attn, res), norm, conv_out
  → ``2*z_dim`` moments; pointwise ``quant_conv``.
* **Decoder** — ``post_quant_conv``; conv_in, mid, ``up_blocks`` of
  ``num_res_blocks+1`` resnets + upsampler (spatial: nearest×2 + conv dim→dim/2;
  temporal: causal conv dim→2·dim then channel-pair → frame-pair interleave;
  the FIRST chunk skips the temporal conv entirely — the "Rep" rule), norm,
  conv_out → RGB, clamped to [-1, 1].
* **Frame algebra** — ``1+4k`` pixel frames ↔ ``1+k`` latent frames, 8×
  spatial. Encode consumes chunks of [1, 4, 4, ...] frames; decode emits
  chunks of [1, 4, 4, ...] frames from one latent frame each.

Layout here: channels-last ``[B, T, H, W, C]`` (TPU-native); the converter
transposes torch ``[O, I, kt, kh, kw]`` → ``[kt, kh, kw, I, O]``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

CACHE_T = 2  # trailing input frames cached per causal conv (diffusers CACHE_T)

# Wan 2.1 VAE per-channel latent statistics (``AutoencoderKLWan`` config.json;
# the reference normalizes latents with these, ``Wan/network.py:509-520``)
WAN21_LATENTS_MEAN = (
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921)
WAN21_LATENTS_STD = (
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160)


class WanCausalConv3d(nn.Module):
    """Causal 3D conv: ``2*pad_t`` zero frames on the temporal left (or the
    cached trailing frames of the previous chunk), symmetric H/W padding."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    pad: Tuple[int, int, int] = (1, 1, 1)  # torch ``padding=`` (pt, ph, pw)

    @nn.compact
    def __call__(self, x, cache: Optional[jax.Array] = None):
        kt, kh, kw = self.kernel
        pt, ph, pw = self.pad
        tpad = 2 * pt
        if cache is not None:
            x = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
            tpad -= cache.shape[1]
        if tpad > 0:
            x = jnp.pad(x, ((0, 0), (tpad, 0), (0, 0), (0, 0), (0, 0)))
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kt, kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=self.stride,
            padding=[(0, 0), (ph, ph), (pw, pw)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + bias.astype(x.dtype)


class WanRMSNorm(nn.Module):
    """torch ``F.normalize(x, dim=ch) * sqrt(C) * gamma`` (WanRMS_norm)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        h = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(h * h, axis=-1, keepdims=True))
        h = h / jnp.maximum(norm, 1e-12) * jnp.sqrt(float(c)) * gamma
        return h.astype(x.dtype)


def _cache_entry(x, prev: Optional[jax.Array], zero_fill: bool = False):
    """Next feat-cache value for a conv input ``x``: its trailing CACHE_T
    frames, left-filled from the previous cache (or zeros for the decoder's
    post-"Rep" upsampler) when the chunk is shorter than CACHE_T."""
    cx = x[:, -CACHE_T:]
    if cx.shape[1] < CACHE_T:
        if prev is not None:
            cx = jnp.concatenate([prev[:, -1:].astype(cx.dtype), cx], axis=1)
        elif zero_fill:
            cx = jnp.concatenate([jnp.zeros_like(cx), cx], axis=1)
    return cx


class _CacheCtx:
    """Functional counterpart of the torch ``feat_cache``/``feat_idx`` pair:
    reads the previous chunk's cache dict, collects the next one. Index
    assignment follows module traversal order exactly like the torch
    ``feat_idx[0] += 1`` counter, so converted checkpoints replay chunk
    streams identically."""

    def __init__(self, prev: Optional[Dict[str, Any]]):
        self.prev = prev  # None = first chunk (every conv fully zero-padded)
        self.new: Dict[str, Any] = {}
        self.idx = 0

    def slot(self) -> str:
        key = str(self.idx)
        self.idx += 1
        return key

    def get(self, key: str):
        return None if self.prev is None else self.prev.get(key)


def _cached(conv: WanCausalConv3d, x, ctx: _CacheCtx):
    key = ctx.slot()
    prev = ctx.get(key)
    ctx.new[key] = _cache_entry(x, prev)
    return conv(x, prev)


class WanResidualBlock(nn.Module):
    in_dim: int
    out_dim: int

    def setup(self):
        self.norm1 = WanRMSNorm()
        self.conv1 = WanCausalConv3d(self.out_dim)
        self.norm2 = WanRMSNorm()
        self.conv2 = WanCausalConv3d(self.out_dim)
        if self.in_dim != self.out_dim:
            self.conv_shortcut = WanCausalConv3d(
                self.out_dim, (1, 1, 1), pad=(0, 0, 0))

    def __call__(self, x, ctx: _CacheCtx):
        h = self.conv_shortcut(x) if self.in_dim != self.out_dim else x
        x = nn.silu(self.norm1(x))
        x = _cached(self.conv1, x, ctx)
        x = nn.silu(self.norm2(x))
        x = _cached(self.conv2, x, ctx)
        return x + h


class WanAttentionBlock(nn.Module):
    """Single-frame spatial self-attention (mid block)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        identity = x
        y = WanRMSNorm(name="norm")(x).reshape(b * t, h * w, c)
        qkv = nn.Dense(3 * c, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32)
            / jnp.sqrt(float(c)), axis=-1).astype(x.dtype)
        y = jnp.einsum("bqk,bkc->bqc", attn, v)
        y = nn.Dense(c, name="proj")(y).reshape(b, t, h, w, c)
        return y + identity


class WanMidBlock(nn.Module):
    dim: int

    def setup(self):
        self.resnets_0 = WanResidualBlock(self.dim, self.dim)
        self.attentions_0 = WanAttentionBlock(self.dim)
        self.resnets_1 = WanResidualBlock(self.dim, self.dim)

    def __call__(self, x, ctx: _CacheCtx):
        x = self.resnets_0(x, ctx)
        x = self.attentions_0(x)
        return self.resnets_1(x, ctx)


class WanResample(nn.Module):
    """Spatial (+ optional temporal) resampling between levels.

    * ``downsample2d``: zero-pad right/bottom by 1, stride-2 3×3 conv (C→C).
    * ``downsample3d``: same spatially, then a stride-2 kernel-3 causal time
      conv; the FIRST chunk bypasses the time conv (its frame becomes latent
      frame 0 untouched) and seeds the cache.
    * ``upsample2d``: nearest ×2, 3×3 conv C→C/2.
    * ``upsample3d``: causal time conv C→2C whose channel pairs interleave
      into doubled frames; the FIRST chunk skips it entirely (the "Rep" rule)
      and the second chunk runs it fully-zero-padded.
    """

    dim: int
    mode: str

    def setup(self):
        if self.mode in ("upsample2d", "upsample3d"):
            self.resample_1 = WanCausalConv3d(
                self.dim // 2, (1, 3, 3), pad=(0, 1, 1))
        elif self.mode in ("downsample2d", "downsample3d"):
            # asymmetric right/bottom zero-pad applied in __call__
            self.resample_1 = WanCausalConv3d(
                self.dim, (1, 3, 3), stride=(1, 2, 2), pad=(0, 0, 0))
        if self.mode == "upsample3d":
            self.time_conv = WanCausalConv3d(
                self.dim * 2, (3, 1, 1), pad=(1, 0, 0))
        if self.mode == "downsample3d":
            self.time_conv = WanCausalConv3d(
                self.dim, (3, 1, 1), stride=(2, 1, 1), pad=(0, 0, 0))

    def __call__(self, x, ctx: _CacheCtx):
        b, t, h, w, c = x.shape
        if self.mode == "upsample3d":
            key = ctx.slot()
            first = ctx.prev is None  # torch: feat_cache[idx] = "Rep"
            if not first:
                prev = ctx.get(key)  # None right after "Rep" (second chunk)
                ctx.new[key] = _cache_entry(x, prev, zero_fill=prev is None)
                y = self.time_conv(x, prev)
                # channel pairs -> adjacent frames: [B,T,H,W,2C] ->
                # frame 2i = first C channels, frame 2i+1 = second C
                y = y.reshape(b, t, h, w, 2, c)
                y = jnp.moveaxis(y, 4, 2).reshape(b, t * 2, h, w, c)
                x, t = y, t * 2
        if self.mode in ("upsample2d", "upsample3d"):
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
            x = self.resample_1(x)
        elif self.mode in ("downsample2d", "downsample3d"):
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
            x = self.resample_1(x)
        if self.mode == "downsample3d":
            key = ctx.slot()
            if ctx.prev is None:
                ctx.new[key] = x  # first chunk: passthrough, seed cache
            else:
                prev = ctx.get(key)
                ctx.new[key] = x[:, -1:]
                x = self.time_conv(
                    jnp.concatenate([prev[:, -1:].astype(x.dtype), x], axis=1))
        return x


class WanEncoder3d(nn.Module):
    dim: int = 96
    z_dim: int = 32  # 2 * latent channels (mean ‖ logvar)
    dim_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temperal_downsample: Sequence[bool] = (False, True, True)

    def setup(self):
        dims = [self.dim * u for u in (1,) + tuple(self.dim_mult)]
        self.conv_in = WanCausalConv3d(dims[0])
        blocks: List[Any] = []
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(self.num_res_blocks):
                blocks.append(WanResidualBlock(
                    in_dim, out_dim, name=f"down_blocks_{len(blocks)}"))
                in_dim = out_dim
            if i != len(self.dim_mult) - 1:
                mode = ("downsample3d" if self.temperal_downsample[i]
                        else "downsample2d")
                blocks.append(WanResample(
                    out_dim, mode, name=f"down_blocks_{len(blocks)}"))
        self.blocks = blocks
        self.mid_block = WanMidBlock(dims[-1])
        self.norm_out = WanRMSNorm()
        self.conv_out = WanCausalConv3d(self.z_dim)

    def __call__(self, x, ctx: _CacheCtx):
        x = _cached(self.conv_in, x, ctx)
        for block in self.blocks:
            x = block(x, ctx)
        x = self.mid_block(x, ctx)
        x = nn.silu(self.norm_out(x))
        return _cached(self.conv_out, x, ctx)


class WanUpBlock(nn.Module):
    in_dim: int
    out_dim: int
    num_resnets: int
    upsample_mode: Optional[str] = None

    def setup(self):
        dims = [self.in_dim] + [self.out_dim] * self.num_resnets
        self.resnets = [
            WanResidualBlock(dims[j], self.out_dim, name=f"resnets_{j}")
            for j in range(self.num_resnets)]
        if self.upsample_mode is not None:
            self.upsamplers_0 = WanResample(self.out_dim, self.upsample_mode)

    def __call__(self, x, ctx: _CacheCtx):
        for resnet in self.resnets:
            x = resnet(x, ctx)
        if self.upsample_mode is not None:
            x = self.upsamplers_0(x, ctx)
        return x


class WanDecoder3d(nn.Module):
    dim: int = 96
    z_dim: int = 16
    dim_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temperal_upsample: Sequence[bool] = (True, True, False)
    out_channels: int = 3

    def setup(self):
        dims = [self.dim * u
                for u in (self.dim_mult[-1],) + tuple(self.dim_mult[::-1])]
        self.conv_in = WanCausalConv3d(dims[0])
        self.mid_block = WanMidBlock(dims[0])
        ups = []
        current = dims[0]
        for i, out_dim in enumerate(dims[1:]):
            mode = None
            if i != len(self.dim_mult) - 1:
                mode = ("upsample3d" if self.temperal_upsample[i]
                        else "upsample2d")
            ups.append(WanUpBlock(current, out_dim, self.num_res_blocks + 1,
                                  mode, name=f"up_blocks_{i}"))
            # the upsampler's spatial conv halves channels (diffusers
            # decoder: ``in_dim = in_dim // 2`` for every level after the
            # first)
            current = out_dim // 2 if mode is not None else out_dim
        self.ups = ups
        self.norm_out = WanRMSNorm()
        self.conv_out = WanCausalConv3d(self.out_channels)

    def __call__(self, x, ctx: _CacheCtx):
        x = _cached(self.conv_in, x, ctx)
        x = self.mid_block(x, ctx)
        for up in self.ups:
            x = up(x, ctx)
        x = nn.silu(self.norm_out(x))
        return _cached(self.conv_out, x, ctx)


class AutoencoderKLWan(nn.Module):
    """diffusers ``AutoencoderKLWan`` in flax; chunked encode/decode drivers
    live on :class:`WanVAE` (host loop over jitted per-chunk steps)."""

    base_dim: int = 96
    z_dim: int = 16
    dim_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temperal_downsample: Sequence[bool] = (False, True, True)
    latents_mean: Optional[Sequence[float]] = WAN21_LATENTS_MEAN
    latents_std: Optional[Sequence[float]] = WAN21_LATENTS_STD

    def setup(self):
        self.encoder = WanEncoder3d(
            self.base_dim, self.z_dim * 2, self.dim_mult,
            self.num_res_blocks, self.temperal_downsample)
        self.quant_conv = WanCausalConv3d(
            self.z_dim * 2, (1, 1, 1), pad=(0, 0, 0))
        self.post_quant_conv = WanCausalConv3d(
            self.z_dim, (1, 1, 1), pad=(0, 0, 0))
        self.decoder = WanDecoder3d(
            self.base_dim, self.z_dim, self.dim_mult, self.num_res_blocks,
            tuple(self.temperal_downsample)[::-1])

    def encode_chunk(self, x, cache: Optional[Dict[str, Any]]):
        """One pixel chunk ([B,1,...] first, [B,4,...] after) -> moments
        chunk + next cache. quant_conv is pointwise, so per-chunk == full."""
        ctx = _CacheCtx(cache)
        moments = self.quant_conv(self.encoder(x, ctx))
        return moments, ctx.new

    def decode_chunk(self, z, cache: Optional[Dict[str, Any]]):
        """One latent frame -> 1 (first) or 4 pixel frames + next cache."""
        ctx = _CacheCtx(cache)
        out = self.decoder(self.post_quant_conv(z), ctx)
        return jnp.clip(out, -1.0, 1.0), ctx.new

    def __call__(self, x):
        """Init-only: trace TWO chunks of both paths so every parameter is
        created (the first chunk bypasses the temporal up/down convs)."""
        m0, c = self.encode_chunk(x[:, :1], None)
        m1, _ = self.encode_chunk(x[:, 1:5], c)
        mean = jnp.split(jnp.concatenate([m0, m1], axis=1), 2, axis=-1)[0]
        d0, dc = self.decode_chunk(mean[:, :1], None)
        d1, _ = self.decode_chunk(mean[:, 1:2], dc)
        return jnp.concatenate([d0, d1], axis=1)


class WanVAE:
    """Frozen Wan video VAE with the reference's encode/decode contract
    (``WanVideoEncoder``, ref ``Wan/network.py:484-541``): latent
    normalization ``(z - mean) / std``, ``sample``/``argmax`` encode modes,
    decode clamped to [-1, 1]. Videos [B,T,H,W,C] ↔ latents [B,t,h,w,z].

    ``params`` usually comes from ``torch_convert.convert_checkpoint(path,
    "wan_vae")``; random init (for tests) via ``params=None``.
    """

    def __init__(self, params=None, dtype=jnp.float32, seed: int = 0,
                 checkpoint_path: Optional[str] = None, **module_kw):
        self.module = AutoencoderKLWan(**module_kw)
        self.dtype = dtype
        if checkpoint_path and params is None:
            from fastgen_tpu.utils import torch_convert

            params = torch_convert.convert_checkpoint(
                checkpoint_path, "wan_vae")["params"]
        if params is None:
            params = self.module.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 5, 32, 32, 3), dtype))["params"]
        self.params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), params)
        self._enc = jax.jit(lambda p, x, c: self.module.apply(
            {"params": p}, x, c, method=self.module.encode_chunk))
        self._dec = jax.jit(lambda p, z, c: self.module.apply(
            {"params": p}, z, c, method=self.module.decode_chunk))

    # ------------------------------------------------------------- helpers
    def _norm(self, z, inverse=False):
        if self.module.latents_mean is None:
            return z
        mean = jnp.asarray(self.module.latents_mean, z.dtype)
        std = jnp.asarray(self.module.latents_std, z.dtype)
        return z * std + mean if inverse else (z - mean) / std

    # -------------------------------------------------------------- encode
    def encode(self, x, rng=None, mode: str = "sample", precision=None):
        """[B, 1+4k, H, W, C] in [-1,1] -> normalized latents [B,1+k,...]."""
        x = jnp.asarray(x, self.dtype)
        t = x.shape[1]
        assert (t - 1) % 4 == 0, f"Wan VAE needs 1+4k frames, got {t}"
        outs, cache = [], None
        for i in range(1 + (t - 1) // 4):
            chunk = x[:, :1] if i == 0 else x[:, 1 + 4 * (i - 1):1 + 4 * i]
            moments, cache = self._enc(self.params, chunk, cache)
            outs.append(moments)
        moments = jnp.concatenate(outs, axis=1)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if mode == "sample":
            if rng is None:
                raise ValueError("encode(mode='sample') needs an rng key")
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        elif mode != "argmax":
            raise ValueError(f"Invalid mode: {mode}")
        z = self._norm(mean)
        return z.astype(precision or self.dtype)

    # -------------------------------------------------------------- decode
    def decode(self, z, precision=None):
        """normalized latents [B,1+k,...] -> video [B,1+4k,H,W,C] in [-1,1]."""
        z = self._norm(jnp.asarray(z, self.dtype), inverse=True)
        outs, cache = [], None
        for i in range(z.shape[1]):
            out, cache = self._dec(self.params, z[:, i:i + 1], cache)
            outs.append(out)
        video = jnp.concatenate(outs, axis=1)
        return video.astype(precision or self.dtype)
