"""Checkpoint-compatible CogVideoX video VAE (flax, ``AutoencoderKLCogVideoX``).

The reference wraps diffusers ``AutoencoderKLCogVideoX`` as its frozen video
encoder/decoder (``CogVideoXVideoEncoder``, ref
``fastgen/networks/CogVideoX/network.py:302-347``). This module reproduces
that network exactly — layer structure, parameter layout (via
``utils/torch_convert.convert_cogvideox_vae``), and the chunked conv-cache
forward semantics — so real ``THUDM/CogVideoX-*`` VAE weights load and
produce matching latents/pixels. It is the CogVideoX counterpart of
``wan_vae.py`` (which closed the same gap for Wan in round 4); the
lightweight behavioral ``video_vae.CausalVideoVAE`` remains for raw-pixel
smoke configs.

Architecture notes (diffusers ``autoencoder_kl_cogvideox.py``) — this VAE is
a *different* design from Wan's:

* **CogVideoXCausalConv3d** — temporal left pad is ``kt-1`` REPLICATED first
  frames (not zeros); in chunked mode the pad is the trailing ``kt-1``
  frames of the previous chunk's (padded) input. Spatial pad is symmetric
  zeros. No temporally-strided convs anywhere.
* **GroupNorm everywhere** (32 groups, eps 1e-6) — *including the time
  axis* in its statistics, so chunked and full-sequence execution are not
  bit-identical (true of diffusers too); parity is defined per chunk
  schedule.
* **CogVideoXSpatialNorm3D** (decoder only) — ``GroupNorm(f) * conv_y(zq) +
  conv_b(zq)`` where ``zq`` is the decoder's latent input chunk
  nearest-resized to ``f``'s shape; an odd-length ``f`` resizes frame 0 and
  the rest separately (the causal first-frame rule).
* **Temporal scaling is pooling, not convs** — downsample: keep frame 0,
  avg-pool the rest by 2 (odd length) / straight avg-pool (even);
  upsample: keep frame 0, nearest-double the rest (odd) / double all
  (even). Spatial down: pad right/bottom + stride-2 conv; up: nearest x2 +
  3x3 conv. ``temporal_compression_ratio=4`` -> the first
  ``log2(4) = 2`` levels compress/expand time.
* **No attention, no quant/post-quant convs** (``use_quant_conv=False``).
* **Frame algebra** — ``1+4k`` pixel frames <-> ``1+k`` latent frames, 8x
  spatial. Encode consumes pixel chunks of ``[8+T%8, 8, 8, ...]`` frames;
  decode consumes latent chunks of ``[2+t%2, 2, 2, ...]`` frames
  (diffusers ``num_sample_frames_batch_size=8`` /
  ``num_latent_frames_batch_size=2``, remainder folded into chunk 0).

Layout here: channels-last ``[B, T, H, W, C]`` (TPU-native); the converter
transposes torch ``[O, I, kt, kh, kw]`` -> ``[kt, kh, kw, I, O]``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class _CacheCtx:
    """Functional counterpart of the torch ``conv_cache`` dict: reads the
    previous chunk's cache, collects the next one. Slots are assigned in
    module traversal order (identical every chunk), so converted checkpoints
    replay chunk streams exactly like diffusers' name-keyed nested dicts."""

    def __init__(self, prev: Optional[Dict[str, Any]]):
        self.prev = prev  # None = first chunk (replicate-first-frame pad)
        self.new: Dict[str, Any] = {}
        self.idx = 0

    def slot(self) -> str:
        key = str(self.idx)
        self.idx += 1
        return key

    def get(self, key: str):
        return None if self.prev is None else self.prev.get(key)


class CogCausalConv3d(nn.Module):
    """diffusers ``CogVideoXCausalConv3d``: temporal left pad = ``kt-1``
    replicated first frames (or the previous chunk's trailing frames),
    symmetric spatial zero padding. Returns ``(y, cache)`` where cache is
    the padded input's trailing ``kt-1`` frames (torch keeps exactly
    ``inputs[:, :, -kt+1:]`` post-concat)."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)

    @nn.compact
    def __call__(self, x, cache: Optional[jax.Array] = None):
        kt, kh, kw = self.kernel
        if kt > 1:
            if cache is not None:
                pad = cache.astype(x.dtype)
            else:
                pad = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([pad, x], axis=1)
        new_cache = x[:, x.shape[1] - (kt - 1):] if kt > 1 else None
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kt, kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1, 1, 1),
            padding=[(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + bias.astype(x.dtype), new_cache


def _ccached(conv: CogCausalConv3d, x, ctx: _CacheCtx):
    """Run a causal conv through the cache context (one slot per conv,
    traversal order)."""
    key = ctx.slot()
    y, new = conv(x, ctx.get(key))
    if new is not None:
        ctx.new[key] = new
    return y


class SpatialConv(nn.Module):
    """Per-frame 2D conv stored as a ``(1, kh, kw)`` 3D kernel (torch
    ``nn.Conv2d`` applied frame-wise in the down/upsamplers)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    pad: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1,) + tuple(self.stride),
            padding=[(0, 0), (self.pad[0], self.pad[0]),
                     (self.pad[1], self.pad[1])],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + bias.astype(x.dtype)


def _nearest_resize(x, size: Tuple[int, int, int]):
    """Integer-factor nearest upsampling [B,t,h,w,C] -> [B,T,H,W,C] (torch
    ``F.interpolate(mode='nearest')``; all VAE resizes are integer factors,
    where torch's floor(i*in/out) == plain repeat)."""
    t, h, w = x.shape[1:4]
    T, H, W = size
    assert T % t == 0 and H % h == 0 and W % w == 0, (x.shape, size)
    if T != t:
        x = jnp.repeat(x, T // t, axis=1)
    if H != h:
        x = jnp.repeat(x, H // h, axis=2)
    if W != w:
        x = jnp.repeat(x, W // w, axis=3)
    return x


class CogSpatialNorm3D(nn.Module):
    """diffusers ``CogVideoXSpatialNorm3D``: f-GroupNorm modulated by
    pointwise convs of the (resized) latent chunk ``zq``."""

    f_channels: int
    groups: int = 32

    def setup(self):
        self.norm_layer = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                                       dtype=jnp.float32)
        self.conv_y = CogCausalConv3d(self.f_channels, (1, 1, 1))
        self.conv_b = CogCausalConv3d(self.f_channels, (1, 1, 1))

    def __call__(self, f, zq):
        if f.shape[1] > 1 and f.shape[1] % 2 == 1:
            z_first, z_rest = zq[:, :1], zq[:, 1:]
            z_first = _nearest_resize(z_first, (1,) + f.shape[2:4])
            z_rest = _nearest_resize(z_rest,
                                     (f.shape[1] - 1,) + f.shape[2:4])
            zq = jnp.concatenate([z_first, z_rest], axis=1)
        else:
            zq = _nearest_resize(zq, f.shape[1:4])
        # kernel-1 convs carry no cache
        conv_y, _ = self.conv_y(zq)
        conv_b, _ = self.conv_b(zq)
        norm_f = self.norm_layer(f.astype(jnp.float32)).astype(f.dtype)
        return norm_f * conv_y + conv_b


class CogResnetBlock3D(nn.Module):
    """diffusers ``CogVideoXResnetBlock3D`` at VAE settings (no temb, plain
    pointwise shortcut)."""

    in_dim: int
    out_dim: int
    spatial_norm: bool = False  # decoder resnets modulate on zq
    groups: int = 32

    def setup(self):
        if self.spatial_norm:
            self.norm1 = CogSpatialNorm3D(self.in_dim, self.groups)
            self.norm2 = CogSpatialNorm3D(self.out_dim, self.groups)
        else:
            self.norm1 = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                                      dtype=jnp.float32)
            self.norm2 = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                                      dtype=jnp.float32)
        self.conv1 = CogCausalConv3d(self.out_dim)
        self.conv2 = CogCausalConv3d(self.out_dim)
        if self.in_dim != self.out_dim:
            # CogVideoXSafeConv3d 1x1x1, not causal: a pointwise Dense
            self.conv_shortcut = nn.Dense(self.out_dim)

    def _norm(self, norm, x, zq):
        if self.spatial_norm:
            return norm(x, zq)
        return norm(x.astype(jnp.float32)).astype(x.dtype)

    def __call__(self, x, zq, ctx: _CacheCtx):
        h = self._norm(self.norm1, x, zq)
        h = _ccached(self.conv1, nn.silu(h), ctx)
        h = self._norm(self.norm2, h, zq)
        h = _ccached(self.conv2, nn.silu(h), ctx)
        if self.in_dim != self.out_dim:
            x = self.conv_shortcut(x)
        return x + h


class CogDownsample3D(nn.Module):
    """diffusers ``CogVideoXDownsample3D``: optional causal temporal
    avg-pool (frame 0 preserved on odd lengths), then right/bottom-padded
    stride-2 spatial conv."""

    features: int
    compress_time: bool = False

    def setup(self):
        self.conv = SpatialConv(self.features, (3, 3), stride=(2, 2))

    def __call__(self, x):
        if self.compress_time:
            b, t, h, w, c = x.shape
            if t > 1 and t % 2 == 1:
                first, rest = x[:, :1], x[:, 1:]
                rest = rest.reshape(b, (t - 1) // 2, 2, h, w, c).mean(axis=2)
                x = jnp.concatenate([first, rest], axis=1)
            elif t > 1:
                x = x.reshape(b, t // 2, 2, h, w, c).mean(axis=2)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        return self.conv(x)


class CogUpsample3D(nn.Module):
    """diffusers ``CogVideoXUpsample3D``: optional causal temporal doubling
    (frame 0 stays single on odd lengths), nearest x2 spatial, 3x3 conv."""

    features: int
    compress_time: bool = False

    def setup(self):
        self.conv = SpatialConv(self.features, (3, 3), pad=(1, 1))

    def __call__(self, x):
        t = x.shape[1]
        if self.compress_time:
            if t > 1 and t % 2 == 1:
                first, rest = x[:, :1], x[:, 1:]
                first = jnp.repeat(jnp.repeat(first, 2, axis=2), 2, axis=3)
                rest = jnp.repeat(
                    jnp.repeat(jnp.repeat(rest, 2, axis=1), 2, axis=2),
                    2, axis=3)
                x = jnp.concatenate([first, rest], axis=1)
            elif t > 1:
                x = jnp.repeat(
                    jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2),
                    2, axis=3)
            else:
                x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return self.conv(x)


class CogMidBlock3D(nn.Module):
    dim: int
    num_layers: int = 2
    spatial_norm: bool = False
    groups: int = 32

    def setup(self):
        self.resnets = [
            CogResnetBlock3D(self.dim, self.dim, self.spatial_norm,
                             self.groups, name=f"resnets_{j}")
            for j in range(self.num_layers)]

    def __call__(self, x, zq, ctx: _CacheCtx):
        for resnet in self.resnets:
            x = resnet(x, zq, ctx)
        return x


class CogDownBlock3D(nn.Module):
    in_dim: int
    out_dim: int
    num_layers: int = 3
    add_downsample: bool = True
    compress_time: bool = False
    groups: int = 32

    def setup(self):
        dims = [self.in_dim] + [self.out_dim] * self.num_layers
        self.resnets = [
            CogResnetBlock3D(dims[j], self.out_dim, False, self.groups,
                             name=f"resnets_{j}")
            for j in range(self.num_layers)]
        if self.add_downsample:
            self.downsamplers_0 = CogDownsample3D(self.out_dim,
                                                  self.compress_time)

    def __call__(self, x, ctx: _CacheCtx):
        for resnet in self.resnets:
            x = resnet(x, None, ctx)
        if self.add_downsample:
            x = self.downsamplers_0(x)
        return x


class CogUpBlock3D(nn.Module):
    in_dim: int
    out_dim: int
    num_layers: int = 4  # layers_per_block + 1
    add_upsample: bool = True
    compress_time: bool = False
    groups: int = 32

    def setup(self):
        dims = [self.in_dim] + [self.out_dim] * self.num_layers
        self.resnets = [
            CogResnetBlock3D(dims[j], self.out_dim, True, self.groups,
                             name=f"resnets_{j}")
            for j in range(self.num_layers)]
        if self.add_upsample:
            self.upsamplers_0 = CogUpsample3D(self.out_dim,
                                              self.compress_time)

    def __call__(self, x, zq, ctx: _CacheCtx):
        for resnet in self.resnets:
            x = resnet(x, zq, ctx)
        if self.add_upsample:
            x = self.upsamplers_0(x)
        return x


class CogEncoder3D(nn.Module):
    """diffusers ``CogVideoXEncoder3D``."""

    block_out_channels: Sequence[int] = (128, 256, 256, 512)
    layers_per_block: int = 3
    z_dim: int = 16
    temporal_compress_level: int = 2  # log2(temporal_compression_ratio)
    groups: int = 32
    in_channels: int = 3

    def setup(self):
        chans = tuple(self.block_out_channels)
        self.conv_in = CogCausalConv3d(chans[0])
        blocks: List[Any] = []
        in_dim = chans[0]
        for i, out_dim in enumerate(chans):
            is_final = i == len(chans) - 1
            blocks.append(CogDownBlock3D(
                in_dim, out_dim, self.layers_per_block,
                add_downsample=not is_final,
                compress_time=i < self.temporal_compress_level,
                groups=self.groups, name=f"down_blocks_{i}"))
            in_dim = out_dim
        self.down_blocks = blocks
        self.mid_block = CogMidBlock3D(chans[-1], 2, False, self.groups)
        self.norm_out = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                                     dtype=jnp.float32)
        self.conv_out = CogCausalConv3d(2 * self.z_dim)

    def __call__(self, x, ctx: _CacheCtx):
        x = _ccached(self.conv_in, x, ctx)
        for block in self.down_blocks:
            x = block(x, ctx)
        x = self.mid_block(x, None, ctx)
        x = nn.silu(self.norm_out(x.astype(jnp.float32)).astype(x.dtype))
        return _ccached(self.conv_out, x, ctx)


class CogDecoder3D(nn.Module):
    """diffusers ``CogVideoXDecoder3D`` (spatial-norm modulation on zq)."""

    block_out_channels: Sequence[int] = (128, 256, 256, 512)
    layers_per_block: int = 3
    z_dim: int = 16
    temporal_compress_level: int = 2
    groups: int = 32
    out_channels: int = 3

    def setup(self):
        rev = tuple(reversed(tuple(self.block_out_channels)))
        self.conv_in = CogCausalConv3d(rev[0])
        self.mid_block = CogMidBlock3D(rev[0], 2, True, self.groups)
        blocks: List[Any] = []
        in_dim = rev[0]
        for i, out_dim in enumerate(rev):
            is_final = i == len(rev) - 1
            blocks.append(CogUpBlock3D(
                in_dim, out_dim, self.layers_per_block + 1,
                add_upsample=not is_final,
                compress_time=i < self.temporal_compress_level,
                groups=self.groups, name=f"up_blocks_{i}"))
            in_dim = out_dim
        self.up_blocks = blocks
        self.norm_out = CogSpatialNorm3D(rev[-1], self.groups)
        self.conv_out = CogCausalConv3d(self.out_channels)

    def __call__(self, z, ctx: _CacheCtx):
        x = _ccached(self.conv_in, z, ctx)
        x = self.mid_block(x, z, ctx)
        for block in self.up_blocks:
            x = block(x, z, ctx)
        x = nn.silu(self.norm_out(x, z))
        return _ccached(self.conv_out, x, ctx)


class AutoencoderKLCogVideoX(nn.Module):
    """diffusers ``AutoencoderKLCogVideoX`` in flax; chunked encode/decode
    drivers live on :class:`CogVideoXVAE` (host loop over jitted per-chunk
    steps). No quant/post-quant convs (``use_quant_conv=False``)."""

    block_out_channels: Sequence[int] = (128, 256, 256, 512)
    layers_per_block: int = 3
    z_dim: int = 16
    temporal_compress_level: int = 2
    groups: int = 32
    scaling_factor: float = 1.15258426  # CogVideoX-2b vae config.json

    def setup(self):
        self.encoder = CogEncoder3D(
            self.block_out_channels, self.layers_per_block, self.z_dim,
            self.temporal_compress_level, self.groups)
        self.decoder = CogDecoder3D(
            self.block_out_channels, self.layers_per_block, self.z_dim,
            self.temporal_compress_level, self.groups)

    def encode_chunk(self, x, cache: Optional[Dict[str, Any]]):
        """One pixel chunk ([B, 8+T%8, ...] first, [B, 8, ...] after) ->
        moments chunk [B, t, h, w, 2z] + next conv cache."""
        ctx = _CacheCtx(cache)
        moments = self.encoder(x, ctx)
        return moments, ctx.new

    def decode_chunk(self, z, cache: Optional[Dict[str, Any]]):
        """One latent chunk ([B, 2+t%2, ...] first, [B, 2, ...] after) ->
        pixel chunk + next conv cache (unclamped, like diffusers)."""
        ctx = _CacheCtx(cache)
        out = self.decoder(z, ctx)
        return out, ctx.new

    def __call__(self, x):
        """Init-only: one chunk through both paths creates every param."""
        moments, _ = self.encode_chunk(x[:, :1], None)
        mean = jnp.split(moments, 2, axis=-1)[0]
        out, _ = self.decode_chunk(mean, None)
        return out


def _chunk_slices(total: int, batch: int) -> List[Tuple[int, int]]:
    """diffusers' frame-batch schedule: ``max(total//batch, 1)`` chunks,
    remainder folded into chunk 0 (``autoencoder_kl_cogvideox.py
    _encode/_decode`` start/end frame math)."""
    num = max(total // batch, 1)
    rem = total % batch
    out = []
    for i in range(num):
        start = batch * i + (0 if i == 0 else rem)
        end = min(batch * (i + 1) + rem, total)
        out.append((start, end))
    return out


class CogVideoXVAE:
    """Frozen CogVideoX video VAE with the reference's encode/decode
    contract (``CogVideoXVideoEncoder``, ref ``CogVideoX/network.py:
    302-347``): ``encode = sample(moments) * scaling_factor``,
    ``decode = decoder(z / scaling_factor)``. Videos [B,T,H,W,C] <->
    latents [B,t,h,w,z] with T = 1+4k, t = 1+k.

    ``params`` usually comes from ``torch_convert.convert_checkpoint(path,
    "cogvideox_vae")``; random init (for tests) via ``params=None``.
    """

    # diffusers chunking constants
    SAMPLE_FRAMES_BATCH = 8   # num_sample_frames_batch_size
    LATENT_FRAMES_BATCH = 2   # num_latent_frames_batch_size

    def __init__(self, params=None, dtype=jnp.float32, seed: int = 0,
                 checkpoint_path: Optional[str] = None, **module_kw):
        self.module = AutoencoderKLCogVideoX(**module_kw)
        self.dtype = dtype
        if checkpoint_path and params is None:
            from fastgen_tpu.utils import torch_convert

            params = torch_convert.convert_checkpoint(
                checkpoint_path, "cogvideox_vae")["params"]
        if params is None:
            params = self.module.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 1, 16, 16, 3), dtype))["params"]
        self.params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), params)
        self._enc = jax.jit(lambda p, x, c: self.module.apply(
            {"params": p}, x, c, method=self.module.encode_chunk))
        self._dec = jax.jit(lambda p, z, c: self.module.apply(
            {"params": p}, z, c, method=self.module.decode_chunk))

    # -------------------------------------------------------------- encode
    def encode(self, x, rng=None, mode: str = "sample", precision=None):
        """[B, 1+4k, H, W, C] in [-1,1] -> scaled latents [B, 1+k, ...]."""
        x = jnp.asarray(x, self.dtype)
        t = x.shape[1]
        assert t == 1 or (t - 1) % 4 == 0, \
            f"CogVideoX VAE needs 1+4k frames, got {t}"
        outs, cache = [], None
        for start, end in _chunk_slices(t, self.SAMPLE_FRAMES_BATCH):
            moments, cache = self._enc(self.params, x[:, start:end], cache)
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
        z = mean * self.module.scaling_factor
        return z.astype(precision or self.dtype)

    # -------------------------------------------------------------- decode
    def decode(self, z, precision=None):
        """scaled latents [B, 1+k, ...] -> video [B, 1+4k, H, W, C]."""
        z = jnp.asarray(z, self.dtype) / self.module.scaling_factor
        outs, cache = [], None
        for start, end in _chunk_slices(z.shape[1], self.LATENT_FRAMES_BATCH):
            out, cache = self._dec(self.params, z[:, start:end], cache)
            outs.append(out)
        video = jnp.concatenate(outs, axis=1)
        return video.astype(precision or self.dtype)
