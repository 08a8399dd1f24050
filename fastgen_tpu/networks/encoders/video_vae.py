"""Causal 3D video VAE (flax, Wan-style).

Behavioral counterpart of the reference's frozen video VAEs:
``WanVideoEncoder`` wrapping diffusers ``AutoencoderKLWan``
(``Wan/network.py:484-541``) and ``CogVideoXVideoEncoder``
(``CogVideoX/network.py:302-347``). Properties reproduced:

* **temporal causality** — every conv is left-padded in time, so latent frame
  i depends only on input frames <= its receptive field ending at i (this is
  what makes chunked AR decode possible);
* **frame-count algebra** — ``1 + 4k`` input frames -> ``1 + k`` latent
  frames (two causal stride-2 temporal downsamples, each ``2k+1 -> k+1``);
  8x spatial downsample; decode inverts both exactly;
* **argmax vs sample** encode modes (the reference encodes conditioning
  frames with ``mode="argmax"``, ``trainer.py:433``);
* **per-channel latent normalization** ``(z - mean) / std`` like
  ``AutoencoderKLWan.config.latents_mean/std``.

Layout: videos ``[B, T, H, W, C]``; latents ``[B, t, h, w, zc]``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class CausalConv3d(nn.Module):
    """Conv3d with causal (left-only) temporal padding."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    time_stride: int = 1
    space_stride: int = 1

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        # causal time pad (first-frame replicate, like Wan); for stride-2 the
        # kt-1 left pad keeps the 2k+1 -> k+1 frame algebra
        if kt > 1:
            x = jnp.pad(x, ((0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)),
                        mode="edge")
        return nn.Conv(self.features, self.kernel,
                       strides=(self.time_stride, self.space_stride, self.space_stride),
                       padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
                       name="conv")(x)


class VideoResBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.RMSNorm(epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = CausalConv3d(self.out_ch, name="conv1")(h)
        h = nn.RMSNorm(epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = CausalConv3d(self.out_ch, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = CausalConv3d(self.out_ch, (1, 1, 1), name="shortcut")(x)
        return x + h


class VideoVAEEncoder(nn.Module):
    base_ch: int = 96
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    latent_channels: int = 16
    layers_per_block: int = 2

    @nn.compact
    def __call__(self, x):
        x = CausalConv3d(self.base_ch, name="conv_in")(x)
        for lvl, m in enumerate(self.ch_mult):
            for j in range(self.layers_per_block):
                x = VideoResBlock(self.base_ch * m, name=f"down_{lvl}_block_{j}")(x)
            if lvl != len(self.ch_mult) - 1:
                ts = 2 if self.temporal_downsample[lvl] else 1
                x = CausalConv3d(x.shape[-1], (3, 3, 3), time_stride=ts,
                                 space_stride=2, name=f"down_{lvl}_downsample")(x)
        c = self.base_ch * self.ch_mult[-1]
        x = VideoResBlock(c, name="mid_block_0")(x)
        x = VideoResBlock(c, name="mid_block_1")(x)
        x = nn.RMSNorm(epsilon=1e-6, name="norm_out")(x)
        x = nn.silu(x)
        return CausalConv3d(2 * self.latent_channels, name="conv_out")(x)


class VideoVAEDecoder(nn.Module):
    base_ch: int = 96
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    latent_channels: int = 16
    out_channels: int = 3
    layers_per_block: int = 2

    @nn.compact
    def __call__(self, z):
        c = self.base_ch * self.ch_mult[-1]
        x = CausalConv3d(c, name="conv_in")(z)
        x = VideoResBlock(c, name="mid_block_0")(x)
        x = VideoResBlock(c, name="mid_block_1")(x)
        for lvl, m in enumerate(reversed(self.ch_mult)):
            for j in range(self.layers_per_block):
                x = VideoResBlock(self.base_ch * m, name=f"up_{lvl}_block_{j}")(x)
            if lvl != len(self.ch_mult) - 1:
                # spatial 2x always; temporal 2x inverts the encoder's schedule
                tdown = tuple(reversed(self.temporal_downsample))[lvl]
                b, t, hh, ww, cc = x.shape
                tt = 2 * t - 1 if tdown else t
                if tdown:
                    # k+1 -> 2k+1: duplicate every frame then drop the leading copy
                    x = jnp.repeat(x, 2, axis=1)[:, 1:]
                x = jax.image.resize(x, (b, tt, hh * 2, ww * 2, cc), "nearest")
                x = CausalConv3d(cc, name=f"up_{lvl}_upsample")(x)
        x = nn.RMSNorm(epsilon=1e-6, name="norm_out")(x)
        x = nn.silu(x)
        return CausalConv3d(self.out_channels, name="conv_out")(x)


class CausalVideoVAE(nn.Module):
    """Wan-family video VAE. Frame algebra: T=1+4k -> t=1+k; HxW -> H/8 x W/8.

    ``latents_mean``/``latents_std`` normalize per latent channel
    (``AutoencoderKLWan`` config); defaults are identity.
    """

    base_ch: int = 96
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    latent_channels: int = 16
    out_channels: int = 3
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None

    def setup(self):
        self.encoder = VideoVAEEncoder(self.base_ch, self.ch_mult,
                                       self.temporal_downsample,
                                       self.latent_channels)
        self.decoder = VideoVAEDecoder(self.base_ch, self.ch_mult,
                                       self.temporal_downsample,
                                       self.latent_channels, self.out_channels)

    def _norm(self, z, inverse=False):
        if self.latents_mean is None:
            return z
        mean = jnp.asarray(self.latents_mean, z.dtype)
        std = jnp.asarray(self.latents_std, z.dtype)
        return z * std + mean if inverse else (z - mean) / std

    def encode(self, x, rng: Optional[jax.Array] = None, mode: str = "sample"):
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if mode == "sample":
            if rng is None:
                raise ValueError("encode(mode='sample') needs an rng key")
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return self._norm(mean)

    def decode(self, z):
        return self.decoder(self._norm(z, inverse=True))

    def __call__(self, x, rng=None):
        return self.decode(self.encode(x, rng, mode="argmax"))
