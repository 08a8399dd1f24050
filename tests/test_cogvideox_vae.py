"""CogVideoX video VAE: torch-replica forward parity + converter layout.

The reference uses diffusers ``AutoencoderKLCogVideoX`` as its frozen video
VAE (``CogVideoXVideoEncoder``, ref
``fastgen/networks/CogVideoX/network.py:302-347``). diffusers is not
installed in this image, so — like ``test_wan_vae.py`` does for Wan — we
re-implement the torch module here with the exact diffusers state-dict
layout and chunked conv-cache semantics, convert its weights with
``convert_cogvideox_vae``, and assert the flax forward matches.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fastgen_tpu.networks.encoders.cogvideox_vae import (
    AutoencoderKLCogVideoX, CogVideoXVAE, _chunk_slices)
from fastgen_tpu.utils.torch_convert import (convert_cogvideox_vae,
                                             verify_against_template)


# --------------------------------------------------------------------------
# torch replica (diffusers models/autoencoders/autoencoder_kl_cogvideox.py)
# --------------------------------------------------------------------------
class TCausalConv3d(nn.Module):
    """CogVideoXCausalConv3d: temporal left pad = kt-1 REPLICATED first
    frames (or the previous chunk's trailing frames); spatial zero pad."""

    def __init__(self, in_ch, out_ch, kernel_size):
        super().__init__()
        k = ((kernel_size,) * 3 if isinstance(kernel_size, int)
             else tuple(kernel_size))
        self.time_kernel_size = k[0]
        self.height_pad = k[1] // 2
        self.width_pad = k[2] // 2
        self.conv = nn.Conv3d(in_ch, out_ch, k)

    def forward(self, x, conv_cache=None):
        kt = self.time_kernel_size
        if kt > 1:
            if conv_cache is not None:
                x = torch.cat([conv_cache, x], dim=2)
            else:
                x = torch.cat([x[:, :, :1]] * (kt - 1) + [x], dim=2)
        new_cache = x[:, :, -kt + 1:].clone() if kt > 1 else None
        x = F.pad(x, (self.width_pad, self.width_pad,
                      self.height_pad, self.height_pad))
        return self.conv(x), new_cache


class TSpatialNorm3D(nn.Module):
    def __init__(self, f_ch, zq_ch, groups):
        super().__init__()
        self.norm_layer = nn.GroupNorm(groups, f_ch, eps=1e-6, affine=True)
        self.conv_y = TCausalConv3d(zq_ch, f_ch, 1)
        self.conv_b = TCausalConv3d(zq_ch, f_ch, 1)

    def forward(self, f, zq):
        if f.shape[2] > 1 and f.shape[2] % 2 == 1:
            z_first, z_rest = zq[:, :, :1], zq[:, :, 1:]
            z_first = F.interpolate(z_first, size=(1,) + f.shape[-2:])
            z_rest = F.interpolate(z_rest,
                                   size=(f.shape[2] - 1,) + f.shape[-2:])
            zq = torch.cat([z_first, z_rest], dim=2)
        else:
            zq = F.interpolate(zq, size=f.shape[-3:])
        conv_y, _ = self.conv_y(zq)
        conv_b, _ = self.conv_b(zq)
        return self.norm_layer(f) * conv_y + conv_b


class TResnet3D(nn.Module):
    """CogVideoXResnetBlock3D at VAE settings (temb_channels=0,
    conv_shortcut=False -> pointwise SafeConv3d shortcut)."""

    def __init__(self, in_ch, out_ch, groups, spatial_norm_dim=None):
        super().__init__()
        self.in_ch, self.out_ch = in_ch, out_ch
        if spatial_norm_dim is None:
            self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-6)
            self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-6)
        else:
            self.norm1 = TSpatialNorm3D(in_ch, spatial_norm_dim, groups)
            self.norm2 = TSpatialNorm3D(out_ch, spatial_norm_dim, groups)
        self.conv1 = TCausalConv3d(in_ch, out_ch, 3)
        self.conv2 = TCausalConv3d(out_ch, out_ch, 3)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv3d(in_ch, out_ch, 1)

    def forward(self, x, zq, conv_cache=None):
        conv_cache = conv_cache or {}
        new_cache = {}
        h = self.norm1(x, zq) if zq is not None else self.norm1(x)
        h, new_cache["conv1"] = self.conv1(F.silu(h),
                                           conv_cache.get("conv1"))
        h = self.norm2(h, zq) if zq is not None else self.norm2(h)
        h, new_cache["conv2"] = self.conv2(F.silu(h),
                                           conv_cache.get("conv2"))
        if self.in_ch != self.out_ch:
            x = self.conv_shortcut(x)
        return x + h, new_cache


class TDownsample3D(nn.Module):
    def __init__(self, ch, compress_time):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)
        self.compress_time = compress_time

    def forward(self, x):
        if self.compress_time:
            b, c, t, h, w = x.shape
            if t > 1 and t % 2 == 1:
                first, rest = x[:, :, :1], x[:, :, 1:]
                rest = F.avg_pool3d(rest, (2, 1, 1), stride=(2, 1, 1))
                x = torch.cat([first, rest], dim=2)
            elif t > 1:
                x = F.avg_pool3d(x, (2, 1, 1), stride=(2, 1, 1))
        x = F.pad(x, (0, 1, 0, 1))
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.conv(x)
        return x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)


class TUpsample3D(nn.Module):
    def __init__(self, ch, compress_time):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)
        self.compress_time = compress_time

    def forward(self, x):
        if self.compress_time:
            if x.shape[2] > 1 and x.shape[2] % 2 == 1:
                first, rest = x[:, :, 0], x[:, :, 1:]
                first = F.interpolate(first, scale_factor=2)
                rest = F.interpolate(rest, scale_factor=2)
                x = torch.cat([first[:, :, None], rest], dim=2)
            elif x.shape[2] > 1:
                x = F.interpolate(x, scale_factor=2)
            else:
                x = F.interpolate(x.squeeze(2), scale_factor=2)[:, :, None]
        else:
            b, c, t, h, w = x.shape
            x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
            x = F.interpolate(x, scale_factor=2)
            x = x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.conv(x)
        return x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)


class TDownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_down, compress):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TResnet3D(in_ch if j == 0 else out_ch, out_ch, groups)
             for j in range(layers)])
        self.downsamplers = (nn.ModuleList([TDownsample3D(out_ch, compress)])
                             if add_down else None)

    def forward(self, x, conv_cache=None):
        conv_cache = conv_cache or {}
        new_cache = {}
        for j, r in enumerate(self.resnets):
            x, new_cache[f"resnets.{j}"] = r(x, None,
                                             conv_cache.get(f"resnets.{j}"))
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x, new_cache


class TUpBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, zq_ch, add_up,
                 compress):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TResnet3D(in_ch if j == 0 else out_ch, out_ch, groups,
                       spatial_norm_dim=zq_ch) for j in range(layers)])
        self.upsamplers = (nn.ModuleList([TUpsample3D(out_ch, compress)])
                           if add_up else None)

    def forward(self, x, zq, conv_cache=None):
        conv_cache = conv_cache or {}
        new_cache = {}
        for j, r in enumerate(self.resnets):
            x, new_cache[f"resnets.{j}"] = r(x, zq,
                                             conv_cache.get(f"resnets.{j}"))
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x, new_cache


class TMidBlock(nn.Module):
    def __init__(self, ch, groups, zq_ch=None):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TResnet3D(ch, ch, groups, spatial_norm_dim=zq_ch)
             for _ in range(2)])

    def forward(self, x, zq, conv_cache=None):
        conv_cache = conv_cache or {}
        new_cache = {}
        for j, r in enumerate(self.resnets):
            x, new_cache[f"resnets.{j}"] = r(x, zq,
                                             conv_cache.get(f"resnets.{j}"))
        return x, new_cache


class TEncoder(nn.Module):
    def __init__(self, chans, layers, z, groups, t_level):
        super().__init__()
        self.conv_in = TCausalConv3d(3, chans[0], 3)
        blocks = []
        in_ch = chans[0]
        for i, out_ch in enumerate(chans):
            blocks.append(TDownBlock(in_ch, out_ch, layers, groups,
                                     add_down=i < len(chans) - 1,
                                     compress=i < t_level))
            in_ch = out_ch
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = TMidBlock(chans[-1], groups)
        self.norm_out = nn.GroupNorm(groups, chans[-1], eps=1e-6)
        self.conv_out = TCausalConv3d(chans[-1], 2 * z, 3)

    def forward(self, x, conv_cache=None):
        conv_cache = conv_cache or {}
        new_cache = {}
        x, new_cache["conv_in"] = self.conv_in(x, conv_cache.get("conv_in"))
        for i, block in enumerate(self.down_blocks):
            x, new_cache[f"down.{i}"] = block(x, conv_cache.get(f"down.{i}"))
        x, new_cache["mid"] = self.mid_block(x, None, conv_cache.get("mid"))
        x = F.silu(self.norm_out(x))
        x, new_cache["conv_out"] = self.conv_out(x,
                                                 conv_cache.get("conv_out"))
        return x, new_cache


class TDecoder(nn.Module):
    def __init__(self, chans, layers, z, groups, t_level):
        super().__init__()
        rev = list(reversed(chans))
        self.conv_in = TCausalConv3d(z, rev[0], 3)
        self.mid_block = TMidBlock(rev[0], groups, zq_ch=z)
        blocks = []
        in_ch = rev[0]
        for i, out_ch in enumerate(rev):
            blocks.append(TUpBlock(in_ch, out_ch, layers + 1, groups, z,
                                   add_up=i < len(rev) - 1,
                                   compress=i < t_level))
            in_ch = out_ch
        self.up_blocks = nn.ModuleList(blocks)
        self.norm_out = TSpatialNorm3D(rev[-1], z, groups)
        self.conv_out = TCausalConv3d(rev[-1], 3, 3)

    def forward(self, z, conv_cache=None):
        conv_cache = conv_cache or {}
        new_cache = {}
        x, new_cache["conv_in"] = self.conv_in(z, conv_cache.get("conv_in"))
        x, new_cache["mid"] = self.mid_block(x, z, conv_cache.get("mid"))
        for i, block in enumerate(self.up_blocks):
            x, new_cache[f"up.{i}"] = block(x, z, conv_cache.get(f"up.{i}"))
        x = F.silu(self.norm_out(x, z))
        x, new_cache["conv_out"] = self.conv_out(x,
                                                 conv_cache.get("conv_out"))
        return x, new_cache


class TAutoencoderKLCogVideoX(nn.Module):
    """diffusers AutoencoderKLCogVideoX with its chunked drivers
    (num_sample_frames_batch_size=8, num_latent_frames_batch_size=2,
    remainder folded into chunk 0; no quant convs)."""

    def __init__(self, chans=(128, 256, 256, 512), layers=3, z=16,
                 groups=32, t_level=2):
        super().__init__()
        self.encoder = TEncoder(chans, layers, z, groups, t_level)
        self.decoder = TDecoder(chans, layers, z, groups, t_level)

    def encode(self, x):
        out, cache = [], None
        for s, e in _chunk_slices(x.shape[2], 8):
            o, cache = self.encoder(x[:, :, s:e], cache)
            out.append(o)
        moments = torch.cat(out, dim=2)
        return moments.chunk(2, dim=1)[0]  # mean (mode="argmax")

    def decode(self, z):
        out, cache = [], None
        for s, e in _chunk_slices(z.shape[2], 2):
            o, cache = self.decoder(z[:, :, s:e], cache)
            out.append(o)
        return torch.cat(out, dim=2)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------
TOY_T = dict(chans=(8, 16, 16, 32), layers=1, z=4, groups=4, t_level=2)
TOY_F = dict(block_out_channels=(8, 16, 16, 32), layers_per_block=1,
             z_dim=4, groups=4, temporal_compress_level=2)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tm = TAutoencoderKLCogVideoX(**TOY_T).eval()
    variables = convert_cogvideox_vae(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    fm = CogVideoXVAE(params=variables["params"], dtype=jnp.float32, **TOY_F)
    return tm, fm


def test_chunk_schedule_matches_diffusers():
    # remainder folds into chunk 0 (diffusers start/end frame math)
    assert _chunk_slices(49, 8) == [(0, 9), (9, 17), (17, 25), (25, 33),
                                    (33, 41), (41, 49)]
    assert _chunk_slices(13, 2) == [(0, 3), (3, 5), (5, 7), (7, 9), (9, 11),
                                    (11, 13)]
    assert _chunk_slices(1, 8) == [(0, 1)]
    assert _chunk_slices(8, 8) == [(0, 8)]


def test_converter_consumes_and_covers(pair):
    tm, fm = pair
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_cogvideox_vae(sd)
    template = AutoencoderKLCogVideoX(**TOY_F).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 16, 16, 3), jnp.float32))
    matched, missing = verify_against_template(variables["params"],
                                               template["params"])
    assert missing == 0, f"{missing} params missing from converted tree"
    n_t = sum(v.size for v in sd.values())
    n_f = sum(int(np.prod(l.shape))
              for l in jax.tree_util.tree_leaves(variables))
    assert n_t == n_f, f"param count mismatch {n_t} vs {n_f}"


@torch.no_grad()
def test_encode_parity(pair):
    tm, fm = pair
    x = np.random.RandomState(1).randn(1, 17, 16, 16, 3).astype(np.float32)
    zt = tm.encode(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    # scaling_factor is applied by the wrapper (ref CogVideoXVideoEncoder
    # multiplies by vae.config.scaling_factor); undo it for raw parity
    zf = np.asarray(fm.encode(jnp.asarray(x), mode="argmax"))
    zf = zf / fm.module.scaling_factor
    zt = zt.permute(0, 2, 3, 4, 1).numpy()
    assert zt.shape == zf.shape == (1, 5, 2, 2, 4)
    np.testing.assert_allclose(zf, zt, atol=2e-5, rtol=1e-4)


@torch.no_grad()
def test_decode_parity(pair):
    tm, fm = pair
    z = 0.3 * np.random.RandomState(2).randn(1, 5, 2, 2, 4).astype(np.float32)
    yt = tm.decode(torch.from_numpy(z).permute(0, 4, 1, 2, 3))
    yf = fm.decode(jnp.asarray(z) * fm.module.scaling_factor)
    yt = yt.permute(0, 2, 3, 4, 1).numpy()
    assert yt.shape == yf.shape == (1, 17, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(yf), yt, atol=2e-5, rtol=1e-4)


@torch.no_grad()
def test_single_frame_image(pair):
    """T=1 (image) round-trips through both paths (the causal first-frame
    rules collapse to plain 2D behavior)."""
    tm, fm = pair
    x = np.random.RandomState(4).randn(1, 1, 16, 16, 3).astype(np.float32)
    zt = tm.encode(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    zf = np.asarray(fm.encode(jnp.asarray(x), mode="argmax"))
    np.testing.assert_allclose(zf / fm.module.scaling_factor,
                               zt.permute(0, 2, 3, 4, 1).numpy(),
                               atol=2e-5, rtol=1e-4)
    y = fm.decode(zf)
    assert y.shape == (1, 1, 16, 16, 3)


@torch.no_grad()
def test_chunk_causality(pair):
    """Chunked encode is causal at chunk granularity: mutating pixel frames
    in chunk 1 leaves chunk 0's latents (frames 0..2) unchanged."""
    tm, fm = pair
    x = np.random.RandomState(3).randn(1, 17, 16, 16, 3).astype(np.float32)
    z_full = np.asarray(fm.encode(jnp.asarray(x), mode="argmax"))
    x2 = x.copy()
    x2[:, 9:] = 7.7  # chunk 1 is frames 9..16 -> latents 3..4
    z_trunc = np.asarray(fm.encode(jnp.asarray(x2), mode="argmax"))
    np.testing.assert_allclose(z_trunc[:, :3], z_full[:, :3], atol=1e-5)
    assert np.abs(z_trunc[:, 3:] - z_full[:, 3:]).max() > 1e-3


def test_videovae_wrapper_cogvideox_layout():
    """``VideoVAEWrapper(layout="cogvideox")`` routes through the
    checkpoint-compatible VAE (same contract the behavioral wrapper has)."""
    from fastgen_tpu.networks.encoders.wrappers import VideoVAEWrapper

    vae = VideoVAEWrapper(layout="cogvideox", dtype="float32", **TOY_F)
    assert isinstance(vae.module, AutoencoderKLCogVideoX)
    # 1+4k round-trips when the first decode chunk is odd (>=3 latents,
    # i.e. k>=2 — true of real 49-frame/13-latent CogVideoX videos)
    x = jnp.zeros((1, 9, 16, 16, 3), jnp.float32)
    z = vae.encode(x, mode="argmax")
    assert z.shape == (1, 3, 2, 2, 4)
    y = vae.decode(z)
    assert y.shape == (1, 9, 16, 16, 3)


@pytest.mark.slow
def test_cogvideox_real_size_layout():
    """The real CogVideoX config (128/256/256/512, 3 layers, z=16, 32
    groups) converts with zero dropped keys and zero missing flax params."""
    torch.manual_seed(0)
    tm = TAutoencoderKLCogVideoX()  # defaults = CogVideoX-2b vae config
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_cogvideox_vae(sd)
    template = jax.eval_shape(
        lambda: AutoencoderKLCogVideoX().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32, 3),
                                             jnp.float32)))
    matched, missing = verify_against_template(variables["params"],
                                               template["params"])
    assert missing == 0
    n_t = sum(v.size for v in sd.values())
    n_f = sum(int(np.prod(l.shape))
              for l in jax.tree_util.tree_leaves(variables))
    assert n_t == n_f
