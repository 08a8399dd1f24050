"""Wan 2.1 video VAE: torch-replica forward parity + converter layout.

The reference uses diffusers ``AutoencoderKLWan`` as its frozen video VAE
(``WanVideoEncoder``, ref ``fastgen/networks/Wan/network.py:484-541``).
diffusers is not installed in this image, so — like
``test_converter_replicas.py`` does for the DiTs — we re-implement the torch
module here with the exact diffusers state-dict layout and chunked
feat-cache semantics, convert its weights with ``convert_wan_vae``, and
assert the flax forward matches the torch forward.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fastgen_tpu.networks.encoders.wan_vae import AutoencoderKLWan, WanVAE
from fastgen_tpu.utils.torch_convert import (convert_wan_vae,
                                             verify_against_template)

CACHE_T = 2


# --------------------------------------------------------------------------
# torch replica (diffusers models/autoencoders/autoencoder_kl_wan.py layout)
# --------------------------------------------------------------------------
class TCausalConv3d(nn.Conv3d):
    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0):
        super().__init__(in_ch, out_ch, kernel_size, stride=stride,
                         padding=padding)
        self._pad = (self.padding[2], self.padding[2], self.padding[1],
                     self.padding[1], 2 * self.padding[0], 0)
        self.padding = (0, 0, 0)

    def forward(self, x, cache_x=None):
        padding = list(self._pad)
        if cache_x is not None and self._pad[4] > 0:
            x = torch.cat([cache_x, x], dim=2)
            padding[4] -= cache_x.shape[2]
        return super().forward(F.pad(x, padding))


class TRMSNorm(nn.Module):
    def __init__(self, dim, images=True):
        super().__init__()
        broadcastable = (1, 1, 1) if not images else (1, 1)
        self.gamma = nn.Parameter(torch.ones(dim, *broadcastable))
        self.scale = dim ** 0.5

    def forward(self, x):
        return F.normalize(x, dim=1) * self.scale * self.gamma


class TResBlock(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.norm1 = TRMSNorm(in_dim, images=False)
        self.conv1 = TCausalConv3d(in_dim, out_dim, 3, padding=1)
        self.norm2 = TRMSNorm(out_dim, images=False)
        self.conv2 = TCausalConv3d(out_dim, out_dim, 3, padding=1)
        self.conv_shortcut = (TCausalConv3d(in_dim, out_dim, 1)
                              if in_dim != out_dim else nn.Identity())

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        h = self.conv_shortcut(x)
        x = F.silu(self.norm1(x))
        for conv in (self.conv1, None, self.conv2):
            if conv is None:
                x = F.silu(self.norm2(x))
                continue
            if feat_cache is not None:
                idx = feat_idx[0]
                cache_x = x[:, :, -CACHE_T:].clone()
                if cache_x.shape[2] < 2 and feat_cache[idx] is not None:
                    cache_x = torch.cat(
                        [feat_cache[idx][:, :, -1:], cache_x], dim=2)
                x = conv(x, feat_cache[idx])
                feat_cache[idx] = cache_x
                feat_idx[0] += 1
            else:
                x = conv(x)
        return x + h


class TAttnBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = TRMSNorm(dim)
        self.to_qkv = nn.Conv2d(dim, dim * 3, 1)
        self.proj = nn.Conv2d(dim, dim, 1)

    def forward(self, x):
        identity = x
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.norm(x)
        qkv = self.to_qkv(x)
        q, k, v = (qkv.reshape(b * t, 1, c * 3, -1)
                   .permute(0, 1, 3, 2).contiguous().chunk(3, dim=-1))
        x = F.scaled_dot_product_attention(q, k, v)
        x = x.squeeze(1).permute(0, 2, 1).reshape(b * t, c, h, w)
        x = self.proj(x)
        return x.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4) + identity


class TMidBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.resnets = nn.ModuleList([TResBlock(dim, dim), TResBlock(dim, dim)])
        self.attentions = nn.ModuleList([TAttnBlock(dim)])

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        x = self.resnets[0](x, feat_cache, feat_idx)
        x = self.attentions[0](x)
        return self.resnets[1](x, feat_cache, feat_idx)


class TResample(nn.Module):
    def __init__(self, dim, mode):
        super().__init__()
        self.dim, self.mode = dim, mode
        if mode == "upsample2d":
            self.resample = nn.Sequential(
                nn.Upsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
                nn.Conv2d(dim, dim // 2, 3, padding=1))
        elif mode == "upsample3d":
            self.resample = nn.Sequential(
                nn.Upsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
                nn.Conv2d(dim, dim // 2, 3, padding=1))
            self.time_conv = TCausalConv3d(dim, dim * 2, (3, 1, 1),
                                           padding=(1, 0, 0))
        elif mode == "downsample2d":
            self.resample = nn.Sequential(
                nn.ZeroPad2d((0, 1, 0, 1)), nn.Conv2d(dim, dim, 3, stride=(2, 2)))
        elif mode == "downsample3d":
            self.resample = nn.Sequential(
                nn.ZeroPad2d((0, 1, 0, 1)), nn.Conv2d(dim, dim, 3, stride=(2, 2)))
            self.time_conv = TCausalConv3d(dim, dim, (3, 1, 1),
                                           stride=(2, 1, 1), padding=(0, 0, 0))

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        b, c, t, h, w = x.shape
        if self.mode == "upsample3d" and feat_cache is not None:
            idx = feat_idx[0]
            if feat_cache[idx] is None:
                feat_cache[idx] = "Rep"
                feat_idx[0] += 1
            else:
                cache_x = x[:, :, -CACHE_T:].clone()
                if cache_x.shape[2] < 2 and feat_cache[idx] != "Rep":
                    cache_x = torch.cat(
                        [feat_cache[idx][:, :, -1:], cache_x], dim=2)
                if cache_x.shape[2] < 2 and feat_cache[idx] == "Rep":
                    cache_x = torch.cat(
                        [torch.zeros_like(cache_x), cache_x], dim=2)
                if feat_cache[idx] == "Rep":
                    x = self.time_conv(x)
                else:
                    x = self.time_conv(x, feat_cache[idx])
                feat_cache[idx] = cache_x
                feat_idx[0] += 1
                x = x.reshape(b, 2, c, t, h, w)
                x = torch.stack((x[:, 0], x[:, 1]), 3)
                x = x.reshape(b, c, t * 2, h, w)
        t = x.shape[2]
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.resample(x)
        x = x.reshape(b, t, x.shape[1], x.shape[2], x.shape[3])
        x = x.permute(0, 2, 1, 3, 4)
        if self.mode == "downsample3d" and feat_cache is not None:
            idx = feat_idx[0]
            if feat_cache[idx] is None:
                feat_cache[idx] = x.clone()
                feat_idx[0] += 1
            else:
                cache_x = x[:, :, -1:].clone()
                x = self.time_conv(
                    torch.cat([feat_cache[idx][:, :, -1:], x], 2))
                feat_cache[idx] = cache_x
                feat_idx[0] += 1
        return x


def _cached_conv(conv, x, feat_cache, feat_idx):
    if feat_cache is None:
        return conv(x)
    idx = feat_idx[0]
    cache_x = x[:, :, -CACHE_T:].clone()
    if cache_x.shape[2] < 2 and feat_cache[idx] is not None:
        cache_x = torch.cat([feat_cache[idx][:, :, -1:], cache_x], dim=2)
    x = conv(x, feat_cache[idx])
    feat_cache[idx] = cache_x
    feat_idx[0] += 1
    return x


class TEncoder(nn.Module):
    def __init__(self, dim, z_dim, dim_mult, num_res_blocks, temperal):
        super().__init__()
        dims = [dim * u for u in [1] + list(dim_mult)]
        self.conv_in = TCausalConv3d(3, dims[0], 3, padding=1)
        self.down_blocks = nn.ModuleList([])
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(num_res_blocks):
                self.down_blocks.append(TResBlock(in_dim, out_dim))
                in_dim = out_dim
            if i != len(dim_mult) - 1:
                mode = "downsample3d" if temperal[i] else "downsample2d"
                self.down_blocks.append(TResample(out_dim, mode))
        self.mid_block = TMidBlock(dims[-1])
        self.norm_out = TRMSNorm(dims[-1], images=False)
        self.conv_out = TCausalConv3d(dims[-1], z_dim, 3, padding=1)

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        x = _cached_conv(self.conv_in, x, feat_cache, feat_idx)
        for layer in self.down_blocks:
            x = layer(x, feat_cache, feat_idx)
        x = self.mid_block(x, feat_cache, feat_idx)
        x = F.silu(self.norm_out(x))
        return _cached_conv(self.conv_out, x, feat_cache, feat_idx)


class TUpBlock(nn.Module):
    def __init__(self, in_dim, out_dim, num_resnets, mode):
        super().__init__()
        resnets = []
        cur = in_dim
        for _ in range(num_resnets):
            resnets.append(TResBlock(cur, out_dim))
            cur = out_dim
        self.resnets = nn.ModuleList(resnets)
        self.upsamplers = (nn.ModuleList([TResample(out_dim, mode)])
                           if mode else None)

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        for r in self.resnets:
            x = r(x, feat_cache, feat_idx)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x, feat_cache, feat_idx)
        return x


class TDecoder(nn.Module):
    def __init__(self, dim, z_dim, dim_mult, num_res_blocks, temperal_up):
        super().__init__()
        dims = [dim * u for u in [dim_mult[-1]] + list(dim_mult[::-1])]
        self.conv_in = TCausalConv3d(z_dim, dims[0], 3, padding=1)
        self.mid_block = TMidBlock(dims[0])
        self.up_blocks = nn.ModuleList([])
        cur = dims[0]
        for i, out_dim in enumerate(dims[1:]):
            mode = None
            if i != len(dim_mult) - 1:
                mode = "upsample3d" if temperal_up[i] else "upsample2d"
            self.up_blocks.append(TUpBlock(cur, out_dim, num_res_blocks + 1,
                                           mode))
            cur = out_dim // 2 if mode else out_dim
        self.norm_out = TRMSNorm(dims[-1], images=False)
        self.conv_out = TCausalConv3d(dims[-1], 3, 3, padding=1)

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        x = _cached_conv(self.conv_in, x, feat_cache, feat_idx)
        x = self.mid_block(x, feat_cache, feat_idx)
        for up in self.up_blocks:
            x = up(x, feat_cache, feat_idx)
        x = F.silu(self.norm_out(x))
        return _cached_conv(self.conv_out, x, feat_cache, feat_idx)


class TAutoencoderKLWan(nn.Module):
    """diffusers AutoencoderKLWan with its chunked encode/decode drivers."""

    def __init__(self, base_dim=96, z_dim=16, dim_mult=(1, 2, 4, 4),
                 num_res_blocks=2, temperal_downsample=(False, True, True)):
        super().__init__()
        self.z_dim = z_dim
        self.encoder = TEncoder(base_dim, z_dim * 2, dim_mult,
                                num_res_blocks, temperal_downsample)
        self.quant_conv = TCausalConv3d(z_dim * 2, z_dim * 2, 1)
        self.post_quant_conv = TCausalConv3d(z_dim, z_dim, 1)
        self.decoder = TDecoder(base_dim, z_dim, dim_mult, num_res_blocks,
                                list(temperal_downsample)[::-1])

    def _count(self, module):
        return len([m for m in module.modules() if isinstance(m, TCausalConv3d)])

    def encode(self, x):
        t = x.shape[2]
        feat_map = [None] * self._count(self.encoder)
        out = None
        for i in range(1 + (t - 1) // 4):
            idx = [0]
            chunk = (x[:, :, :1] if i == 0
                     else x[:, :, 1 + 4 * (i - 1):1 + 4 * i])
            o = self.encoder(chunk, feat_cache=feat_map, feat_idx=idx)
            out = o if out is None else torch.cat([out, o], 2)
        enc = self.quant_conv(out)
        return enc.chunk(2, dim=1)[0]  # mean (mode="argmax")

    def decode(self, z):
        feat_map = [None] * self._count(self.decoder)
        x = self.post_quant_conv(z)
        out = None
        for i in range(z.shape[2]):
            idx = [0]
            o = self.decoder(x[:, :, i:i + 1], feat_cache=feat_map,
                             feat_idx=idx)
            out = o if out is None else torch.cat([out, o], 2)
        return torch.clamp(out, -1.0, 1.0)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------
TOY = dict(base_dim=8, z_dim=4, dim_mult=(1, 2, 4, 4), num_res_blocks=1,
           temperal_downsample=(False, True, True))


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tm = TAutoencoderKLWan(**TOY).eval()
    variables = convert_wan_vae(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    fm = WanVAE(params=variables["params"], dtype=jnp.float32,
                latents_mean=None, latents_std=None, **TOY)
    return tm, fm


def test_converter_consumes_and_covers(pair):
    tm, fm = pair
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_wan_vae(sd)
    # every torch key mapped, every flax param present, shapes equal
    template = AutoencoderKLWan(latents_mean=None, latents_std=None,
                                **TOY).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3), jnp.float32))
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
    x = np.random.RandomState(1).randn(1, 9, 16, 16, 3).astype(np.float32)
    zt = tm.encode(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    zf = fm.encode(jnp.asarray(x), mode="argmax")
    zt = zt.permute(0, 2, 3, 4, 1).numpy()
    assert zt.shape == zf.shape == (1, 3, 2, 2, 4)
    np.testing.assert_allclose(np.asarray(zf), zt, atol=2e-5, rtol=1e-4)


@torch.no_grad()
def test_decode_parity(pair):
    tm, fm = pair
    z = 0.3 * np.random.RandomState(2).randn(1, 3, 2, 2, 4).astype(np.float32)
    yt = tm.decode(torch.from_numpy(z).permute(0, 4, 1, 2, 3))
    yf = fm.decode(jnp.asarray(z))
    yt = yt.permute(0, 2, 3, 4, 1).numpy()
    assert yt.shape == yf.shape == (1, 9, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(yf), yt, atol=2e-5, rtol=1e-4)


@torch.no_grad()
def test_roundtrip_reconstruction_contract(pair):
    """encode->decode keeps shape/range; causality: latent frame i is
    unaffected by future pixel frames."""
    tm, fm = pair
    x = np.random.RandomState(3).randn(1, 9, 16, 16, 3).astype(np.float32)
    z_full = np.asarray(fm.encode(jnp.asarray(x), mode="argmax"))
    x2 = x.copy()
    x2[:, 5:] = 7.7  # mutate frames 5.. -> latents 0..1 (frames <=4) fixed
    z_trunc = np.asarray(fm.encode(jnp.asarray(x2), mode="argmax"))
    np.testing.assert_allclose(z_trunc[:, :2], z_full[:, :2], atol=1e-5)


@pytest.mark.slow
def test_wan21_real_size_layout():
    """The real Wan2.1 config (96/16/[1,2,4,4]/2) converts with zero dropped
    keys and zero missing flax params (layout-compatibility at full size)."""
    torch.manual_seed(0)
    tm = TAutoencoderKLWan()  # defaults = Wan 2.1 VAE config
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_wan_vae(sd)
    template = jax.eval_shape(
        lambda: AutoencoderKLWan().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 5, 32, 32, 3), jnp.float32)))
    matched, missing = verify_against_template(variables["params"],
                                               template["params"])
    assert missing == 0
    n_t = sum(v.size for v in sd.values())
    n_f = sum(int(np.prod(l.shape))
              for l in jax.tree_util.tree_leaves(variables))
    assert n_t == n_f
