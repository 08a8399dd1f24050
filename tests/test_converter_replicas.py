"""Converter layout-parity vs reference-exact torch replicas.

``tests/test_torch_convert.py`` proves the converters are *invertible*
(torch-layout dicts synthesized from flax params round-trip). These tests
prove the harder property — that the converters' key names and transposes
match the layouts real checkpoints actually use: each family gets a minimal
torch module replicating the reference/diffusers key layout AND forward math
(the pattern proven in ``tests/test_annotators.py`` for Depth-Anything and in
``tests/test_network_ltx2.py`` for the LTX2 RoPE), randomly initialized; its
real ``state_dict()`` is converted and flax forward parity is asserted on a
toy config.

Layout ground truth per family (reference citations):
* Wan — diffusers ``WanTransformer3DModel`` consumed via the reference's
  ``block_forward``/``classify_forward`` monkey-patches
  (``fastgen/networks/Wan/network.py:106-279``).
* SD1.5/SDXL — diffusers ``UNet2DConditionModel``
  (``fastgen/networks/SD15/network.py:438``, ``SDXL/network.py:159``).
* Flux — diffusers ``FluxTransformer2DModel`` 19 joint + 38 single blocks
  (``fastgen/networks/Flux/network.py:327``).
* CogVideoX — diffusers ``CogVideoXTransformer3DModel``
  (``fastgen/networks/CogVideoX/network.py:348``).
* Cosmos — NVIDIA ``cosmos_predict2`` ``MinimalV1LVGDiT``
  (``fastgen/networks/cosmos_predict2/network.py:57-505``).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

# >60s on the single-core dev box (torch-replica / large-module builds): excluded
# from the quick tier (`make pytest`); run via `make pytest-all`.
pytestmark = pytest.mark.slow


KEY = jax.random.PRNGKey(0)


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# --------------------------------------------------------------------- Wan


class _RMSNorm(nn.Module):
    """diffusers.models.normalization.RMSNorm (elementwise affine)."""

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(dim) * 0.05 + 1.0)
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps) * self.weight.float()
                ).type_as(x)


class _WanAttention(nn.Module):
    """diffusers ``WanAttention``: full-dim qk RMSNorm, to_out ModuleList."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.norm_q = _RMSNorm(dim)
        self.norm_k = _RMSNorm(dim)

    def forward(self, x, rotary=None, context=None):
        src = x if context is None else context
        q = self.norm_q(self.to_q(x))
        k = self.norm_k(self.to_k(src))
        v = self.to_v(src)
        b, n, d = q.shape
        q = q.unflatten(2, (self.heads, -1))
        k = k.unflatten(2, (self.heads, -1))
        v = v.unflatten(2, (self.heads, -1))
        if rotary is not None:
            def rot(t):
                tc = torch.view_as_complex(t.double().unflatten(3, (-1, 2)))
                return torch.view_as_real(tc * rotary[None, :, None, :]
                                          ).flatten(3).float()
            q, k = rot(q), rot(k)
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        out = out.transpose(1, 2).flatten(2)
        return self.to_out[0](out)


class _WanFFN(nn.Module):
    """diffusers ``FeedForward(activation_fn='gelu-approximate')``:
    net.0 = GELU wrapper with ``proj``, net.1 = Dropout, net.2 = Linear."""

    def __init__(self, dim, ffn_dim):
        super().__init__()

        class _GELUProj(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, ffn_dim)

            def forward(self, x):
                return F.gelu(self.proj(x), approximate="tanh")

        self.net = nn.ModuleList([_GELUProj(), nn.Dropout(0.0),
                                  nn.Linear(ffn_dim, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class _WanBlock(nn.Module):
    def __init__(self, dim, heads, ffn_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        self.attn1 = _WanAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.attn2 = _WanAttention(dim, heads)
        self.norm3 = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        self.ffn = _WanFFN(dim, ffn_dim)
        self.scale_shift_table = nn.Parameter(torch.randn(1, 6, dim) / dim ** 0.5)

    def forward(self, x, temb6, context, rotary):
        """Reference ``block_forward`` global-temb path
        (``Wan/network.py:106-153``); temb6: [B, 6, D]."""
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = (
            self.scale_shift_table + temb6.float()).chunk(6, dim=1)
        norm_x = (self.norm1(x.float()) * (1 + scale_msa) + shift_msa).type_as(x)
        x = (x.float() + self.attn1(norm_x, rotary=rotary) * gate_msa).type_as(x)
        norm_x = self.norm2(x.float()).type_as(x)
        x = x + self.attn2(norm_x, context=context)
        norm_x = (self.norm3(x.float()) * (1 + c_scale) + c_shift).type_as(x)
        x = (x.float() + self.ffn(norm_x).float() * c_gate).type_as(x)
        return x


class _WanTimeText(nn.Module):
    """diffusers ``WanTimeTextImageEmbedding`` key layout."""

    def __init__(self, dim, freq_dim, text_dim):
        super().__init__()

        class _TimestepEmbedding(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear_1 = nn.Linear(freq_dim, dim)
                self.linear_2 = nn.Linear(dim, dim)

        class _TextProj(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear_1 = nn.Linear(text_dim, dim)
                self.linear_2 = nn.Linear(dim, dim)

        self.time_embedder = _TimestepEmbedding()
        self.time_proj = nn.Linear(dim, dim * 6)
        self.text_embedder = _TextProj()
        self.freq_dim = freq_dim

    def forward(self, t, text):
        # the reference's own sinusoidal embedding (``Wan/network.py:96-104``)
        half = self.freq_dim // 2
        freqs = torch.pow(10000.0, -torch.arange(half, dtype=torch.float64) / half)
        sinusoid = torch.outer(t.double(), freqs)
        feats = torch.cat([torch.cos(sinusoid), torch.sin(sinusoid)], dim=1).float()
        temb = self.time_embedder.linear_2(F.silu(self.time_embedder.linear_1(feats)))
        proj = self.time_proj(F.silu(temb)).unflatten(1, (6, -1))
        ctx = self.text_embedder.linear_2(
            F.gelu(self.text_embedder.linear_1(text), approximate="tanh"))
        return temb, proj, ctx


class _WanReplica(nn.Module):
    """diffusers ``WanTransformer3DModel`` key layout + the reference's
    patched forward math at toy size (T2V trunk)."""

    def __init__(self, dim=48, heads=4, ffn_dim=96, layers=2, in_ch=4,
                 text_dim=16, freq_dim=32, patch=(1, 2, 2)):
        super().__init__()
        self.dim, self.heads, self.patch = dim, heads, patch
        self.head_dim = dim // heads
        self.patch_embedding = nn.Conv3d(in_ch, dim, patch, stride=patch)
        self.condition_embedder = _WanTimeText(dim, freq_dim, text_dim)
        self.blocks = nn.ModuleList(
            [_WanBlock(dim, heads, ffn_dim) for _ in range(layers)])
        self.norm_out = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        self.proj_out = nn.Linear(dim, int(np.prod(patch)) * in_ch)
        self.scale_shift_table = nn.Parameter(torch.randn(1, 2, dim) / dim ** 0.5)

    def _rotary(self, f, h, w):
        """diffusers ``WanRotaryPosEmbed``: complex freqs, head_dim split
        (t: d-2*(d//3), h/w: d//3), theta 10000."""
        d = self.head_dim
        d_t, d_h = d - 2 * (d // 3), d // 3
        out = []
        for size, dd, axis in ((f, d_t, 0), (h, d_h, 1), (w, d_h, 2)):
            freq = 1.0 / 10000.0 ** (torch.arange(0, dd, 2,
                                                  dtype=torch.float64) / dd)
            ang = torch.outer(torch.arange(size, dtype=torch.float64), freq)
            cplx = torch.polar(torch.ones_like(ang), ang)  # [size, dd/2]
            shape = [1, 1, 1, cplx.shape[-1]]
            shape[axis] = size
            reps = [f, h, w, 1]
            reps[axis] = 1
            out.append(cplx.reshape(shape).repeat(reps))
        return torch.cat(out, dim=-1).reshape(f * h * w, d // 2)

    def forward(self, x, t, text):
        """x: [B, C, T, H, W] (torch layout); t already in model scale."""
        b = x.shape[0]
        p_t, p_h, p_w = self.patch
        tokens = self.patch_embedding(x)  # [B, D, F, H', W']
        f, hp, wp = tokens.shape[2:]
        tokens = tokens.flatten(2).transpose(1, 2)  # [B, N, D]
        rotary = self._rotary(f, hp, wp)
        temb, proj, ctx = self.condition_embedder(t, text)
        for blk in self.blocks:
            tokens = blk(tokens, proj, ctx, rotary)
        shift, scale = (self.scale_shift_table + temb.unsqueeze(1)).chunk(2, dim=1)
        tokens = (self.norm_out(tokens.float()) * (1 + scale) + shift
                  ).type_as(tokens)
        tokens = self.proj_out(tokens)
        out = tokens.reshape(b, f, hp, wp, p_t, p_h, p_w, -1)
        out = out.permute(0, 7, 1, 4, 2, 5, 3, 6)
        return out.flatten(6, 7).flatten(4, 5).flatten(2, 3)  # [B, C, T, H, W]


class TestWanConverterParity:
    def test_forward_parity(self):
        from fastgen_tpu.networks.wan.network import WanVideoDiT
        from fastgen_tpu.utils.torch_convert import convert_wan

        torch.manual_seed(0)
        tm = _WanReplica().eval()
        net = WanVideoDiT(dim=48, num_layers=2, num_heads=4, ffn_dim=96,
                          in_channels=4, out_channels=4, text_dim=16,
                          freq_dim=32, rope_max_seq_len=32, attn_impl="xla")
        variables = convert_wan(_sd(tm))

        rs = np.random.RandomState(0)
        x = rs.randn(2, 3, 4, 4, 4).astype(np.float32)      # NTHWC (flax)
        t = np.asarray([0.3, 0.8], np.float32)
        text = rs.randn(2, 5, 16).astype(np.float32)

        t_model = np.asarray(
            net.noise_scheduler.rescale_t(jnp.asarray(t)), np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(x).permute(0, 4, 1, 2, 3),
                     torch.tensor(t_model), torch.tensor(text))
        ours = net.apply(variables, jnp.asarray(x), jnp.asarray(t),
                         condition={"text_embeds": jnp.asarray(text)})
        ours_tl = np.transpose(np.asarray(ours), (0, 4, 1, 2, 3))
        d = np.abs(ours_tl - ref.numpy()).max()
        assert d < 5e-4, f"Wan converter layout mismatch: max|diff|={d}"

    def test_state_dict_fully_consumed(self):
        """Every replica key must be mapped (a misremembered key would be
        silently dropped and only caught at much looser forward tolerance)."""
        from fastgen_tpu.utils.torch_convert import convert_wan

        torch.manual_seed(0)
        tm = _WanReplica()
        variables = convert_wan(_sd(tm))
        n_torch = sum(v.numel() for v in tm.state_dict().values())
        n_flax = sum(np.asarray(l).size for l in
                     jax.tree_util.tree_leaves(variables))
        assert n_torch == n_flax


# ------------------------------------------------------------- SD1.5 / SDXL


class _SDResnet(nn.Module):
    """diffusers ``ResnetBlock2D`` key layout."""

    def __init__(self, in_ch, out_ch, emb_ch, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(math.gcd(groups, in_ch), in_ch, eps=1e-5)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(emb_ch, out_ch)
        self.norm2 = nn.GroupNorm(math.gcd(groups, out_ch), out_ch, eps=1e-5)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)

    def forward(self, x, emb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(emb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _SDTransformerBlock(nn.Module):
    """diffusers ``BasicTransformerBlock``: biasless to_q/k/v, to_out.0,
    GEGLU ff.net.0.proj / ff.net.2."""

    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.heads = heads

        def attn(kdim):
            m = nn.Module()
            m.to_q = nn.Linear(dim, dim, bias=False)
            m.to_k = nn.Linear(kdim, dim, bias=False)
            m.to_v = nn.Linear(kdim, dim, bias=False)
            m.to_out = nn.ModuleList([nn.Linear(dim, dim)])
            return m

        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = attn(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = attn(ctx_dim)
        self.norm3 = nn.LayerNorm(dim)

        class _GEGLU(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, dim * 8)

            def forward(self, x):
                a, g = self.proj(x).chunk(2, dim=-1)
                return a * F.gelu(g)

        self.ff = nn.Module()
        self.ff.net = nn.ModuleList([_GEGLU(), nn.Identity(),
                                     nn.Linear(dim * 4, dim)])

    def _mha(self, attn, x, ctx):
        q, k, v = attn.to_q(x), attn.to_k(ctx), attn.to_v(ctx)
        b, n, d = q.shape
        hd = d // self.heads
        q = q.view(b, n, self.heads, hd).transpose(1, 2)
        k = k.view(b, -1, self.heads, hd).transpose(1, 2)
        v = v.view(b, -1, self.heads, hd).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        return attn.to_out[0](out.transpose(1, 2).reshape(b, n, d))

    def forward(self, x, ctx):
        x = x + self._mha(self.attn1, self.norm1(x), self.norm1(x))
        x = x + self._mha(self.attn2, self.norm2(x), ctx)
        h = self.ff.net[0](self.norm3(x))
        return x + self.ff.net[2](h)


class _SDTransformer2D(nn.Module):
    """diffusers ``Transformer2DModel`` (conv 1x1 proj for SD15, linear for
    SDXL's use_linear_projection)."""

    def __init__(self, ch, heads, depth, ctx_dim, groups, linear_proj):
        super().__init__()
        self.linear_proj = linear_proj
        self.norm = nn.GroupNorm(math.gcd(groups, ch), ch, eps=1e-6)
        if linear_proj:
            self.proj_in = nn.Linear(ch, ch)
            self.proj_out = nn.Linear(ch, ch)
        else:
            self.proj_in = nn.Conv2d(ch, ch, 1)
            self.proj_out = nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [_SDTransformerBlock(ch, heads, ctx_dim) for _ in range(depth)])

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        x = self.norm(x)
        if self.linear_proj:
            x = self.proj_in(x.permute(0, 2, 3, 1).reshape(b, h * w, c))
        else:
            x = self.proj_in(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            x = blk(x, ctx)
        if self.linear_proj:
            x = self.proj_out(x).reshape(b, h, w, c).permute(0, 3, 1, 2)
        else:
            x = self.proj_out(x.reshape(b, h, w, c).permute(0, 3, 1, 2))
        return x + res


class _SDUNetReplica(nn.Module):
    """diffusers ``UNet2DConditionModel`` key layout at toy size: two down
    blocks (cross-attn + plain), mid, two up blocks — the SD15/SDXL trunk."""

    def __init__(self, in_ch=4, chs=(8, 16), ctx_dim=12, heads=2, groups=32,
                 layers_per_block=2, linear_proj=False, add_embed_dim=None):
        super().__init__()
        c0 = chs[0]
        emb = c0 * 4
        self.c0, self.emb_dim = c0, emb
        self.conv_in = nn.Conv2d(in_ch, c0, 3, padding=1)

        class _TimeEmb(nn.Module):
            def __init__(self, d_in):
                super().__init__()
                self.linear_1 = nn.Linear(d_in, emb)
                self.linear_2 = nn.Linear(emb, emb)

        self.time_embedding = _TimeEmb(c0)
        self.add_embedding = _TimeEmb(add_embed_dim) if add_embed_dim else None

        self.down_blocks = nn.ModuleList()
        for bi, ch in enumerate(chs):
            blk = nn.Module()
            in_c = chs[bi - 1] if bi else c0
            blk.resnets = nn.ModuleList(
                [_SDResnet(in_c if li == 0 else ch, ch, emb, groups)
                 for li in range(layers_per_block)])
            if bi == 0:  # cross-attn down block
                blk.attentions = nn.ModuleList(
                    [_SDTransformer2D(ch, heads, 1, ctx_dim, groups, linear_proj)
                     for _ in range(layers_per_block)])
            if bi < len(chs) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)
                blk.downsamplers = nn.ModuleList([ds])
            self.down_blocks.append(blk)

        mid_ch = chs[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [_SDResnet(mid_ch, mid_ch, emb, groups) for _ in range(2)])
        self.mid_block.attentions = nn.ModuleList(
            [_SDTransformer2D(mid_ch, heads, 1, ctx_dim, groups, linear_proj)])

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(chs))
        for bi, ch in enumerate(rev):
            blk = nn.Module()
            resnets = []
            for li in range(layers_per_block + 1):
                skip_ch = self._skip_ch(chs, layers_per_block, bi, li)
                prev_ch = rev[bi - 1] if bi and li == 0 else ch
                if li == 0 and bi == 0:
                    prev_ch = chs[-1]
                resnets.append(_SDResnet(prev_ch + skip_ch, ch, emb, groups))
            blk.resnets = nn.ModuleList(resnets)
            if bi == len(rev) - 1:  # cross-attn up block (mirrors down bi==0)
                blk.attentions = nn.ModuleList(
                    [_SDTransformer2D(ch, heads, 1, ctx_dim, groups, linear_proj)
                     for _ in range(layers_per_block + 1)])
            if bi < len(rev) - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(ch, ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(math.gcd(32, c0), c0, eps=1e-5)
        self.conv_out = nn.Conv2d(c0, in_ch, 3, padding=1)

    @staticmethod
    def _skip_ch(chs, lpb, up_bi, li):
        """Channel width of the skip popped at (up_bi, li) — mirrors the
        down-path push order."""
        stack = [chs[0]]
        for bi, ch in enumerate(chs):
            stack += [ch] * lpb
            if bi < len(chs) - 1:
                stack.append(ch)
        idx = len(stack) - 1 - (up_bi * (lpb + 1) + li)
        return stack[idx]

    def forward(self, x, t, ctx, added_cond=None):
        half = self.c0 // 2
        freqs = torch.exp(-np.log(10000.0)
                          * torch.arange(half, dtype=torch.float32) / half)
        args = t.float()[:, None] * freqs[None]
        temb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        emb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb)))
        if self.add_embedding is not None:
            emb = emb + self.add_embedding.linear_2(
                F.silu(self.add_embedding.linear_1(added_cond)))

        sample = self.conv_in(x)
        skips = [sample]
        for blk in self.down_blocks:
            for li, res in enumerate(blk.resnets):
                sample = res(sample, emb)
                if hasattr(blk, "attentions"):
                    sample = blk.attentions[li](sample, ctx)
                skips.append(sample)
            if hasattr(blk, "downsamplers"):
                sample = blk.downsamplers[0].conv(sample)
                skips.append(sample)

        sample = self.mid_block.resnets[0](sample, emb)
        sample = self.mid_block.attentions[0](sample, ctx)
        sample = self.mid_block.resnets[1](sample, emb)

        for blk in self.up_blocks:
            for li, res in enumerate(blk.resnets):
                sample = torch.cat([sample, skips.pop()], dim=1)
                sample = res(sample, emb)
                if hasattr(blk, "attentions"):
                    sample = blk.attentions[li](sample, ctx)
            if hasattr(blk, "upsamplers"):
                sample = F.interpolate(sample, scale_factor=2, mode="nearest")
                sample = blk.upsamplers[0].conv(sample)

        return self.conv_out(F.silu(self.conv_norm_out(sample)))


class TestSDUNetConverterParity:
    def _run(self, linear_proj, add_embed_dim=None):
        from fastgen_tpu.networks.sd.unet import UNet2DCondition
        from fastgen_tpu.utils.torch_convert import convert_sd_unet

        torch.manual_seed(0)
        tm = _SDUNetReplica(linear_proj=linear_proj,
                            add_embed_dim=add_embed_dim).eval()
        net = UNet2DCondition(
            in_channels=4, out_channels=4, block_out_channels=(8, 16),
            cross_attn_blocks=(True, False), transformer_depths=(1, 0),
            layers_per_block=2, fixed_num_heads=2, context_dim=12,
            addition_embed_dim=add_embed_dim, attn_impl="xla")
        variables = {"params": convert_sd_unet(_sd(tm))["params"]["unet"]}

        rs = np.random.RandomState(1)
        x = rs.randn(2, 8, 8, 4).astype(np.float32)
        t = np.asarray([10.0, 500.0], np.float32)
        ctx = rs.randn(2, 6, 12).astype(np.float32)
        added = (rs.randn(2, add_embed_dim).astype(np.float32)
                 if add_embed_dim else None)

        with torch.no_grad():
            ref = tm(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(t),
                     torch.tensor(ctx),
                     None if added is None else torch.tensor(added))
        ours = net.apply(variables, jnp.asarray(x), jnp.asarray(t),
                         jnp.asarray(ctx),
                         added_cond=None if added is None else jnp.asarray(added))
        d = np.abs(np.transpose(np.asarray(ours), (0, 3, 1, 2)) - ref.numpy()).max()
        assert d < 5e-4, f"SD UNet converter layout mismatch: max|diff|={d}"

        n_torch = sum(v.numel() for v in tm.state_dict().values())
        n_flax = sum(np.asarray(l).size
                     for l in jax.tree_util.tree_leaves(variables))
        assert n_torch == n_flax

    def test_sd15_layout(self):
        self._run(linear_proj=False)

    def test_sdxl_layout(self):
        """linear proj_in/proj_out + add_embedding (the SDXL signature)."""
        self._run(linear_proj=True, add_embed_dim=16)


# -------------------------------------------------------------------- Flux


class _HeadRMS(nn.Module):
    """diffusers per-head RMSNorm (weight over head_dim)."""

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(dim) * 0.05 + 1.0)
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps)) * self.weight.float()


def _flux_rope(head_dim, hp, wp, txt_len):
    """diffusers ``FluxPosEmbed``: ids (0, y, x), axes_dim=(d/8, 7d/16 x2),
    interleaved cos/sin (repeat_interleave_real)."""
    d_id = head_dim // 8
    d_rest = (head_dim - d_id) // 2
    ys, xs = torch.meshgrid(torch.arange(hp), torch.arange(wp), indexing="ij")
    pos = [torch.zeros(hp * wp), ys.reshape(-1).double(), xs.reshape(-1).double()]
    angs = []
    for d, p in zip((d_id, d_rest, d_rest), pos):
        freqs = 1.0 / 10000.0 ** (torch.arange(0, d, 2, dtype=torch.float64) / d)
        angs.append(torch.outer(p.double(), freqs))
    img = torch.cat(angs, dim=-1)
    ang = torch.cat([torch.zeros(txt_len, head_dim // 2).double(), img], dim=0)
    cos = ang.cos().repeat_interleave(2, dim=-1)
    sin = ang.sin().repeat_interleave(2, dim=-1)
    return cos, sin


def _apply_rope_torch(x, cos, sin):
    """Interleaved rotation (diffusers apply_rotary_emb use_real=True,
    use_real_unbind_dim=-1): x [B, H, N, D]."""
    xf = x.double()
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    rot = torch.stack([-x2, x1], dim=-1).flatten(-2)
    return (xf * cos[None, None] + rot * sin[None, None]).float()


class _FluxJointBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        hd = dim // heads

        class _AdaLNZero(nn.Module):
            def __init__(self, n):
                super().__init__()
                self.linear = nn.Linear(dim, dim * n)

        self.norm1 = _AdaLNZero(6)
        self.norm1_context = _AdaLNZero(6)
        attn = nn.Module()
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                   "add_v_proj", "to_add_out"):
            setattr(attn, nm, nn.Linear(dim, dim))
        attn.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        attn.norm_q = _HeadRMS(hd)
        attn.norm_k = _HeadRMS(hd)
        attn.norm_added_q = _HeadRMS(hd)
        attn.norm_added_k = _HeadRMS(hd)
        self.attn = attn

        def ff():
            m = nn.Module()

            class _GeluProj(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.proj = nn.Linear(dim, dim * 4)

                def forward(self, x):
                    return F.gelu(self.proj(x), approximate="tanh")

            m.net = nn.ModuleList([_GeluProj(), nn.Identity(),
                                   nn.Linear(dim * 4, dim)])
            return m

        self.ff = ff()
        self.ff_context = ff()
        self.dim = dim

    def _heads(self, t):
        b, n, d = t.shape
        return t.view(b, n, self.heads, d // self.heads).transpose(1, 2)

    def forward(self, img, txt, temb, rope):
        cos, sin = rope
        i_mod = self.norm1.linear(F.silu(temb))[:, None].chunk(6, dim=-1)
        t_mod = self.norm1_context.linear(F.silu(temb))[:, None].chunk(6, dim=-1)
        i_shift, i_scale, i_gate, i_shift2, i_scale2, i_gate2 = i_mod
        t_shift, t_scale, t_gate, t_shift2, t_scale2, t_gate2 = t_mod

        ln = nn.functional.layer_norm
        img_n = ln(img, (self.dim,)) * (1 + i_scale) + i_shift
        txt_n = ln(txt, (self.dim,)) * (1 + t_scale) + t_shift

        iq = self.attn.norm_q(self._heads(self.attn.to_q(img_n)))
        ik = self.attn.norm_k(self._heads(self.attn.to_k(img_n)))
        iv = self._heads(self.attn.to_v(img_n)).float()
        tq = self.attn.norm_added_q(self._heads(self.attn.add_q_proj(txt_n)))
        tk = self.attn.norm_added_k(self._heads(self.attn.add_k_proj(txt_n)))
        tv = self._heads(self.attn.add_v_proj(txt_n)).float()
        q = torch.cat([tq, iq], dim=2)
        k = torch.cat([tk, ik], dim=2)
        v = torch.cat([tv, iv], dim=2)
        q = _apply_rope_torch(q, cos, sin)
        k = _apply_rope_torch(k, cos, sin)
        out = F.scaled_dot_product_attention(q, k, v)
        b, h, n, hd = out.shape
        out = out.transpose(1, 2).reshape(b, n, h * hd)
        txt_len = txt.shape[1]
        t_attn, i_attn = out[:, :txt_len], out[:, txt_len:]

        img = img + i_gate * self.attn.to_out[0](i_attn)
        txt = txt + t_gate * self.attn.to_add_out(t_attn)

        img_n = ln(img, (self.dim,)) * (1 + i_scale2) + i_shift2
        img = img + i_gate2 * self.ff.net[2](self.ff.net[0](img_n))
        txt_n = ln(txt, (self.dim,)) * (1 + t_scale2) + t_shift2
        txt = txt + t_gate2 * self.ff_context.net[2](self.ff_context.net[0](txt_n))
        return img, txt


class _FluxSingleBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads, self.dim = heads, dim
        hd = dim // heads
        norm = nn.Module()
        norm.linear = nn.Linear(dim, dim * 3)
        self.norm = norm
        attn = nn.Module()
        attn.to_q = nn.Linear(dim, dim)
        attn.to_k = nn.Linear(dim, dim)
        attn.to_v = nn.Linear(dim, dim)
        attn.norm_q = _HeadRMS(hd)
        attn.norm_k = _HeadRMS(hd)
        self.attn = attn
        self.proj_mlp = nn.Linear(dim, dim * 4)
        self.proj_out = nn.Linear(dim * 5, dim)

    def forward(self, x, temb, rope):
        cos, sin = rope
        shift, scale, gate = self.norm.linear(F.silu(temb))[:, None].chunk(3, -1)
        xn = F.layer_norm(x, (self.dim,)) * (1 + scale) + shift
        mlp = F.gelu(self.proj_mlp(xn), approximate="tanh")
        b, n, d = xn.shape
        hview = lambda t: t.view(b, n, self.heads, -1).transpose(1, 2)
        q = self.attn.norm_q(hview(self.attn.to_q(xn)))
        k = self.attn.norm_k(hview(self.attn.to_k(xn)))
        v = hview(self.attn.to_v(xn)).float()
        q = _apply_rope_torch(q, cos, sin)
        k = _apply_rope_torch(k, cos, sin)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, n, d)
        return x + gate * self.proj_out(torch.cat([out, mlp], dim=-1))


class _FluxReplica(nn.Module):
    """diffusers ``FluxTransformer2DModel`` key layout at toy size."""

    def __init__(self, dim=64, heads=2, joint=2, single=2, in_ch=4, patch=2,
                 text_dim=16, pooled_dim=8, guidance=True):
        super().__init__()
        self.dim, self.heads, self.patch, self.in_ch = dim, heads, patch, in_ch
        self.x_embedder = nn.Linear(in_ch * patch * patch, dim)
        self.context_embedder = nn.Linear(text_dim, dim)

        def mlp_embedder(d_in):
            m = nn.Module()
            m.linear_1 = nn.Linear(d_in, dim)
            m.linear_2 = nn.Linear(dim, dim)
            return m

        tte = nn.Module()
        tte.timestep_embedder = mlp_embedder(256)
        tte.text_embedder = mlp_embedder(pooled_dim)
        if guidance:
            tte.guidance_embedder = mlp_embedder(256)
        self.time_text_embed = tte

        self.transformer_blocks = nn.ModuleList(
            [_FluxJointBlock(dim, heads) for _ in range(joint)])
        self.single_transformer_blocks = nn.ModuleList(
            [_FluxSingleBlock(dim, heads) for _ in range(single)])
        norm_out = nn.Module()
        norm_out.linear = nn.Linear(dim, dim * 2)
        self.norm_out = norm_out
        self.proj_out = nn.Linear(dim, patch * patch * in_ch)

    @staticmethod
    def _timesteps(t):
        """diffusers ``Timesteps(256, flip_sin_to_cos=True, shift=0)``."""
        half = 128
        freqs = torch.exp(-np.log(10000.0)
                          * torch.arange(half, dtype=torch.float32) / half)
        args = t.float()[:, None] * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, x, t, txt, pooled, guidance=None):
        """x: [B, H, W, C] latent (pre-packing); t in model scale."""
        b, h, w, c = x.shape
        p = self.patch
        hp, wp = h // p, w // p
        img = x.reshape(b, hp, p, wp, p, c).permute(0, 1, 3, 2, 4, 5)
        img = img.reshape(b, hp * wp, p * p * c)
        img = self.x_embedder(img)
        txt = self.context_embedder(txt)

        te = self.time_text_embed
        temb = te.timestep_embedder.linear_2(
            F.silu(te.timestep_embedder.linear_1(self._timesteps(t))))
        if guidance is not None:
            temb = temb + te.guidance_embedder.linear_2(
                F.silu(te.guidance_embedder.linear_1(self._timesteps(guidance))))
        temb = temb + te.text_embedder.linear_2(
            F.silu(te.text_embedder.linear_1(pooled)))

        rope = _flux_rope(self.dim // self.heads, hp, wp, txt.shape[1])
        for blk in self.transformer_blocks:
            img, txt = blk(img, txt, temb, rope)
        xcat = torch.cat([txt, img], dim=1)
        for blk in self.single_transformer_blocks:
            xcat = blk(xcat, temb, rope)
        img = xcat[:, txt.shape[1]:]
        # AdaLayerNormContinuous: chunk order (scale, shift)
        scale, shift = self.norm_out.linear(F.silu(temb))[:, None].chunk(2, -1)
        img = F.layer_norm(img, (self.dim,)) * (1 + scale) + shift
        img = self.proj_out(img)
        out = img.reshape(b, hp, wp, p, p, c).permute(0, 1, 3, 2, 4, 5)
        return out.reshape(b, h, w, c)


class TestFluxConverterParity:
    def test_forward_parity(self):
        from fastgen_tpu.networks.flux.network import Flux
        from fastgen_tpu.utils.torch_convert import convert_flux

        torch.manual_seed(0)
        tm = _FluxReplica().eval()
        net = Flux(dim=64, num_layers=2, num_single_layers=2, num_heads=2,
                   in_channels=4, patch_size=2, text_dim=16, pooled_dim=8,
                   guidance_embeds=True, guidance_scale=3.5, attn_impl="xla")
        variables = convert_flux(_sd(tm))

        rs = np.random.RandomState(0)
        x = rs.randn(2, 8, 8, 4).astype(np.float32)
        t = np.asarray([0.25, 0.9], np.float32)
        txt = rs.randn(2, 5, 16).astype(np.float32)
        pooled = rs.randn(2, 8).astype(np.float32)

        t_model = np.asarray(
            Flux().noise_scheduler.rescale_t(jnp.asarray(t)), np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(x), torch.tensor(t_model), torch.tensor(txt),
                     torch.tensor(pooled),
                     guidance=torch.tensor([3.5 * 1000.0] * 2))
        ours = net.apply(variables, jnp.asarray(x), jnp.asarray(t),
                         condition={"text_embeds": jnp.asarray(txt),
                                    "pooled_embeds": jnp.asarray(pooled)})
        d = np.abs(np.asarray(ours) - ref.numpy()).max()
        assert d < 5e-4, f"Flux converter layout mismatch: max|diff|={d}"

        n_torch = sum(v.numel() for v in tm.state_dict().values())
        n_flax = sum(np.asarray(l).size
                     for l in jax.tree_util.tree_leaves(variables))
        assert n_torch == n_flax


# --------------------------------------------------------------- CogVideoX


class _CogLayerNormZero(nn.Module):
    """diffusers ``CogVideoXLayerNormZero``: linear(temb -> 6*dim) + shared
    affine LayerNorm; chunk (shift, scale, gate, enc_shift, enc_scale,
    enc_gate)."""

    def __init__(self, temb_dim, dim):
        super().__init__()
        self.linear = nn.Linear(temb_dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, vid, txt, temb):
        shift, scale, gate, t_shift, t_scale, t_gate = self.linear(
            F.silu(temb))[:, None].chunk(6, dim=-1)
        vid = self.norm(vid) * (1 + scale) + shift
        txt = self.norm(txt) * (1 + t_scale) + t_shift
        return vid, txt, gate, t_gate


class _CogBlock(nn.Module):
    def __init__(self, dim, heads, temb_dim):
        super().__init__()
        self.heads = heads
        hd = dim // heads
        self.norm1 = _CogLayerNormZero(temb_dim, dim)
        attn = nn.Module()
        attn.to_q = nn.Linear(dim, dim)
        attn.to_k = nn.Linear(dim, dim)
        attn.to_v = nn.Linear(dim, dim)
        attn.norm_q = nn.LayerNorm(hd, eps=1e-5)
        attn.norm_k = nn.LayerNorm(hd, eps=1e-5)
        attn.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.attn1 = attn
        self.norm2 = _CogLayerNormZero(temb_dim, dim)

        class _GeluProj(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, dim * 4)

            def forward(self, x):
                return F.gelu(self.proj(x), approximate="tanh")

        self.ff = nn.Module()
        self.ff.net = nn.ModuleList([_GeluProj(), nn.Identity(),
                                     nn.Linear(dim * 4, dim)])

    def forward(self, vid, txt, temb, rope=None):
        txt_len = txt.shape[1]
        vid_n, txt_n, gate, t_gate = self.norm1(vid, txt, temb)
        x = torch.cat([txt_n, vid_n], dim=1)
        b, n, d = x.shape
        hv = lambda t: t.view(b, n, self.heads, -1)
        q = self.attn1.norm_q(hv(self.attn1.to_q(x)))
        k = self.attn1.norm_k(hv(self.attn1.to_k(x)))
        v = hv(self.attn1.to_v(x))
        if rope is not None:
            cos, sin = rope
            q = torch.cat([q[:, :txt_len],
                           _apply_rope_torch(q[:, txt_len:].transpose(1, 2),
                                             cos, sin).transpose(1, 2)], dim=1)
            k = torch.cat([k[:, :txt_len],
                           _apply_rope_torch(k[:, txt_len:].transpose(1, 2),
                                             cos, sin).transpose(1, 2)], dim=1)
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2).float(), k.transpose(1, 2).float(),
            v.transpose(1, 2).float())
        out = self.attn1.to_out[0](out.transpose(1, 2).reshape(b, n, d))
        txt = txt + t_gate * out[:, :txt_len]
        vid = vid + gate * out[:, txt_len:]

        vid_n, txt_n, gate2, t_gate2 = self.norm2(vid, txt, temb)
        x = torch.cat([txt_n, vid_n], dim=1)
        h = self.ff.net[2](self.ff.net[0](x))
        txt = txt + t_gate2 * h[:, :txt_len]
        vid = vid + gate2 * h[:, txt_len:]
        return vid, txt


class _CogReplica(nn.Module):
    """diffusers ``CogVideoXTransformer3DModel`` key layout at toy size."""

    def __init__(self, dim=32, heads=2, layers=2, in_ch=4, text_dim=12,
                 temb_dim=16, patch=2, use_rotary=False,
                 sample_hw=(4, 4), sample_frames=3):
        super().__init__()
        self.dim, self.heads, self.patch = dim, heads, patch
        self.use_rotary = use_rotary
        pe = nn.Module()
        pe.proj = nn.Conv2d(in_ch, dim, patch, stride=patch)
        pe.text_proj = nn.Linear(text_dim, dim)
        self.patch_embed = pe

        te = nn.Module()
        te.linear_1 = nn.Linear(dim, temb_dim)
        te.linear_2 = nn.Linear(temb_dim, temb_dim)
        self.time_embedding = te

        self.transformer_blocks = nn.ModuleList(
            [_CogBlock(dim, heads, temb_dim) for _ in range(layers)])
        self.norm_final = nn.LayerNorm(dim, eps=1e-5)
        no = nn.Module()
        no.linear = nn.Linear(temb_dim, 2 * dim)
        no.norm = nn.LayerNorm(dim, eps=1e-5)
        self.norm_out = no
        self.proj_out = nn.Linear(dim, patch * patch * in_ch)

    def _sincos_pos(self, f, hp, wp):
        """diffusers ``get_3d_sincos_pos_embed`` (temporal 1/4 + spatial 3/4,
        video tokens only — text pos rows are zero)."""
        from fastgen_tpu.networks.cogvideox.network import get_3d_sincos_pos_embed

        pe = get_3d_sincos_pos_embed(self.dim, (wp, hp), f)
        return torch.tensor(pe.reshape(1, -1, self.dim), dtype=torch.float32)

    def _rope(self, f, hp, wp):
        """diffusers ``get_3d_rotary_pos_embed``: t d/4, h 3d/8, w 3d/8."""
        d = self.dim // self.heads
        d_t, d_h = d // 4, d // 8 * 3
        parts = []
        for size, dd, axis in ((f, d_t, 0), (hp, d_h, 1), (wp, d_h, 2)):
            freqs = 1.0 / 10000.0 ** (torch.arange(0, dd, 2,
                                                   dtype=torch.float64) / dd)
            ang = torch.outer(torch.arange(size, dtype=torch.float64), freqs)
            shape = [1, 1, 1, ang.shape[-1]]
            shape[axis] = size
            reps = [f, hp, wp, 1]
            reps[axis] = 1
            parts.append(ang.reshape(shape).repeat(reps))
        ang = torch.cat(parts, dim=-1).reshape(f * hp * wp, d // 2)
        return (ang.cos().repeat_interleave(2, -1),
                ang.sin().repeat_interleave(2, -1))

    def forward(self, x, t, text):
        """x: [B, T, C, H, W] (diffusers layout); t in model scale."""
        b, f, c, h, w = x.shape
        p = self.patch
        hp, wp = h // p, w // p
        vid = self.patch_embed.proj(x.reshape(b * f, c, h, w))
        vid = vid.flatten(2).transpose(1, 2).reshape(b, f * hp * wp, self.dim)
        txt = self.patch_embed.text_proj(text)
        rope = None
        if self.use_rotary:
            rope = self._rope(f, hp, wp)
        else:
            vid = vid + self._sincos_pos(f, hp, wp)

        half = self.dim // 2
        freqs = torch.exp(-np.log(10000.0)
                          * torch.arange(half, dtype=torch.float32) / half)
        args = t.float()[:, None] * freqs[None]
        tfeat = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(tfeat)))

        for blk in self.transformer_blocks:
            vid, txt = blk(vid, txt, temb, rope)

        if self.use_rotary:  # 5B: concat -> norm -> slice
            vid = self.norm_final(torch.cat([txt, vid], dim=1))[:, txt.shape[1]:]
        else:                # 2B: video tokens only
            vid = self.norm_final(vid)
        shift, scale = self.norm_out.linear(F.silu(temb))[:, None].chunk(2, -1)
        vid = self.norm_out.norm(vid) * (1 + scale) + shift
        vid = self.proj_out(vid)
        out = vid.reshape(b, f, hp, wp, p, p, -1)
        out = out.permute(0, 1, 2, 4, 3, 5, 6).reshape(b, f, h, w, -1)
        return out  # NTHWC to match the flax output


class TestCogVideoXConverterParity:
    @pytest.mark.parametrize("use_rotary", [False, True])
    def test_forward_parity(self, use_rotary):
        from fastgen_tpu.networks.cogvideox.network import CogVideoX
        from fastgen_tpu.utils.torch_convert import convert_cogvideox

        torch.manual_seed(0)
        tm = _CogReplica(use_rotary=use_rotary).eval()
        net = CogVideoX(dim=32, num_layers=2, num_heads=2, in_channels=4,
                        patch_size=2, text_dim=12, time_embed_dim=16,
                        use_rotary=use_rotary, attn_impl="xla")
        variables = convert_cogvideox(_sd(tm))

        rs = np.random.RandomState(0)
        x = rs.randn(2, 3, 4, 4, 4).astype(np.float32)  # NTHWC
        t = np.asarray([100.0, 700.0], np.float32)
        text = rs.randn(2, 5, 12).astype(np.float32)

        t_model = np.asarray(
            net.noise_scheduler.rescale_t(jnp.asarray(t)), np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(x).permute(0, 1, 4, 2, 3),
                     torch.tensor(t_model), torch.tensor(text))
        ours = net.apply(variables, jnp.asarray(x), jnp.asarray(t),
                         condition={"text_embeds": jnp.asarray(text)},
                         fwd_pred_type="v")
        d = np.abs(np.asarray(ours) - ref.numpy()).max()
        assert d < 5e-4, f"CogVideoX converter layout mismatch: max|diff|={d}"

        n_torch = sum(v.numel() for v in tm.state_dict().values())
        n_flax = sum(np.asarray(l).size
                     for l in jax.tree_util.tree_leaves(variables))
        assert n_torch == n_flax


# ------------------------------------------------------------------ Cosmos


class _CosmosRMS(nn.Module):
    """ref ``modules.py:185-203`` RMSNorm (norm in f32, weight applied after
    the cast back)."""

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(dim) * 0.05 + 1.0)
        self.eps = eps

    def forward(self, x):
        xf = x.float()
        out = (xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + self.eps)
               ).type_as(x)
        return out * self.weight


def _cosmos_rope_split(head_dim, f, h, w):
    """ref ``VideoRopePosition3DEmb.generate_embeddings`` + the SPLIT-
    convention ``apply_rotary_pos_emb_simple``: angle halves [L, D/2]."""
    d_h = head_dim // 6 * 2
    d_t = head_dim - 2 * d_h
    parts = []
    for size, dd, axis in ((f, d_t, 0), (h, d_h, 1), (w, d_h, 2)):
        rng = torch.arange(0, dd, 2, dtype=torch.float64)[: dd // 2] / dd
        freqs = 1.0 / 10000.0 ** rng
        ang = torch.outer(torch.arange(size, dtype=torch.float64), freqs)
        shape = [1, 1, 1, ang.shape[-1]]
        shape[axis] = size
        reps = [f, h, w, 1]
        reps[axis] = 1
        parts.append(ang.reshape(shape).repeat(reps))
    # t-axis angles first, matching the reference's cat([t, h, w] * 2) where
    # the second copy covers the second half of the head dim
    return torch.cat(parts, dim=-1).reshape(f * h * w, -1)


def _rope_split_apply(x, angles):
    """x [B, L, H, D]; angles [L, D/2] (split halves convention)."""
    half = x.shape[-1] // 2
    cos = angles.cos()[None, :, None, :].float()
    sin = angles.sin()[None, :, None, :].float()
    x1, x2 = x.float()[..., :half], x.float()[..., half:]
    return torch.cat([x1 * cos - x2 * sin, x1 * sin + x2 * cos], dim=-1)


class _CosmosAttention(nn.Module):
    """ref ``modules.py:285-401``: bias-free q/k/v/out, RMSNorm(head_dim)."""

    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        hd = dim // heads
        self.q_proj = nn.Linear(dim, dim, bias=False)
        self.k_proj = nn.Linear(ctx_dim or dim, dim, bias=False)
        self.v_proj = nn.Linear(ctx_dim or dim, dim, bias=False)
        self.q_norm = _CosmosRMS(hd)
        self.k_norm = _CosmosRMS(hd)
        self.output_proj = nn.Linear(dim, dim, bias=False)

    def forward(self, x, context=None, rope=None):
        ctx = x if context is None else context
        b, n, d = x.shape
        hv = lambda t: t.unflatten(-1, (self.heads, -1))
        q = self.q_norm(hv(self.q_proj(x)))
        k = self.k_norm(hv(self.k_proj(ctx)))
        v = hv(self.v_proj(ctx))
        if rope is not None and context is None:
            q = _rope_split_apply(q, rope)
            k = _rope_split_apply(k, rope)
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2).float(), k.transpose(1, 2).float(),
            v.transpose(1, 2).float())
        return self.output_proj(out.transpose(1, 2).reshape(b, n, d))


class _CosmosBlock(nn.Module):
    """ref ``modules.py:759-926`` Block (non-LoRA)."""

    def __init__(self, dim, ctx_dim, heads, ffn):
        super().__init__()
        self.layer_norm_self_attn = nn.LayerNorm(dim, elementwise_affine=False,
                                                 eps=1e-6)
        self.self_attn = _CosmosAttention(dim, None, heads)
        self.layer_norm_cross_attn = nn.LayerNorm(dim, elementwise_affine=False,
                                                  eps=1e-6)
        self.cross_attn = _CosmosAttention(dim, ctx_dim, heads)
        self.layer_norm_mlp = nn.LayerNorm(dim, elementwise_affine=False,
                                           eps=1e-6)
        mlp = nn.Module()
        mlp.layer1 = nn.Linear(dim, ffn, bias=False)
        mlp.layer2 = nn.Linear(ffn, dim, bias=False)
        self.mlp = mlp

        def adaln():
            # non-zero init so the parity test exercises the modulation path
            lin = nn.Linear(dim, 3 * dim, bias=False)
            return nn.Sequential(nn.SiLU(), lin)

        self.adaln_modulation_self_attn = adaln()
        self.adaln_modulation_cross_attn = adaln()
        self.adaln_modulation_mlp = adaln()

    def forward(self, x, temb, ctx, rope):
        """x: [B, T, HW, D]; temb: [B, T, D] broadcast per frame."""
        b, t, s, d = x.shape

        def mod(m):
            sh, sc, g = m(temb)[:, :, None].chunk(3, dim=-1)
            return sh, sc, g

        sh, sc, g = mod(self.adaln_modulation_self_attn)
        xn = self.layer_norm_self_attn(x) * (1 + sc) + sh
        out = self.self_attn(xn.reshape(b, t * s, d), rope=rope).reshape(x.shape)
        x = x + g * out

        sh, sc, g = mod(self.adaln_modulation_cross_attn)
        xn = self.layer_norm_cross_attn(x) * (1 + sc) + sh
        out = self.cross_attn(xn.reshape(b, t * s, d), context=ctx).reshape(x.shape)
        x = x + g * out

        sh, sc, g = mod(self.adaln_modulation_mlp)
        xn = self.layer_norm_mlp(x) * (1 + sc) + sh
        out = self.mlp.layer2(F.gelu(self.mlp.layer1(xn)))
        return x + g * out


class _CosmosReplica(nn.Module):
    """ref ``CosmosPredict2DiT`` key layout (non-LoRA) at toy size."""

    def __init__(self, dim=24, heads=2, layers=2, ffn=48, in_ch=4,
                 ctx_dim=16, proj_in=20, patch=(1, 2)):
        super().__init__()
        pt, p = patch
        self.dim, self.heads, self.pt, self.p = dim, heads, pt, p
        self.in_total = in_ch + 2  # + video-condition mask + padding mask
        xe = nn.Module()
        xe.proj = nn.ModuleList(
            [nn.Identity(), nn.Linear(self.in_total * pt * p * p, dim,
                                      bias=False)])
        self.x_embedder = xe
        te1 = nn.Module()
        te1.linear_1 = nn.Linear(dim, dim, bias=True)
        te1.linear_2 = nn.Linear(dim, dim, bias=False)
        self.t_embedder = nn.ModuleList([nn.Identity(), te1])
        self.t_embedding_norm = _CosmosRMS(dim)
        self.blocks = nn.ModuleList(
            [_CosmosBlock(dim, ctx_dim, heads, ffn) for _ in range(layers)])
        fl = nn.Module()
        fl.linear = nn.Linear(dim, p * p * pt * in_ch, bias=False)
        fl.adaln_modulation = nn.Sequential(nn.SiLU(),
                                            nn.Linear(dim, 2 * dim, bias=False))
        self.final_layer = fl
        self.crossattn_proj = nn.Sequential(nn.Linear(proj_in, ctx_dim),
                                            nn.GELU())

    def forward(self, x, t_frames, text):
        """x: [B, C, T, H, W]; t_frames: [B, T] in model scale;
        text: [B, L, proj_in]."""
        b, c, T, H, W = x.shape
        pad = torch.zeros(b, 2, T, H, W)
        x = torch.cat([x, pad], dim=1)
        pt, p = self.pt, self.p
        t, hp, wp = T // pt, H // p, W // p
        # PatchEmbed rearrange: b c (t r) (h m) (w n) -> b t h w (c r m n)
        xx = x.reshape(b, self.in_total, t, pt, hp, p, wp, p)
        xx = xx.permute(0, 2, 4, 6, 1, 3, 5, 7).reshape(
            b, t, hp, wp, self.in_total * pt * p * p)
        tokens = self.x_embedder.proj[1](xx).reshape(b, t, hp * wp, self.dim)

        half = self.dim // 2
        freqs = torch.exp(-np.log(10000.0)
                          * torch.arange(half, dtype=torch.float32) / half)
        ang = t_frames.float()[..., None] * freqs
        feats = torch.cat([ang.cos(), ang.sin()], dim=-1)
        emb = self.t_embedder[1].linear_2(
            F.silu(self.t_embedder[1].linear_1(feats)))
        temb = self.t_embedding_norm(emb)

        ctx = self.crossattn_proj(text)
        rope = _cosmos_rope_split(self.dim // self.heads, t, hp, wp)

        xk = tokens
        for blk in self.blocks:
            xk = blk(xk, temb, ctx, rope)

        sh, sc = self.final_layer.adaln_modulation(temb)[:, :, None].chunk(2, -1)
        xk = F.layer_norm(xk, (self.dim,), eps=1e-6) * (1 + sc) + sh
        xk = self.final_layer.linear(xk)
        # unpatchify (p1 p2 t C) order
        out = xk.reshape(b, t, hp, wp, p, p, pt, -1)
        out = out.permute(0, 1, 6, 2, 4, 3, 5, 7)
        return out.reshape(b, t * pt, hp * p, wp * p, -1)  # NTHWC


class TestCosmosConverterParity:
    def test_forward_parity(self):
        from fastgen_tpu.networks.cosmos.network import CosmosPredict2
        from fastgen_tpu.utils.torch_convert import convert_cosmos

        torch.manual_seed(0)
        tm = _CosmosReplica().eval()
        net = CosmosPredict2(dim=24, num_layers=2, num_heads=2, ffn_dim=48,
                             in_channels=4, out_channels=4, text_dim=16,
                             crossattn_proj_in_channels=20, patch_spatial=2,
                             patch_temporal=1, is_video2world=True,
                             concat_padding_mask=True, enable_logvar=False,
                             attn_impl="xla")
        variables = convert_cosmos(_sd(tm))

        rs = np.random.RandomState(0)
        x = rs.randn(2, 3, 4, 4, 4).astype(np.float32)  # NTHWC
        t = np.asarray([0.2, 0.85], np.float32)
        text = rs.randn(2, 5, 20).astype(np.float32)

        t_model = np.asarray(
            net.noise_scheduler.rescale_t(jnp.asarray(t)), np.float32)
        t_frames = np.repeat(t_model[:, None], 3, axis=1)
        with torch.no_grad():
            ref = tm(torch.tensor(x).permute(0, 4, 1, 2, 3),
                     torch.tensor(t_frames), torch.tensor(text))
        ours = net.apply(variables, jnp.asarray(x), jnp.asarray(t),
                         condition={"text_embeds": jnp.asarray(text)})
        d = np.abs(np.asarray(ours) - ref.numpy()).max()
        assert d < 5e-4, f"Cosmos converter layout mismatch: max|diff|={d}"

        n_torch = sum(v.numel() for v in tm.state_dict().values())
        n_flax = sum(np.asarray(l).size
                     for l in jax.tree_util.tree_leaves(variables))
        assert n_torch == n_flax
