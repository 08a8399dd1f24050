"""Depth-Anything V2 annotator tests (ref ``vace_depth_annotator.py``,
``third_party/annotators/depth_anything_v2/``).

Parity strategy: micro-parity of the matrix-interpolation and block-transpose
primitives against torch ``F.interpolate`` / ``F.conv_transpose2d``, plus a
full-model check of the flax port + weight converter against a compact torch
replica of the published architecture (the same approach used for the CLIP/T5
encoders in ``tests/test_encoders.py``).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
import torch.nn as tnn
import torch.nn.functional as F

from fastgen_tpu.networks.annotators.depth_anything_v2 import (
    BlockConvTranspose,
    DepthAnnotator,
    DepthAnythingV2,
    convert_depth_anything,
    resize_2d,
)


# --------------------------------------------------------------------------
# micro-parity: interpolation + block conv-transpose
# --------------------------------------------------------------------------

@pytest.mark.parametrize("method,align,size", [
    ("bilinear", True, (13, 9)),
    ("bilinear", False, (13, 9)),
    ("bicubic", True, (17, 11)),
    ("bilinear", True, (4, 3)),       # downsample
])
def test_resize_matches_torch(method, align, size):
    rs = np.random.RandomState(0)
    x = rs.randn(2, 7, 5, 3).astype(np.float32)
    ours = np.asarray(resize_2d(jnp.asarray(x), size, method, align))
    theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=size,
                           mode=method, align_corners=align)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_resize_scale_factor_matches_torch():
    """The DINOv2 pos-embed path: bicubic with an explicit scale factor."""
    rs = np.random.RandomState(1)
    g, d = 6, 4
    x = rs.randn(g, g, d).astype(np.float32)
    sx, sy = (9 + 0.1) / g, (9 + 0.1) / g
    ours = np.asarray(resize_2d(jnp.asarray(x), (9, 9), "bicubic",
                                align_corners=False, scale=(sx, sy)))
    t = torch.from_numpy(x).permute(2, 0, 1)[None]
    theirs = F.interpolate(t, scale_factor=(sx, sy), mode="bicubic",
                           align_corners=False)
    theirs = theirs[0].permute(1, 2, 0).numpy()
    assert theirs.shape == ours.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_block_conv_transpose_matches_torch():
    rs = np.random.RandomState(2)
    cin, cout, k = 5, 4, 3
    x = rs.randn(2, 6, 7, cin).astype(np.float32)
    w = rs.randn(cin, cout, k, k).astype(np.float32)   # torch layout
    b = rs.randn(cout).astype(np.float32)

    mod = BlockConvTranspose(cout, k)
    params = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 0, 1))),
              "bias": jnp.asarray(b)}
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    theirs = F.conv_transpose2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                                torch.from_numpy(w), torch.from_numpy(b),
                                stride=k)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# full-model parity vs a compact torch replica
# --------------------------------------------------------------------------

class _TAttn(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.num_heads = h
        self.qkv = tnn.Linear(d, 3 * d)
        self.proj = tnn.Linear(d, d)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                  C // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (C // self.num_heads) ** -0.5, qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(B, N, C))


class _TLS(tnn.Module):
    def __init__(self, d):
        super().__init__()
        self.gamma = tnn.Parameter(torch.ones(d))

    def forward(self, x):
        return x * self.gamma


class _TMlp(tnn.Module):
    def __init__(self, d, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(d, hidden)
        self.fc2 = tnn.Linear(hidden, d)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _TBlock(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)
        self.attn = _TAttn(d, h)
        self.ls1 = _TLS(d)
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)
        self.mlp = _TMlp(d, 4 * d)
        self.ls2 = _TLS(d)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


class _TPatchEmbed(tnn.Module):
    def __init__(self, d, p):
        super().__init__()
        self.proj = tnn.Conv2d(3, d, kernel_size=p, stride=p)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class _TDino(tnn.Module):
    def __init__(self, d, depth, h, p, grid):
        super().__init__()
        self.patch_size, self.grid = p, grid
        self.patch_embed = _TPatchEmbed(d, p)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = tnn.Parameter(torch.zeros(1, grid * grid + 1, d))
        self.blocks = tnn.ModuleList([_TBlock(d, h) for _ in range(depth)])
        self.norm = tnn.LayerNorm(d, eps=1e-6)

    def _pos(self, ph, pw, d):
        if (ph, pw) == (self.grid, self.grid):
            return self.pos_embed
        cls_pos, patch_pos = self.pos_embed[:, :1], self.pos_embed[:, 1:]
        sx, sy = (ph + 0.1) / self.grid, (pw + 0.1) / self.grid
        grid = patch_pos.reshape(1, self.grid, self.grid, d).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, scale_factor=(sx, sy), mode="bicubic",
                             align_corners=False)
        return torch.cat([cls_pos,
                          grid.permute(0, 2, 3, 1).reshape(1, -1, d)], dim=1)

    def forward_intermediates(self, x, idx):
        B, _, H, W = x.shape
        ph, pw = H // self.patch_size, W // self.patch_size
        t = self.patch_embed(x)
        t = torch.cat([self.cls_token.expand(B, -1, -1), t], dim=1)
        t = t + self._pos(ph, pw, t.shape[-1])
        outs = []
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in idx:
                y = self.norm(t)
                outs.append((y[:, 1:], y[:, 0]))
        return outs


class _TRCU(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = tnn.Conv2d(f, f, 3, padding=1)
        self.conv2 = tnn.Conv2d(f, f, 3, padding=1)

    def forward(self, x):
        return x + self.conv2(F.relu(self.conv1(F.relu(x))))


class _TFusion(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.resConfUnit1 = _TRCU(f)
        self.resConfUnit2 = _TRCU(f)
        self.out_conv = tnn.Conv2d(f, f, 1)

    def forward(self, x, res=None, size=None):
        if res is not None:
            x = x + self.resConfUnit1(res)
        x = self.resConfUnit2(x)
        kw = {"scale_factor": 2} if size is None else {"size": size}
        x = F.interpolate(x, mode="bilinear", align_corners=True, **kw)
        return self.out_conv(x)


class _TScratch(tnn.Module):
    def __init__(self, oc, f):
        super().__init__()
        for i in range(4):
            setattr(self, f"layer{i + 1}_rn",
                    tnn.Conv2d(oc[i], f, 3, padding=1, bias=False))
        for i in range(1, 5):
            setattr(self, f"refinenet{i}", _TFusion(f))
        self.output_conv1 = tnn.Conv2d(f, f // 2, 3, padding=1)
        self.output_conv2 = tnn.Sequential(
            tnn.Conv2d(f // 2, 32, 3, padding=1), tnn.ReLU(True),
            tnn.Conv2d(32, 1, 1), tnn.ReLU(True))


class _TDPT(tnn.Module):
    def __init__(self, d, f, oc, p):
        super().__init__()
        self.p = p
        self.projects = tnn.ModuleList([tnn.Conv2d(d, o, 1) for o in oc])
        self.resize_layers = tnn.ModuleList([
            tnn.ConvTranspose2d(oc[0], oc[0], 4, stride=4),
            tnn.ConvTranspose2d(oc[1], oc[1], 2, stride=2),
            tnn.Identity(),
            tnn.Conv2d(oc[3], oc[3], 3, stride=2, padding=1)])
        self.scratch = _TScratch(oc, f)

    def forward(self, feats, ph, pw):
        outs = []
        for i, (tok, _cls) in enumerate(feats):
            x = tok.permute(0, 2, 1).reshape(tok.shape[0], -1, ph, pw)
            outs.append(self.resize_layers[i](self.projects[i](x)))
        rn = [getattr(self.scratch, f"layer{i + 1}_rn")(outs[i])
              for i in range(4)]
        path = self.scratch.refinenet4(rn[3], size=rn[2].shape[2:])
        path = self.scratch.refinenet3(path, rn[2], size=rn[1].shape[2:])
        path = self.scratch.refinenet2(path, rn[1], size=rn[0].shape[2:])
        path = self.scratch.refinenet1(path, rn[0])
        x = self.scratch.output_conv1(path)
        x = F.interpolate(x, (ph * self.p, pw * self.p), mode="bilinear",
                          align_corners=True)
        return F.relu(self.scratch.output_conv2(x))


class _TorchDepthAnything(tnn.Module):
    def __init__(self, d=32, depth=4, h=2, f=8, oc=(8, 16, 16, 16), p=14,
                 grid=2, idx=(0, 1, 2, 3)):
        super().__init__()
        self.idx = idx
        self.pretrained = _TDino(d, depth, h, p, grid)
        self.depth_head = _TDPT(d, f, oc, p)

    def forward(self, x):
        ph, pw = x.shape[-2] // 14, x.shape[-1] // 14
        feats = self.pretrained.forward_intermediates(x, self.idx)
        return F.relu(self.depth_head(feats, ph, pw)).squeeze(1)


@pytest.mark.parametrize("hw", [(28, 28), (42, 28)])
def test_depth_anything_parity(hw):
    """flax port + converter vs the torch replica (pos-embed interpolation is
    exercised by the 42x28 case)."""
    torch.manual_seed(0)
    tmodel = _TorchDepthAnything()
    for p in tmodel.parameters():          # non-trivial weights everywhere
        with torch.no_grad():
            p.add_(torch.randn_like(p) * 0.05)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    fmodel = DepthAnythingV2(embed_dim=32, depth=4, num_heads=2, features=8,
                             out_channels=(8, 16, 16, 16),
                             intermediate_layer_idx=(0, 1, 2, 3), pos_grid=2)
    params = convert_depth_anything(sd)

    rs = np.random.RandomState(3)
    x = rs.rand(2, hw[0], hw[1], 3).astype(np.float32)
    ours = np.asarray(fmodel.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


# --------------------------------------------------------------------------
# host wrapper + preprocess integration
# --------------------------------------------------------------------------

def _tiny_annotator():
    import fastgen_tpu.networks.annotators.depth_anything_v2 as dav2
    dav2._VIT_PRESETS["tiny"] = dict(
        embed_dim=16, depth=2, num_heads=2, intermediate_layer_idx=(0, 0, 1, 1),
        out_channels=(8, 8, 8, 8), features=8)
    return DepthAnnotator(variant="tiny", input_size=28)


def test_depth_annotator_video_shapes():
    ann = _tiny_annotator()
    video = np.random.RandomState(0).rand(1, 2, 20, 24, 3).astype(np.float32)
    depth = np.asarray(ann(video))
    assert depth.shape == (1, 2, 20, 24, 3)
    assert np.isfinite(depth).all()
    assert depth.min() >= 0.0 and depth.max() <= 1.0
    # 3-channel grayscale: channels identical (ref :78-79)
    np.testing.assert_array_equal(depth[..., 0], depth[..., 1])
    # image batch path
    img = np.asarray(ann(video[:, 0]))
    assert img.shape == (1, 20, 24, 3)


def test_preprocess_vid2vid_depth(monkeypatch):
    from fastgen_tpu.data.preprocess import preprocess_data
    from fastgen_tpu.networks.encoders.wrappers import VideoVAEWrapper

    class _V2VNet:
        is_i2v = False
        is_vid2vid = True
        is_video2world = False

    class _Model:
        input_shape = (3, 8, 8, 4)
        net = _V2VNet()
        vae = VideoVAEWrapper(base_ch=8, ch_mult=(1, 2), latent_channels=4,
                              temporal_downsample=(True,), dtype=jnp.float32,
                              example_shape=(5, 16, 16))
        text_encoder = None
        image_encoder = None
        depth_annotator = _tiny_annotator()
        precision = jnp.float32
        precision_amp_enc = None

    data = {"real": np.random.RandomState(0).uniform(
        -1, 1, (1, 5, 16, 16, 3)).astype(np.float32)}
    out = preprocess_data(_Model(), data, rng=jax.random.PRNGKey(0))
    ctx = out["condition"]["vid_context"]
    assert ctx.shape == (1, 3, 8, 8, 4)      # VAE latent space
    assert np.isfinite(np.asarray(ctx)).all()
