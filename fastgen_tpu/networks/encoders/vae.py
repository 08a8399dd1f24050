"""SD-style KL autoencoder (flax, NHWC) + diffusers-weight converter.

Counterpart of the reference's frozen VAEs: ``SDVAE`` for DiT latents
(``DiT/network.py:794-837``) and the diffusers ``AutoencoderKL`` used by
SD1.5/SDXL/Flux pipelines. Encoder downsamples 8x spatially to
``2*latent_channels`` (mean, logvar); ``encode`` supports ``sample`` /
``argmax`` modes like the reference (``trainer.py:433`` uses argmax for
conditioning frames) and applies ``(z - shift) * scale``; ``decode`` inverts.

Layout: images [B, H, W, C] in/out (TPU conv layout); latents [B, h, w, zc].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


def _groups(c: int) -> int:
    """32 groups like diffusers; shrink for toy test widths."""
    return 32 if c % 32 == 0 else max(g for g in (16, 8, 4, 2, 1) if c % g == 0)


class ResnetBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(_groups(x.shape[-1]), epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(h)
        h = nn.GroupNorm(_groups(self.out_ch), epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over spatial positions (VAE mid block)."""

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        y = nn.GroupNorm(_groups(c), epsilon=1e-6, name="group_norm")(x).reshape(b, hh * ww, c)
        q = nn.Dense(c, name="to_q")(y)
        k = nn.Dense(c, name="to_k")(y)
        v = nn.Dense(c, name="to_v")(y)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32) * (c ** -0.5)
        att = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        y = jnp.einsum("bqk,bkc->bqc", att, v)
        y = nn.Dense(c, name="to_out")(y).reshape(b, hh, ww, c)
        return x + y


class VAEEncoder(nn.Module):
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    base_ch: int = 128
    latent_channels: int = 4
    layers_per_block: int = 2

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.base_ch, (3, 3), padding=1, name="conv_in")(x)
        for lvl, m in enumerate(self.ch_mult):
            for j in range(self.layers_per_block):
                x = ResnetBlock(self.base_ch * m, name=f"down_{lvl}_block_{j}")(x)
            if lvl != len(self.ch_mult) - 1:
                # diffusers pads (0,1,0,1) then convs stride-2 with VALID
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                            name=f"down_{lvl}_downsample")(x)
        c = self.base_ch * self.ch_mult[-1]
        x = ResnetBlock(c, name="mid_block_0")(x)
        x = AttnBlock(name="mid_attn")(x)
        x = ResnetBlock(c, name="mid_block_1")(x)
        x = nn.GroupNorm(_groups(x.shape[-1]), epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * self.latent_channels, (3, 3), padding=1, name="conv_out")(x)
        return nn.Conv(2 * self.latent_channels, (1, 1), name="quant_conv")(x)


class VAEDecoder(nn.Module):
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    base_ch: int = 128
    latent_channels: int = 4
    out_channels: int = 3
    layers_per_block: int = 3

    @nn.compact
    def __call__(self, z):
        z = nn.Conv(self.latent_channels, (1, 1), name="post_quant_conv")(z)
        c = self.base_ch * self.ch_mult[-1]
        x = nn.Conv(c, (3, 3), padding=1, name="conv_in")(z)
        x = ResnetBlock(c, name="mid_block_0")(x)
        x = AttnBlock(name="mid_attn")(x)
        x = ResnetBlock(c, name="mid_block_1")(x)
        for lvl, m in enumerate(reversed(self.ch_mult)):
            for j in range(self.layers_per_block):
                x = ResnetBlock(self.base_ch * m, name=f"up_{lvl}_block_{j}")(x)
            if lvl != len(self.ch_mult) - 1:
                b, hh, ww, cc = x.shape
                x = jax.image.resize(x, (b, hh * 2, ww * 2, cc), "nearest")
                x = nn.Conv(cc, (3, 3), padding=1, name=f"up_{lvl}_upsample")(x)
        x = nn.GroupNorm(_groups(x.shape[-1]), epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """Full VAE. ``scaling_factor``: 0.18215 (SD1.5/DiT), 0.13025 (SDXL),
    0.3611 + shift 0.1159 (Flux)."""

    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    base_ch: int = 128
    latent_channels: int = 4
    out_channels: int = 3
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0

    def setup(self):
        self.encoder = VAEEncoder(self.ch_mult, self.base_ch, self.latent_channels)
        self.decoder = VAEDecoder(self.ch_mult, self.base_ch, self.latent_channels,
                                  self.out_channels)

    def encode(self, x, rng: Optional[jax.Array] = None, mode: str = "sample"):
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if mode == "sample":
            if rng is None:
                raise ValueError("encode(mode='sample') needs an rng key")
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return (mean - self.shift_factor) * self.scaling_factor

    def decode(self, z):
        return self.decoder(z / self.scaling_factor + self.shift_factor)

    def __call__(self, x, rng=None):
        """Reconstruction roundtrip (used for init/tests)."""
        return self.decode(self.encode(x, rng, mode="argmax"))


# --------------------------------------------------------------------------
# diffusers AutoencoderKL state dict -> flax params
# --------------------------------------------------------------------------

def convert_autoencoder_kl(sd: dict) -> dict:
    """Map a diffusers ``AutoencoderKL`` state dict (``vae.*`` keys allowed)."""
    p: dict = {}

    def put(path, v):
        node = p
        parts = path.split(".")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = np.asarray(v)

    def conv(w):
        return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))

    def dense(w):
        w = np.asarray(w)
        if w.ndim == 4:  # old ckpts store attention projs as 1x1 convs
            w = w[:, :, 0, 0]
        return np.ascontiguousarray(w.T)

    sd = {k[4:] if k.startswith("vae.") else k: v for k, v in sd.items()}

    def res(dst, src):
        put(f"{dst}.norm1.scale", sd[f"{src}.norm1.weight"])
        put(f"{dst}.norm1.bias", sd[f"{src}.norm1.bias"])
        put(f"{dst}.conv1.kernel", conv(sd[f"{src}.conv1.weight"]))
        put(f"{dst}.conv1.bias", sd[f"{src}.conv1.bias"])
        put(f"{dst}.norm2.scale", sd[f"{src}.norm2.weight"])
        put(f"{dst}.norm2.bias", sd[f"{src}.norm2.bias"])
        put(f"{dst}.conv2.kernel", conv(sd[f"{src}.conv2.weight"]))
        put(f"{dst}.conv2.bias", sd[f"{src}.conv2.bias"])
        if f"{src}.conv_shortcut.weight" in sd:
            put(f"{dst}.conv_shortcut.kernel", conv(sd[f"{src}.conv_shortcut.weight"]))
            put(f"{dst}.conv_shortcut.bias", sd[f"{src}.conv_shortcut.bias"])

    def attn(dst, src):
        put(f"{dst}.group_norm.scale", sd[f"{src}.group_norm.weight"])
        put(f"{dst}.group_norm.bias", sd[f"{src}.group_norm.bias"])
        for ours, theirs in (("to_q", "to_q"), ("to_k", "to_k"),
                             ("to_v", "to_v"), ("to_out", "to_out.0")):
            put(f"{dst}.{ours}.kernel", dense(sd[f"{src}.{theirs}.weight"]))
            put(f"{dst}.{ours}.bias", np.asarray(sd[f"{src}.{theirs}.bias"]))

    n_levels = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("encoder.down_blocks."))
    # encoder
    put("encoder.conv_in.kernel", conv(sd["encoder.conv_in.weight"]))
    put("encoder.conv_in.bias", sd["encoder.conv_in.bias"])
    for lvl in range(n_levels):
        j = 0
        while f"encoder.down_blocks.{lvl}.resnets.{j}.conv1.weight" in sd:
            res(f"encoder.down_{lvl}_block_{j}", f"encoder.down_blocks.{lvl}.resnets.{j}")
            j += 1
        dkey = f"encoder.down_blocks.{lvl}.downsamplers.0.conv.weight"
        if dkey in sd:
            put(f"encoder.down_{lvl}_downsample.kernel", conv(sd[dkey]))
            put(f"encoder.down_{lvl}_downsample.bias",
                sd[dkey.replace("weight", "bias")])
    res("encoder.mid_block_0", "encoder.mid_block.resnets.0")
    res("encoder.mid_block_1", "encoder.mid_block.resnets.1")
    attn("encoder.mid_attn", "encoder.mid_block.attentions.0")
    put("encoder.conv_norm_out.scale", sd["encoder.conv_norm_out.weight"])
    put("encoder.conv_norm_out.bias", sd["encoder.conv_norm_out.bias"])
    put("encoder.conv_out.kernel", conv(sd["encoder.conv_out.weight"]))
    put("encoder.conv_out.bias", sd["encoder.conv_out.bias"])
    put("encoder.quant_conv.kernel", conv(sd["quant_conv.weight"]))
    put("encoder.quant_conv.bias", sd["quant_conv.bias"])
    # decoder
    put("decoder.post_quant_conv.kernel", conv(sd["post_quant_conv.weight"]))
    put("decoder.post_quant_conv.bias", sd["post_quant_conv.bias"])
    put("decoder.conv_in.kernel", conv(sd["decoder.conv_in.weight"]))
    put("decoder.conv_in.bias", sd["decoder.conv_in.bias"])
    res("decoder.mid_block_0", "decoder.mid_block.resnets.0")
    res("decoder.mid_block_1", "decoder.mid_block.resnets.1")
    attn("decoder.mid_attn", "decoder.mid_block.attentions.0")
    for lvl in range(n_levels):
        j = 0
        while f"decoder.up_blocks.{lvl}.resnets.{j}.conv1.weight" in sd:
            res(f"decoder.up_{lvl}_block_{j}", f"decoder.up_blocks.{lvl}.resnets.{j}")
            j += 1
        ukey = f"decoder.up_blocks.{lvl}.upsamplers.0.conv.weight"
        if ukey in sd:
            put(f"decoder.up_{lvl}_upsample.kernel", conv(sd[ukey]))
            put(f"decoder.up_{lvl}_upsample.bias", sd[ukey.replace("weight", "bias")])
    put("decoder.conv_norm_out.scale", sd["decoder.conv_norm_out.weight"])
    put("decoder.conv_norm_out.bias", sd["decoder.conv_norm_out.bias"])
    put("decoder.conv_out.kernel", conv(sd["decoder.conv_out.weight"]))
    put("decoder.conv_out.bias", sd["decoder.conv_out.bias"])
    return p
