"""EDM networks (SongUNet / DhariwalUNet + EDMPrecond) in flax.linen, NHWC.

TPU-native rebuild of ``fastgen/networks/EDM/network.py``:

* layout is NHWC (TPU conv layout) instead of torch NCHW; conv kernels are
  HWIO, so torch checkpoints convert by transposing OIHW->HWIO;
* initializers reproduce EDM's ``weight_init`` modes (xavier_uniform/
  kaiming_normal/...; ref ``EDM/network.py:20-31``) so trained-from-scratch
  runs match the reference recipes;
* attention uses fp32 softmax like the reference's ``AttentionOp``
  (ref ``EDM/network.py:160-196``); resolutions here are tiny (16x16 tokens),
  XLA fuses this fine — the Pallas flash-attention path in ops/ is for the
  long-sequence DiT/video backbones;
* feature extraction for discriminators (ref ``EDM/network.py:537-545``) is a
  static argument: jit compiles a features-only program when
  ``return_features_early=True`` instead of branching at runtime;
* ``EDMPrecond`` applies c_in/c_skip/c_out preconditioning
  (ref ``EDM/network.py:755-805``) and converts the output pred type via the
  noise-schedule algebra.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.network import FastGenNetwork
from fastgen_tpu.ops.schedules import NET_PRED_TYPES
from fastgen_tpu.utils import expand_like


# ----------------------------------------------------------------------------
# EDM weight initializers (ref ``EDM/network.py:20-31``)

def edm_init(mode: str, scale: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        # fan_in/fan_out over all but the output-channel axis; for HWIO conv
        # kernels the output axis is -1, for [in, out] dense kernels also -1.
        fan_out = shape[-1]
        fan_in = int(np.prod(shape)) // max(fan_out, 1)
        if mode == "xavier_uniform":
            w = jax.random.uniform(key, shape, dtype, -1.0, 1.0) * np.sqrt(6 / (fan_in + fan_out))
        elif mode == "xavier_normal":
            w = jax.random.normal(key, shape, dtype) * np.sqrt(2 / (fan_in + fan_out))
        elif mode == "kaiming_uniform":
            w = jax.random.uniform(key, shape, dtype, -1.0, 1.0) * np.sqrt(3 / fan_in)
        elif mode == "kaiming_normal":
            w = jax.random.normal(key, shape, dtype) * np.sqrt(1 / fan_in)
        else:
            raise ValueError(f"Invalid init mode {mode!r}")
        return w * scale

    return init


def edm_bias_init(mode: str, fan_in: int, scale: float):
    """Bias init uses the layer's weight fan_in (ref Linear/Conv2d bias init)."""
    def init(key, shape, dtype=jnp.float32):
        fake_shape = (fan_in,) + tuple(shape)  # fan computed as prod/last = fan_in
        w = edm_init(mode, scale)(key, (fan_in, shape[0]), dtype)
        del fake_shape
        return w[0]

    return init


class EDMLinear(nn.Module):
    """Dense layer with EDM init. Param 'kernel' is [in, out] (flax layout)."""

    features: int
    use_bias: bool = True
    init_mode: str = "kaiming_normal"
    init_weight: float = 1.0
    init_bias: float = 0.0

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", edm_init(self.init_mode, self.init_weight),
                            (in_features, self.features))
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", edm_bias_init(self.init_mode, in_features, self.init_bias),
                              (self.features,))
            y = y + bias.astype(x.dtype)
        return y


def _resample_kernel(resample_filter: Sequence[float]) -> np.ndarray:
    f = np.asarray(resample_filter, dtype=np.float32)
    f2 = np.outer(f, f) / (f.sum() ** 2)
    return f2  # [k, k]


def _depthwise(x, f2: np.ndarray, stride: int, padding: int, lhs_dilation: int = 1):
    """Depthwise conv with a fixed spatial filter, NHWC."""
    c = x.shape[-1]
    w = jnp.asarray(f2, x.dtype)[:, :, None, None] * jnp.ones((1, 1, 1, c), x.dtype)
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        lhs_dilation=(lhs_dilation, lhs_dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


class EDMConv2d(nn.Module):
    """Conv with optional 2x up/down resampling (ref ``EDM/network.py:58-126``).

    kernel=0 means resample-only (no learned weights). Up-sampling is the
    fractionally-strided depthwise filter conv (f*4, symmetric filters so no
    flip needed); down-sampling is a strided depthwise filter conv.
    """

    features: int
    kernel: int = 3
    use_bias: bool = True
    up: bool = False
    down: bool = False
    resample_filter: Tuple[float, ...] = (1, 1)
    fused_resample: bool = False
    init_mode: str = "kaiming_normal"
    init_weight: float = 1.0
    init_bias: float = 0.0

    @nn.compact
    def __call__(self, x):
        assert not (self.up and self.down)
        in_ch = x.shape[-1]
        w = None
        if self.kernel:
            w = self.param(
                "kernel", edm_init(self.init_mode, self.init_weight),
                (self.kernel, self.kernel, in_ch, self.features)).astype(x.dtype)
        f2 = _resample_kernel(self.resample_filter)
        fk = f2.shape[0]
        w_pad = self.kernel // 2 if self.kernel else 0
        f_pad = (fk - 1) // 2

        def conv(x, w, padding):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1),
                padding=[(padding, padding), (padding, padding)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def up2(x, padding):
            # conv_transpose(stride 2, filter f*4, pad p) == dilated conv with
            # lhs_dilation=2 and padding (fk-1-p) for symmetric filters
            return _depthwise(x, f2 * 4.0, stride=1, padding=fk - 1 - padding, lhs_dilation=2)

        if self.fused_resample and self.up and w is not None:
            x = up2(x, max(f_pad - w_pad, 0))
            x = conv(x, w, max(w_pad - f_pad, 0))
        elif self.fused_resample and self.down and w is not None:
            x = conv(x, w, w_pad + f_pad)
            x = _depthwise(x, f2, stride=2, padding=0)
        else:
            if self.up:
                x = up2(x, f_pad)
            if self.down:
                x = _depthwise(x, f2, stride=2, padding=f_pad)
            if w is not None:
                x = conv(x, w, w_pad)
        if self.kernel and self.use_bias:
            b = self.param("bias", edm_bias_init(self.init_mode, in_ch * self.kernel**2,
                                                 self.init_bias), (self.features,))
            x = x + b.astype(x.dtype)
        return x


class EDMGroupNorm(nn.Module):
    """GroupNorm with EDM's group-count rule, fp32 statistics (ref ``:133-149``).

    TPU-tuned: statistics use fp32 *accumulating reductions* on the native
    dtype (E[x^2]-E[x]^2 form) instead of materializing an fp32 copy of the
    activations — on v5e this cut the EDM UNet forward from 106 to 74 ms
    (GroupNorm was ~33% of wall-clock). A Pallas single-pass fused kernel was
    built, A/B-benched on the 4-step sampler, and DELETED: 606 vs 917
    samples/s (quality/bench/fused_gn_ab.jsonl) — a standalone GN kernel
    forfeits XLA's fusion with the surrounding conv/SiLU and loses 34%.
    Let the compiler fuse what the compiler fuses better.
    """

    num_groups: int = 32
    min_channels_per_group: int = 4
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        groups = min(self.num_groups, c // self.min_channels_per_group)
        weight = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        shape = x.shape[:-1] + (groups, c // groups)
        xg = x.reshape(shape)
        reduce_axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        mean = jnp.mean(xg, axis=reduce_axes, keepdims=True, dtype=jnp.float32)
        msq = jnp.mean(jax.lax.square(xg.astype(jnp.float32)),
                       axis=reduce_axes, keepdims=True)
        rstd = jax.lax.rsqrt(msq - mean * mean + self.eps)
        xn = (xg.astype(jnp.float32) - mean) * rstd
        y = xn.reshape(x.shape) * weight + bias
        return y.astype(x.dtype)


def _attention(x, qkv_out, num_heads: int):
    """Self-attention over H*W tokens with fp32 softmax (ref ``AttentionOp``)."""
    b, h, w, c3 = qkv_out.shape
    c = c3 // 3
    head_dim = c // num_heads
    qkv = qkv_out.reshape(b, h * w, 3, num_heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b, n, heads, d]
    scale = 1.0 / np.sqrt(head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out.reshape(b, h, w, c)


class UNetBlock(nn.Module):
    """Unified DDPM++/NCSN++/ADM residual block (ref ``EDM/network.py:205-299``)."""

    out_channels: int
    emb_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    num_heads: Optional[int] = None
    channels_per_head: int = 64
    dropout: float = 0.0
    skip_scale: float = 1.0
    eps: float = 1e-5
    resample_filter: Tuple[float, ...] = (1, 1)
    resample_proj: bool = False
    adaptive_scale: bool = True
    init_cfg: dict = dataclasses.field(default_factory=dict)
    init_zero_cfg: dict = dataclasses.field(default_factory=lambda: dict(init_weight=0))
    init_attn_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, emb, train: bool = False):
        in_channels = x.shape[-1]
        num_heads = (0 if not self.attention else
                     self.num_heads if self.num_heads is not None
                     else self.out_channels // self.channels_per_head)
        init = dict(self.init_cfg)
        init_zero = dict(self.init_zero_cfg)
        init_attn = dict(self.init_attn_cfg) if self.init_attn_cfg is not None else init

        orig = x
        x = EDMConv2d(self.out_channels, kernel=3, up=self.up, down=self.down,
                      resample_filter=self.resample_filter, name="conv0", **init)(
            nn.silu(EDMGroupNorm(eps=self.eps, name="norm0")(x)))

        affine_features = self.out_channels * (2 if self.adaptive_scale else 1)
        params = EDMLinear(affine_features, name="affine", **init)(emb)
        params = params[:, None, None, :].astype(x.dtype)
        if self.adaptive_scale:
            scale, shift = jnp.split(params, 2, axis=-1)
            x = nn.silu(shift + EDMGroupNorm(eps=self.eps, name="norm1")(x) * (scale + 1))
        else:
            x = nn.silu(EDMGroupNorm(eps=self.eps, name="norm1")(x + params))

        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = EDMConv2d(self.out_channels, kernel=3, name="conv1", **init_zero)(x)

        if self.out_channels != in_channels or self.up or self.down:
            kernel = 1 if self.resample_proj or self.out_channels != in_channels else 0
            skip = EDMConv2d(self.out_channels, kernel=kernel, up=self.up, down=self.down,
                             resample_filter=self.resample_filter, name="skip", **init)(orig)
        else:
            skip = orig
        x = (x + skip) * self.skip_scale

        if num_heads:
            qkv = EDMConv2d(self.out_channels * 3, kernel=1, name="qkv", **init_attn)(
                EDMGroupNorm(eps=self.eps, name="norm2")(x))
            a = _attention(x, qkv, num_heads)
            x = (EDMConv2d(self.out_channels, kernel=1, name="proj", **init_zero)(a) + x)
            x = x * self.skip_scale
        return x


class PositionalEmbedding(nn.Module):
    """DDPM++/ADM timestep embedding (ref ``EDM/network.py:306-319``)."""

    num_channels: int
    max_positions: int = 10000
    endpoint: bool = False

    def __call__(self, x):
        half = self.num_channels // 2
        freqs = jnp.arange(half, dtype=jnp.float32)
        freqs = freqs / (half - (1 if self.endpoint else 0))
        freqs = (1 / self.max_positions) ** freqs
        args = jnp.outer(x, freqs.astype(x.dtype))
        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)


class FourierEmbedding(nn.Module):
    """NCSN++ Fourier embedding with fixed random freqs (ref ``:326-336``)."""

    num_channels: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, x):
        freqs = self.param("freqs",
                           lambda key, shape: jax.random.normal(key, shape) * self.scale,
                           (self.num_channels // 2,))
        args = jnp.outer(x, 2 * np.pi * freqs.astype(x.dtype))
        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)


def _swap_sin_cos(emb):
    """[cos|sin] -> [sin|cos] (ref ``EDM/network.py:503``)."""
    b, c = emb.shape
    return emb.reshape(b, 2, c // 2)[:, ::-1].reshape(b, c)


class SongUNet(nn.Module):
    """DDPM++/NCSN++ U-Net (ref ``EDM/network.py:346-574``). NHWC."""

    img_resolution: int
    in_channels: int
    out_channels: int
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 2, 2)
    channel_mult_emb: int = 4
    num_blocks: int = 4
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.10
    label_dropout: float = 0.0
    embedding_type: str = "positional"
    channel_mult_noise: int = 1
    encoder_type: str = "standard"
    decoder_type: str = "standard"
    resample_filter: Tuple[float, ...] = (1, 1)
    r_timestep: bool = False

    def setup(self):
        assert self.embedding_type in ("fourier", "positional")
        assert self.encoder_type in ("standard", "skip", "residual")
        assert self.decoder_type in ("standard", "skip")
        emb_channels = self.model_channels * self.channel_mult_emb
        noise_channels = self.model_channels * self.channel_mult_noise
        cond_channels = noise_channels * (1 + int(self.r_timestep))
        init = dict(init_mode="xavier_uniform")
        init_zero = dict(init_mode="xavier_uniform", init_weight=1e-5)
        init_attn = dict(init_mode="xavier_uniform", init_weight=float(np.sqrt(0.2)))
        block_kwargs = dict(
            emb_channels=emb_channels, num_heads=1, dropout=self.dropout,
            skip_scale=float(np.sqrt(0.5)), eps=1e-6,
            resample_filter=tuple(self.resample_filter), resample_proj=True,
            adaptive_scale=False, init_cfg=init, init_zero_cfg=init_zero, init_attn_cfg=init_attn)

        if self.embedding_type == "positional":
            self.map_noise = PositionalEmbedding(noise_channels, endpoint=True)
            self.map_r = PositionalEmbedding(noise_channels, endpoint=True) if self.r_timestep else None
        else:
            self.map_noise = FourierEmbedding(noise_channels)
            self.map_r = FourierEmbedding(noise_channels) if self.r_timestep else None

        self.map_label = (EDMLinear(cond_channels, **init) if self.label_dim else None)
        self.map_augment = (EDMLinear(cond_channels, use_bias=False, **init)
                            if self.augment_dim else None)
        self.map_layer0 = EDMLinear(emb_channels, **init)
        self.map_layer1 = EDMLinear(emb_channels, **init)

        # Encoder: ordered (name, module) pairs; param scope name "enc_<name>"
        enc = {}
        cout = self.in_channels
        caux = self.in_channels
        for level, mult in enumerate(self.channel_mult):
            res = self.img_resolution >> level
            if level == 0:
                cout = self.model_channels
                enc[f"{res}x{res}_conv"] = EDMConv2d(cout, kernel=3, **init)
            else:
                enc[f"{res}x{res}_down"] = UNetBlock(cout, down=True, **block_kwargs)
                if self.encoder_type == "skip":
                    enc[f"{res}x{res}_aux_down"] = EDMConv2d(
                        caux, kernel=0, down=True, resample_filter=tuple(self.resample_filter))
                    enc[f"{res}x{res}_aux_skip"] = EDMConv2d(cout, kernel=1, **init)
                if self.encoder_type == "residual":
                    enc[f"{res}x{res}_aux_residual"] = EDMConv2d(
                        cout, kernel=3, down=True, resample_filter=tuple(self.resample_filter),
                        fused_resample=True, **init)
                    caux = cout
            for idx in range(self.num_blocks):
                cout = self.model_channels * mult
                attn = res in self.attn_resolutions
                enc[f"{res}x{res}_block{idx}"] = UNetBlock(cout, attention=attn, **block_kwargs)
        self.enc = enc

        dec = {}
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = self.img_resolution >> level
            if level == len(self.channel_mult) - 1:
                dec[f"{res}x{res}_in0"] = UNetBlock(cout, attention=True, **block_kwargs)
                dec[f"{res}x{res}_in1"] = UNetBlock(cout, **block_kwargs)
            else:
                dec[f"{res}x{res}_up"] = UNetBlock(cout, up=True, **block_kwargs)
            for idx in range(self.num_blocks + 1):
                cout = self.model_channels * mult
                attn = idx == self.num_blocks and res in self.attn_resolutions
                dec[f"{res}x{res}_block{idx}"] = UNetBlock(cout, attention=attn, **block_kwargs)
            if self.decoder_type == "skip" or level == 0:
                if self.decoder_type == "skip" and level < len(self.channel_mult) - 1:
                    dec[f"{res}x{res}_aux_up"] = EDMConv2d(
                        self.out_channels, kernel=0, up=True,
                        resample_filter=tuple(self.resample_filter))
                dec[f"{res}x{res}_aux_norm"] = EDMGroupNorm(eps=1e-6)
                dec[f"{res}x{res}_aux_conv"] = EDMConv2d(self.out_channels, kernel=3, **init_zero)
        self.dec = dec
        self.logvar_linear = EDMLinear(1)

    def __call__(self, x, noise_labels, class_labels=None, r_noise_labels=None,
                 augment_labels=None, return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (), return_logvar: bool = False,
                 train: bool = False):
        emb_timestep = self.map_noise(noise_labels)
        emb = _swap_sin_cos(emb_timestep)
        if r_noise_labels is not None:
            if self.map_r is None:
                raise ValueError("r_noise_labels provided, but r_timestep is not set")
            emb = jnp.concatenate([emb, _swap_sin_cos(self.map_r(r_noise_labels))], axis=-1)

        if self.map_label is not None:
            tmp = class_labels
            if train and self.label_dropout:
                keep = (jax.random.uniform(self.make_rng("dropout"), (x.shape[0], 1))
                        >= self.label_dropout).astype(tmp.dtype)
                tmp = tmp * keep
            emb = emb + self.map_label(tmp * np.sqrt(self.map_label_in_features))
        if self.map_augment is not None and augment_labels is not None:
            emb = emb + self.map_augment(augment_labels)
        emb = nn.silu(self.map_layer0(emb))
        emb = nn.silu(self.map_layer1(emb))

        # Encoder
        skips = []
        aux = x
        idx, features = 0, []
        for name, block in self.enc.items():
            if "aux_down" in name:
                aux = block(aux)
            elif "aux_skip" in name:
                x = x + block(aux)
                skips[-1] = x
            elif "aux_residual" in name:
                x = (x + block(aux)) / np.sqrt(2)
                aux = x
                skips[-1] = x
            else:
                x = block(x, emb, train=train) if isinstance(block, UNetBlock) else block(x)
                skips.append(x)
                if f"block{self.num_blocks - 1}" in name:
                    if idx in feature_indices:
                        features.append(x)
                    idx += 1

        if return_features_early:
            assert len(features) == len(feature_indices)
            return features

        # Decoder
        aux = None
        tmp = None
        for name, block in self.dec.items():
            if "aux_up" in name:
                aux = block(aux)
            elif "aux_norm" in name:
                tmp = block(x)
            elif "aux_conv" in name:
                tmp = block(nn.silu(tmp))
                aux = tmp if aux is None else tmp + aux
            else:
                if x.shape[-1] != self._dec_in_channels(name):
                    x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = block(x, emb, train=train)

        out = aux if not feature_indices else [aux, features]
        # always materialize the logvar head so the param tree is flag-invariant
        # (XLA dead-code-eliminates it when unused)
        logvar = self.logvar_linear(emb_timestep)
        if return_logvar:
            return out, logvar
        return out

    @property
    def map_label_in_features(self):
        return self.label_dim

    def _dec_in_channels(self, name: str) -> int:
        """Expected input channels of a decoder block, for the skip-concat test."""
        return _compute_dec_in_channels(
            self.img_resolution, self.in_channels, self.model_channels,
            tuple(self.channel_mult), self.num_blocks)[name]


@lru_cache(maxsize=64)
def _compute_dec_in_channels(img_resolution, in_channels, model_channels,
                             channel_mult, num_blocks):
    """Walk the same encoder/decoder plan as setup() to record each decoder
    block's input channel count (used to decide when to pop a skip)."""
    skips = []
    cout = in_channels
    for level, mult in enumerate(channel_mult):
        if level == 0:
            cout = model_channels
            skips.append(cout)
        else:
            skips.append(cout)
        for _ in range(num_blocks):
            cout = model_channels * mult
            skips.append(cout)
    table = {}
    for level, mult in reversed(list(enumerate(channel_mult))):
        res = img_resolution >> level
        if level == len(channel_mult) - 1:
            table[f"{res}x{res}_in0"] = cout
            table[f"{res}x{res}_in1"] = cout
        else:
            table[f"{res}x{res}_up"] = cout
        for idx in range(num_blocks + 1):
            cin = cout + skips.pop()
            table[f"{res}x{res}_block{idx}"] = cin
            cout = model_channels * mult
    return table


class DhariwalUNet(nn.Module):
    """ADM U-Net (ref ``EDM/network.py:584-747``). NHWC."""

    img_resolution: int
    in_channels: int
    out_channels: int
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 192
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    channel_mult_emb: int = 4
    num_blocks: int = 3
    attn_resolutions: Tuple[int, ...] = (32, 16, 8)
    dropout: float = 0.10
    label_dropout: float = 0.0
    r_timestep: bool = False

    def setup(self):
        emb_channels = self.model_channels * self.channel_mult_emb
        init = dict(init_mode="kaiming_uniform", init_weight=float(np.sqrt(1 / 3)),
                    init_bias=float(np.sqrt(1 / 3)))
        init_zero = dict(init_mode="kaiming_uniform", init_weight=0.0, init_bias=0.0)
        block_kwargs = dict(emb_channels=emb_channels, channels_per_head=64,
                            dropout=self.dropout, init_cfg=init, init_zero_cfg=init_zero)

        self.map_noise = PositionalEmbedding(self.model_channels)
        self.map_r = PositionalEmbedding(self.model_channels) if self.r_timestep else None
        self.map_augment = (EDMLinear(self.model_channels * (1 + int(self.r_timestep)),
                                      use_bias=False, **init_zero)
                            if self.augment_dim else None)
        self.map_layer0 = EDMLinear(emb_channels, **init)
        self.map_layer1 = EDMLinear(emb_channels, **init)
        self.map_label = (EDMLinear(emb_channels, use_bias=False,
                                    init_mode="kaiming_normal",
                                    init_weight=float(np.sqrt(self.label_dim)))
                          if self.label_dim else None)

        enc = {}
        cout = self.in_channels
        skips = []
        for level, mult in enumerate(self.channel_mult):
            res = self.img_resolution >> level
            if level == 0:
                cout = self.model_channels * mult
                enc[f"{res}x{res}_conv"] = EDMConv2d(cout, kernel=3, **init)
            else:
                enc[f"{res}x{res}_down"] = UNetBlock(cout, down=True, **block_kwargs)
            skips.append(cout)
            for idx in range(self.num_blocks):
                cout = self.model_channels * mult
                enc[f"{res}x{res}_block{idx}"] = UNetBlock(
                    cout, attention=(res in self.attn_resolutions), **block_kwargs)
                skips.append(cout)
        self.enc = enc

        dec = {}
        dec_in_ch = {}
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = self.img_resolution >> level
            if level == len(self.channel_mult) - 1:
                dec[f"{res}x{res}_in0"] = UNetBlock(cout, attention=True, **block_kwargs)
                dec_in_ch[f"{res}x{res}_in0"] = cout
                dec[f"{res}x{res}_in1"] = UNetBlock(cout, **block_kwargs)
                dec_in_ch[f"{res}x{res}_in1"] = cout
            else:
                dec[f"{res}x{res}_up"] = UNetBlock(cout, up=True, **block_kwargs)
                dec_in_ch[f"{res}x{res}_up"] = cout
            for idx in range(self.num_blocks + 1):
                cin = cout + skips.pop()
                cout = self.model_channels * mult
                dec[f"{res}x{res}_block{idx}"] = UNetBlock(
                    cout, attention=(res in self.attn_resolutions), **block_kwargs)
                dec_in_ch[f"{res}x{res}_block{idx}"] = cin
        self.dec = dec
        self._dec_in_ch_table = dec_in_ch
        self.out_norm = EDMGroupNorm()
        self.out_conv = EDMConv2d(self.out_channels, kernel=3, **init_zero)
        self.logvar_linear = EDMLinear(1)

    def __call__(self, x, noise_labels, class_labels=None, r_noise_labels=None,
                 augment_labels=None, return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (), return_logvar: bool = False,
                 train: bool = False):
        emb_timestep = self.map_noise(noise_labels)
        emb = emb_timestep
        if self.map_r is not None:
            if r_noise_labels is None:
                raise ValueError("r_timestep set but r_noise_labels missing")
            emb = jnp.concatenate([emb, self.map_r(r_noise_labels)], axis=-1)
        if self.map_augment is not None and augment_labels is not None:
            emb = emb + self.map_augment(augment_labels)
        emb = nn.silu(self.map_layer0(emb))
        emb = self.map_layer1(emb)
        if self.map_label is not None:
            tmp = class_labels
            if train and self.label_dropout:
                keep = (jax.random.uniform(self.make_rng("dropout"), (x.shape[0], 1))
                        >= self.label_dropout).astype(tmp.dtype)
                tmp = tmp * keep
            emb = emb + self.map_label(tmp)
        emb = nn.silu(emb)

        skips = []
        idx, features = 0, []
        for name, block in self.enc.items():
            x = block(x, emb, train=train) if isinstance(block, UNetBlock) else block(x)
            if f"block{self.num_blocks - 1}" in name:
                if idx in feature_indices:
                    features.append(x)
                idx += 1
            skips.append(x)

        if return_features_early:
            assert len(features) == len(feature_indices)
            return features

        for name, block in self.dec.items():
            if x.shape[-1] != self._dec_in_ch_table[name]:
                x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = block(x, emb, train=train)
        x = self.out_conv(nn.silu(self.out_norm(x)))

        out = x if not feature_indices else [x, features]
        logvar = self.logvar_linear(emb_timestep)
        if return_logvar:
            return out, logvar
        return out


# ----------------------------------------------------------------------------
# EDM preconditioning (ref ``EDM/network.py:755-805``)

def precond_input(x_t, t, r=None, sigma_data: float = 0.5, eps: float = 1e-5):
    t32 = t.astype(jnp.float32)
    c_in = 1.0 / jnp.sqrt(sigma_data**2 + t32**2)
    x_t = expand_like(c_in.astype(x_t.dtype), x_t) * x_t
    t_out = jnp.log(jnp.maximum(t32, eps)) / 4
    r_out = None if r is None else jnp.log(jnp.maximum(r.astype(jnp.float32), eps)) / 4
    return x_t, t_out, r_out


def precond_output(out, x_t, t, sigma_shift=None, sigma_data: float = 0.5):
    t32 = t.astype(jnp.float32)
    if sigma_shift is not None:
        t32 = t32 - sigma_shift
    c_skip = sigma_data**2 / (t32**2 + sigma_data**2)
    c_out = t32 * sigma_data / jnp.sqrt(t32**2 + sigma_data**2)
    c_skip = expand_like(c_skip.astype(x_t.dtype), x_t)
    c_out = expand_like(c_out.astype(x_t.dtype), x_t)
    return c_skip * x_t + c_out * out


MODEL_TYPES = {"SongUNet": SongUNet, "DhariwalUNet": DhariwalUNet}


class EDMPrecond(FastGenNetwork):
    """EDM preconditioning wrapper (ref ``EDM/network.py:808-1026``)."""

    img_resolution: int = 32
    img_channels: int = 3
    label_dim: int = 0
    sigma_data: float = 0.5
    sigma_shift: float = 0.0
    model_type: str = "DhariwalUNet"
    drop_precond: Optional[str] = None  # 'input' | 'output' | 'both' | None
    model_kwargs: dict = dataclasses.field(default_factory=dict)

    def setup(self):
        if self.drop_precond not in (None, "input", "output", "both"):
            raise ValueError(f"bad drop_precond {self.drop_precond!r}")
        self.model = MODEL_TYPES[self.model_type](
            img_resolution=self.img_resolution,
            in_channels=self.img_channels,
            out_channels=self.img_channels,
            label_dim=self.label_dim,
            name="model",
            **self.model_kwargs)

    def __call__(self, x_t, t, condition=None, r=None,
                 return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (),
                 return_logvar: bool = False,
                 fwd_pred_type: Optional[str] = None,
                 train: bool = False, **fwd_kwargs):
        if return_features_early and not feature_indices:
            return []
        if fwd_pred_type is not None:
            assert fwd_pred_type in NET_PRED_TYPES

        augment_labels = None
        if isinstance(condition, dict) and "aug_condition" in condition:
            augment_labels = condition["aug_condition"]
            condition = condition["orig_condition"]

        if self.label_dim == 0:
            class_labels = None
        elif condition is None:
            class_labels = jnp.zeros((1, self.label_dim), dtype=x_t.dtype)
        else:
            class_labels = condition.reshape(-1, self.label_dim)

        x_t_in, t_in = x_t, t
        if self.drop_precond not in ("input", "both"):
            x_t, t, r = precond_input(x_t, t, r=r, sigma_data=self.sigma_data,
                                      eps=self.noise_scheduler.clamp_min)
        t = t.astype(x_t.dtype)
        r = None if r is None else r.astype(x_t.dtype)

        model_outputs = self.model(
            x_t, t, class_labels=class_labels, r_noise_labels=r,
            return_features_early=return_features_early,
            feature_indices=tuple(feature_indices),
            return_logvar=return_logvar, train=train, **fwd_kwargs)

        if return_features_early:
            return model_outputs

        if return_logvar:
            out, logvar = model_outputs
        else:
            out = model_outputs

        sigma_shift = self.sigma_shift if (not train and self.sigma_shift) else None

        def _post(o):
            if self.drop_precond not in ("output", "both"):
                o = precond_output(o, x_t_in, t_in, sigma_shift=sigma_shift,
                                   sigma_data=self.sigma_data)
            return self.convert_output(x_t_in, o, t_in, fwd_pred_type)

        if not feature_indices:
            out = _post(out)
        else:
            out = [_post(out[0]), out[1]]

        if return_logvar:
            return out, logvar
        return out

    def sample(self, noise, condition=None, neg_condition=None,
               guidance_scale: Optional[float] = 5.0, num_steps: int = 50,
               solver: str = "euler", **kwargs):
        """EDM deterministic sampler over Karras sigma spacing
        (ref ``EDM/network.py:976-1026`` — Euler there; ``solver="heun"``
        adds the original EDM paper's 2nd-order correction).

        Linen-style: call via ``net.apply(params, noise, ..., method=net.sample)``.
        The step loop is a ``lax.scan`` over the stacked (sigma, sigma_next)
        schedule: XLA compiles ONE denoiser step and loops it on device, so
        the HLO stays O(1) in num_steps (an unrolled 35-step UNet graph is
        tens of MB of serialized HLO — it blows past compile-RPC limits and
        multiplies compile time for zero runtime benefit; the loop itself
        has no host syncs either way).
        """
        sigmas = jnp.asarray(self.noise_scheduler.get_t_list(num_steps),
                             dtype=jnp.float32)
        x = self.noise_scheduler.latents(noise, t_init=sigmas[0])
        use_cfg = (guidance_scale is not None and guidance_scale > 1.0
                   and neg_condition is not None)

        def slope(x, sigma):
            t = jnp.full((x.shape[0],), sigma, dtype=jnp.float32)
            if use_cfg:
                x0_pred = self(jnp.concatenate([x, x], axis=0),
                               jnp.concatenate([t, t], axis=0),
                               condition=jnp.concatenate([neg_condition,
                                                          condition], axis=0),
                               fwd_pred_type="x0")
                x0_uncond, x0_cond = jnp.split(x0_pred, 2, axis=0)
                x0_pred = x0_uncond + guidance_scale * (x0_cond - x0_uncond)
            else:
                x0_pred = self(x, t, condition=condition, fwd_pred_type="x0")
            return (x - x0_pred) / expand_like(t, x)

        def step(x, pair):
            sigma, sigma_next = pair[0], pair[1]
            d = slope(x, sigma)
            h = (sigma_next - sigma).astype(x.dtype)
            x_next = x + h * d
            if solver == "heun":
                # 2nd-order correction everywhere except the final step
                # (sigma_next == 0): the extra slope eval runs there too —
                # scan bodies are shape-uniform — but its result is masked out.
                d2 = slope(x_next, sigma_next)
                x_next = jnp.where(sigma_next > 0,
                                   x + h * 0.5 * (d + d2), x_next)
            return x_next, None

        pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)
        x, _ = jax.lax.scan(step, x, pairs)
        return x
