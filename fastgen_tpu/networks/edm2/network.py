"""EDM2 magnitude-preserving UNet in flax.linen, NHWC
(ref ``fastgen/networks/EDM2/network.py``).

MP primitives (Karras et al. 2024 "Analyzing and Improving the Training
Dynamics of Diffusion Models"): pixel/weight normalization, mp_silu, mp_sum,
mp_cat, MPFourier. MPConv applies traditional weight normalization in-forward
(Eq. 47); the *forced* weight normalization (Eq. 66, reference
``ForcedWeightNormCallback``) is the pure function ``normalize_weights`` that
the train step applies to updated params after each optimizer step — MPConv
weights are named ``mp_weight`` so the tree transform can find them.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.edm.network import (
    PositionalEmbedding,
    precond_input,
    precond_output,
)
from fastgen_tpu.networks.network import FastGenNetwork
from fastgen_tpu.ops.schedules import NET_PRED_TYPES


def normalize(x, axis=None, eps: float = 1e-4):
    """Unit-magnitude normalize over ``axis`` (default: all but first)
    (ref ``EDM2/network.py:81-88``)."""
    if axis is None:
        axis = tuple(range(1, x.ndim))
    elif isinstance(axis, int):
        axis = (axis,)
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32**2, axis=axis, keepdims=True))
    n_norm = norm.size
    scale = np.sqrt(n_norm / x.size)
    return (x32 / (eps + norm * scale)).astype(x.dtype)


def mp_silu(x):
    return nn.silu(x) / 0.596


def mp_sum(a, b, t: float = 0.5):
    return (a * (1 - t) + b * t) / np.sqrt((1 - t) ** 2 + t**2)


def mp_cat(a, b, axis: int = -1, t: float = 0.5):
    na, nb = a.shape[axis], b.shape[axis]
    c = np.sqrt((na + nb) / ((1 - t) ** 2 + t**2))
    wa = c / np.sqrt(na) * (1 - t)
    wb = c / np.sqrt(nb) * t
    return jnp.concatenate([wa * a, wb * b], axis=axis)


class MPFourier(nn.Module):
    """MP Fourier features with random freqs/phases (ref ``:145-162``)."""

    num_channels: int
    bandwidth: float = 1.0

    @nn.compact
    def __call__(self, x):
        freqs = self.param(
            "freqs", lambda key, s: 2 * np.pi * jax.random.normal(key, s) * self.bandwidth,
            (self.num_channels,))
        phases = self.param(
            "phases", lambda key, s: 2 * np.pi * jax.random.uniform(key, s),
            (self.num_channels,))
        y = jnp.outer(x.astype(jnp.float32), freqs) + phases
        return (jnp.cos(y) * np.sqrt(2)).astype(x.dtype)


class MPConv(nn.Module):
    """MP conv / dense with in-forward weight normalization (ref ``:195-213``).

    kernel=() -> dense [in, out]; kernel=(3,3) -> NHWC conv with same padding.
    Param name ``mp_weight`` marks it for forced weight normalization.
    """

    features: int
    kernel: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, x, gain=1.0):
        in_ch = x.shape[-1]
        if self.kernel:
            shape = self.kernel + (in_ch, self.features)  # HWIO
        else:
            shape = (in_ch, self.features)
        w = self.param("mp_weight", nn.initializers.normal(stddev=1.0), shape)
        w32 = w.astype(jnp.float32)
        # normalize per output channel (all axes but the output axis, which is
        # last in HWIO/IO layout — torch normalizes all but the first in OIHW)
        axes = tuple(range(w32.ndim - 1))
        norm = jnp.sqrt(jnp.sum(w32**2, axis=axes, keepdims=True))
        scale = np.sqrt(norm.size / w32.size)
        w32 = w32 / (1e-4 + norm * scale)
        fan_in = int(np.prod(shape[:-1]))
        w32 = w32 * (gain / np.sqrt(fan_in))
        w_cast = w32.astype(x.dtype)
        if not self.kernel:
            return x @ w_cast
        pad = self.kernel[0] // 2
        return jax.lax.conv_general_dilated(
            x, w_cast, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _resample(x, f=(1, 1), mode: str = "keep"):
    """Fixed-filter 2x down/up (ref ``:96-110``), NHWC depthwise."""
    if mode == "keep":
        return x
    f1 = np.asarray(f, np.float32)
    f1 = f1 / f1.sum()
    f2 = np.outer(f1, f1)
    c = x.shape[-1]
    pad = (len(f1) - 1) // 2
    w = jnp.asarray(f2, x.dtype)[:, :, None, None] * jnp.ones((1, 1, 1, c), x.dtype)
    if mode == "down":
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    assert mode == "up"
    k = f2.shape[0]
    return jax.lax.conv_general_dilated(
        x, w * 4.0, (1, 1), [(k - 1 - pad,) * 2, (k - 1 - pad,) * 2],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


class EDM2Block(nn.Module):
    """Encoder/decoder block (Fig. 21; ref ``:216-295``)."""

    in_channels: int
    out_channels: int
    flavor: str = "enc"
    resample_mode: str = "keep"
    resample_filter: Tuple[float, ...] = (1, 1)
    attention: bool = False
    channels_per_head: int = 64
    dropout: float = 0.0
    res_balance: float = 0.3
    attn_balance: float = 0.3
    clip_act: Optional[float] = 256.0

    @nn.compact
    def __call__(self, x, emb, train: bool = False):
        num_heads = self.out_channels // self.channels_per_head if self.attention else 0
        x = _resample(x, self.resample_filter, self.resample_mode)
        if self.flavor == "enc":
            if self.in_channels != self.out_channels:
                x = MPConv(self.out_channels, (1, 1), name="conv_skip")(x)
            x = normalize(x, axis=-1)  # pixel norm

        y = MPConv(self.out_channels, (3, 3), name="conv_res0")(mp_silu(x))
        emb_gain = self.param("emb_gain", nn.initializers.zeros, (1,))
        c = MPConv(self.out_channels, (), name="emb_linear")(emb, gain=emb_gain) + 1
        y = mp_silu(y * c[:, None, None, :].astype(y.dtype))
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = MPConv(self.out_channels, (3, 3), name="conv_res1")(y)

        if self.flavor == "dec" and self.in_channels != self.out_channels:
            x = MPConv(self.out_channels, (1, 1), name="conv_skip")(x)
        x = mp_sum(x, y, t=self.res_balance)

        if num_heads:
            b, h, w, cdim = x.shape
            y = MPConv(self.out_channels * 3, (1, 1), name="attn_qkv")(x)
            head_dim = cdim // num_heads
            y = y.reshape(b, h * w, 3, num_heads, head_dim)
            y = normalize(y, axis=-1)  # pixel norm per head vector
            q, k, v = y[:, :, 0], y[:, :, 1], y[:, :, 2]
            logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                                k.astype(jnp.float32)) / np.sqrt(head_dim)
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            y = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, h, w, cdim)
            y = MPConv(self.out_channels, (1, 1), name="attn_proj")(y)
            x = mp_sum(x, y, t=self.attn_balance)

        if self.clip_act is not None:
            x = jnp.clip(x, -self.clip_act, self.clip_act)
        return x


class EDM2UNet(nn.Module):
    """(ref ``EMD2UNet``, ``:294-455``)."""

    img_resolution: int
    img_channels: int
    label_dim: int = 0
    model_channels: int = 192
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    channel_mult_noise: Optional[int] = None
    channel_mult_emb: Optional[int] = None
    num_blocks: int = 3
    attn_resolutions: Tuple[int, ...] = (16, 8)
    label_balance: float = 0.5
    concat_balance: float = 0.5
    dropout: float = 0.0
    dropout_resolutions: Optional[Tuple[int, ...]] = None
    embedding_type: str = "mp_fourier"
    mp_fourier_bandwidth: float = 1.0
    r_timestep: bool = False
    block_kwargs: dict = dataclasses.field(default_factory=dict)

    def setup(self):
        cblock = [self.model_channels * m for m in self.channel_mult]
        cnoise = (self.model_channels * self.channel_mult_noise
                  if self.channel_mult_noise else cblock[0])
        cemb = (self.model_channels * self.channel_mult_emb
                if self.channel_mult_emb else max(cblock))
        self._cemb = cemb

        if self.embedding_type == "positional":
            self.emb_fourier = PositionalEmbedding(cnoise, endpoint=True)
            self.emb_fourier_r = (PositionalEmbedding(cnoise, endpoint=True)
                                  if self.r_timestep else None)
        else:
            self.emb_fourier = MPFourier(cnoise, self.mp_fourier_bandwidth)
            self.emb_fourier_r = (MPFourier(cnoise, self.mp_fourier_bandwidth)
                                  if self.r_timestep else None)
        self.emb_noise = MPConv(cemb, (), name="emb_noise")
        self.emb_noise_r = (MPConv(cemb, (), name="emb_noise_r")
                            if self.r_timestep else None)
        self.emb_label = (MPConv(cemb, (), name="emb_label")
                          if self.label_dim else None)
        self.out_gain = self.param("out_gain", nn.initializers.zeros, (1,))

        enc = {}
        cout = self.img_channels + 1
        for level, channels in enumerate(self._cblock()):
            res = self.img_resolution >> level
            dout = (self.dropout if (self.dropout_resolutions is None
                                     or res in self.dropout_resolutions) else 0)
            if level == 0:
                cin, cout = cout, channels
                enc[f"{res}x{res}_conv"] = MPConv(cout, (3, 3))
            else:
                enc[f"{res}x{res}_down"] = EDM2Block(
                    cout, cout, flavor="enc", resample_mode="down", dropout=dout,
                    **self.block_kwargs)
            for idx in range(self.num_blocks):
                cin, cout = cout, channels
                enc[f"{res}x{res}_block{idx}"] = EDM2Block(
                    cin, cout, flavor="enc", attention=(res in self.attn_resolutions),
                    dropout=dout, **self.block_kwargs)
        self.enc = enc

        dec = {}
        skips = list(self._skip_channels())
        for level, channels in reversed(list(enumerate(self._cblock()))):
            res = self.img_resolution >> level
            dout = (self.dropout if (self.dropout_resolutions is None
                                     or res in self.dropout_resolutions) else 0)
            if level == len(self.channel_mult) - 1:
                dec[f"{res}x{res}_in0"] = EDM2Block(
                    cout, cout, flavor="dec", attention=True, dropout=dout,
                    **self.block_kwargs)
                dec[f"{res}x{res}_in1"] = EDM2Block(cout, cout, flavor="dec",
                                                    dropout=dout, **self.block_kwargs)
            else:
                dec[f"{res}x{res}_up"] = EDM2Block(
                    cout, cout, flavor="dec", resample_mode="up", dropout=dout,
                    **self.block_kwargs)
            for idx in range(self.num_blocks + 1):
                cin = cout + skips.pop()
                cout = channels
                dec[f"{res}x{res}_block{idx}"] = EDM2Block(
                    cin, cout, flavor="dec", attention=(res in self.attn_resolutions),
                    dropout=dout, **self.block_kwargs)
        self.dec = dec
        self.out_conv = MPConv(self.img_channels, (3, 3), name="out_conv")

    def _cblock(self):
        return [self.model_channels * m for m in self.channel_mult]

    def _skip_channels(self):
        chans = []
        cout = self.img_channels + 1
        for level, channels in enumerate(self._cblock()):
            if level == 0:
                cout = channels
                chans.append(cout)
            else:
                chans.append(cout)
            for _ in range(self.num_blocks):
                cout = channels
                chans.append(cout)
        return chans

    def __call__(self, x, noise_labels, class_labels=None, r_noise_labels=None,
                 return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (), train: bool = False):
        emb = self.emb_noise(self.emb_fourier(noise_labels))
        if r_noise_labels is not None:
            if self.emb_noise_r is None:
                raise ValueError("r_noise_labels provided but r_timestep not set")
            emb = mp_sum(emb, self.emb_noise_r(self.emb_fourier_r(r_noise_labels)),
                         t=0.5)
        if self.emb_label is not None:
            emb = mp_sum(emb,
                         self.emb_label(class_labels * np.sqrt(class_labels.shape[1])),
                         t=self.label_balance)
        emb = mp_silu(emb)

        x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
        skips = []
        idx, features = 0, []
        for name, block in self.enc.items():
            x = block(x) if "conv" in name else block(x, emb, train=train)
            skips.append(x)
            if f"block{self.num_blocks - 1}" in name:
                if idx in feature_indices:
                    features.append(x)
                idx += 1
        if return_features_early:
            assert len(features) == len(feature_indices)
            return features

        for name, block in self.dec.items():
            if "block" in name:
                x = mp_cat(x, skips.pop(), t=self.concat_balance)
            x = block(x, emb, train=train)
        x = self.out_conv(x, gain=self.out_gain)
        return x if not feature_indices else [x, features]


class EDM2Precond(FastGenNetwork):
    """(ref ``EDM2Precond``, ``:457-650``)."""

    img_resolution: int = 64
    img_channels: int = 3
    label_dim: int = 0
    sigma_data: float = 0.5
    sigma_shift: float = 0.0
    logvar_channels: int = 128
    drop_precond: Optional[str] = None
    model_kwargs: dict = dataclasses.field(default_factory=dict)

    def setup(self):
        mk = dict(self.model_kwargs)
        embedding_type = mk.get("embedding_type", "mp_fourier")
        bandwidth = mk.get("mp_fourier_bandwidth", 1.0)
        self.unet = EDM2UNet(img_resolution=self.img_resolution,
                             img_channels=self.img_channels,
                             label_dim=self.label_dim, name="unet", **mk)
        if embedding_type == "positional":
            self.logvar_fourier = PositionalEmbedding(self.logvar_channels,
                                                      endpoint=True)
        else:
            self.logvar_fourier = MPFourier(self.logvar_channels, bandwidth)
        self.logvar_linear = MPConv(1, (), name="logvar_linear")

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

        if self.label_dim == 0:
            class_labels = None
        elif condition is None:
            class_labels = jnp.zeros((1, self.label_dim), x_t.dtype)
        else:
            class_labels = condition.reshape(-1, self.label_dim)

        x_t_in, t_in = x_t, t
        if self.drop_precond not in ("input", "both"):
            x_t, t, r = precond_input(x_t, t, r=r, sigma_data=self.sigma_data,
                                      eps=self.noise_scheduler.clamp_min)
        t = t.astype(x_t.dtype)
        r = None if r is None else r.astype(x_t.dtype)

        out = self.unet(x_t, t, class_labels=class_labels, r_noise_labels=r,
                        return_features_early=return_features_early,
                        feature_indices=tuple(feature_indices), train=train)
        if return_features_early:
            return out

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

        # always materialize the logvar head (flag-invariant param tree)
        logvar = self.logvar_linear(self.logvar_fourier(t)).reshape(-1, 1)
        if return_logvar:
            return out, logvar
        return out

    def sample(self, noise, condition=None, neg_condition=None,
               guidance_scale: Optional[float] = 5.0, num_steps: int = 50,
               solver: str = "euler", **kwargs):
        """Deterministic sampler in sigma space (same contract as EDMPrecond;
        ``solver="heun"`` adds the EDM-paper 2nd-order correction)."""
        from fastgen_tpu.utils import expand_like

        sigmas = jnp.asarray(self.noise_scheduler.get_t_list(num_steps),
                             dtype=jnp.float32)
        x = self.noise_scheduler.latents(noise, t_init=sigmas[0])
        use_cfg = (guidance_scale is not None and guidance_scale > 1.0
                   and neg_condition is not None)

        def slope(x, sigma):
            tb = jnp.full((x.shape[0],), sigma, jnp.float32)
            if use_cfg:
                x0 = self(jnp.concatenate([x, x]), jnp.concatenate([tb, tb]),
                          condition=jnp.concatenate([neg_condition, condition]),
                          fwd_pred_type="x0")
                x0_neg, x0_pos = jnp.split(x0, 2)
                x0 = x0_neg + guidance_scale * (x0_pos - x0_neg)
            else:
                x0 = self(x, tb, condition=condition, fwd_pred_type="x0")
            return (x - x0) / expand_like(tb, x)

        # lax.scan over the schedule: one compiled step, O(1) HLO in
        # num_steps (see EDMPrecond.sample)
        def step(x, pair):
            sigma, sigma_next = pair[0], pair[1]
            d = slope(x, sigma)
            h = (sigma_next - sigma).astype(x.dtype)
            x_next = x + h * d
            if solver == "heun":
                d2 = slope(x_next, sigma_next)
                x_next = jnp.where(sigma_next > 0,
                                   x + h * 0.5 * (d + d2), x_next)
            return x_next, None

        pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)
        x, _ = jax.lax.scan(step, x, pairs)
        return x


def normalize_weights(variables):
    """Forced weight normalization (Eq. 66; ref ``normalize_weights`` +
    ``ForcedWeightNormCallback``): normalize every ``mp_weight`` leaf per
    output channel. Pure tree transform applied after each optimizer step."""
    def walk(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k == "mp_weight":
                    axes = tuple(range(v.ndim - 1))
                    norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32)**2, axis=axes,
                                            keepdims=True))
                    scale = np.sqrt(norm.size / v.size)
                    out[k] = (v.astype(jnp.float32) / (1e-4 + norm * scale)
                              ).astype(v.dtype)
                else:
                    out[k] = walk(v)
            return out
        return tree

    return walk(variables)
