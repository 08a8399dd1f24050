"""Discriminator heads over teacher features (ref ``fastgen/networks/discriminators.py``).

NHWC flax modules. ``feature_indices`` selects which backbone blocks feed the
heads (the backbones extract them via the static ``feature_indices`` forward
argument). Logits are concatenated per-head to [B, num_heads] as the GAN losses
expect 2-D logits.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _get_optimal_groups(num_channels: int) -> int:
    """GroupNorm group count rule (ref ``discriminators.py:34-54``)."""
    if num_channels <= 32:
        groups = max(1, num_channels // 4)
    else:
        groups = 32
        while groups > 1 and num_channels % groups != 0:
            groups -= 1
    assert num_channels % groups == 0
    return groups


class Discriminator(nn.Module):
    """Base class carrying the feature-index contract (ref ``discriminators.py:9-31``)."""

    feature_indices: Optional[Tuple[int, ...]] = None

    def __call__(self, feats: List[jnp.ndarray]) -> jnp.ndarray:
        raise NotImplementedError


class _ConvHead(nn.Module):
    """One multi-resolution conv head: downsample to 1x1 then 1x1-conv to a logit."""

    in_res: int
    channels: int

    @nn.compact
    def __call__(self, x):
        res = self.in_res
        groups = _get_optimal_groups(self.channels)
        while res > 8:
            x = nn.Conv(self.channels, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))(x)
            x = nn.GroupNorm(num_groups=groups)(x)
            x = nn.silu(x)
            res //= 2
        x = nn.Conv(self.channels, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))(x)
        x = nn.GroupNorm(num_groups=groups)(x)
        x = nn.silu(x)
        x = nn.Conv(self.channels, (4, 4), strides=(4, 4), padding="VALID")(x)
        x = nn.GroupNorm(num_groups=groups)(x)
        x = nn.silu(x)
        x = nn.Conv(1, (1, 1))(x)
        return x.reshape(x.shape[0], -1)[:, :1]


class Discriminator_EDM(Discriminator):
    """Multi-resolution conv heads over EDM encoder features
    (ref ``discriminators.py:62-137``)."""

    all_res: Tuple[int, ...] = (32, 16, 8)
    in_channels: int = 256

    @property
    def resolved_feature_indices(self) -> Tuple[int, ...]:
        if self.feature_indices is None:
            return (len(self.all_res) - 1,)
        return tuple(sorted(i for i in self.feature_indices if i < len(self.all_res)))

    @property
    def in_res(self) -> Tuple[int, ...]:
        return tuple(self.all_res[i] for i in self.resolved_feature_indices)

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> jnp.ndarray:
        assert isinstance(feats, (list, tuple))
        in_res = self.in_res
        if len(feats) != len(in_res):
            raise ValueError(f"Got {len(feats)} features for {len(in_res)} heads")
        logits = []
        for i, res in enumerate(in_res):
            assert feats[i].shape[1] == res, (
                f"feature {i} has resolution {feats[i].shape[1]}, expected {res}")
            logits.append(_ConvHead(res, self.in_channels, name=f"head_{i}")(feats[i]))
        return jnp.concatenate(logits, axis=1)


class Discriminator_SD15(Discriminator_EDM):
    all_res: Tuple[int, ...] = (32, 16, 8, 8, 8)
    in_channels: int = 1280


class Discriminator_SDXL(Discriminator_EDM):
    all_res: Tuple[int, ...] = (32, 16, 16, 16)
    in_channels: int = 1280


class Discriminator_ImageDiT(Discriminator):
    """Lightweight 2-layer conv heads over DiT token features
    (ref ``discriminators.py:170-253``). Features come in as [B, H, W, C]."""

    num_blocks: int = 57
    inner_dim: int = 3072

    @property
    def resolved_feature_indices(self) -> Tuple[int, ...]:
        if self.feature_indices is None:
            return (self.num_blocks // 2,)
        return tuple(sorted(i for i in self.feature_indices if i < self.num_blocks))

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> jnp.ndarray:
        indices = self.resolved_feature_indices
        if len(feats) != len(indices):
            raise ValueError(f"Got {len(feats)} features for {len(indices)} heads")
        logits = []
        for i, f in enumerate(feats):
            h = nn.Conv(128, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        name=f"head_{i}_conv0")(f)
            h = nn.GroupNorm(num_groups=_get_optimal_groups(128), name=f"head_{i}_norm")(h)
            h = nn.silu(h)
            h = nn.Conv(1, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                        name=f"head_{i}_conv1")(h)
            logits.append(jnp.mean(h, axis=(1, 2)))
        return jnp.concatenate(logits, axis=1)


DISCRIMINATORS = {
    "edm": Discriminator_EDM,
    "sd15": Discriminator_SD15,
    "sdxl": Discriminator_SDXL,
    "image_dit": Discriminator_ImageDiT,
}


class Discriminator_VideoDiT(Discriminator):
    """Video DiT discriminator heads over transformer token features
    (ref ``discriminators.py:683`` with 6 head builders ``:256-681``).

    Features come in as [B, F, H', W', C]. ``disc_type`` selects the head:
    * ``dit_simple_conv3d`` — one 3D conv stack to a logit
    * ``dit_conv3d``        — deeper 3D conv pyramid
    * ``dit_conv1d_2d``     — factorized temporal-1D + spatial-2D convs
    * ``dit_attention``     — token-pooled attention head
    * ``dit_factorized``    — spatial then temporal reduction
    * ``dit_multiscale`` / ``multiscale_down_mlp[_efficient|_medium|_large]``
      — parallel per-scale pooled conv branches fused by an MLP
      (ref ``_build_dit_multiscale_discriminator_head``,
      ``discriminators.py:513-585``, preset table ``:779-810``)
    """

    num_blocks: int = 30
    inner_dim: int = 480
    disc_type: str = "dit_simple_conv3d"
    # multiscale-head knobs (overridden by the named presets)
    scales: Tuple[int, ...] = (1, 2, 4)
    channel_reduction: int = 4
    mlp_hidden_dim: int = 256

    _MULTISCALE_PRESETS = {
        "multiscale_down_mlp": ((1, 2, 4, 8), 2, 512),
        "multiscale_down_mlp_efficient": ((1, 2, 4), 4, 256),
        "multiscale_down_mlp_medium": ((1, 2, 4, 8), 2, 768),
        "multiscale_down_mlp_large": ((1, 2, 4, 8, 16), 1, 1024),
    }

    @property
    def resolved_feature_indices(self) -> Tuple[int, ...]:
        if self.feature_indices is None:
            return (self.num_blocks // 2,)
        return tuple(sorted(i for i in self.feature_indices if i < self.num_blocks))

    def _head(self, f, i):
        name = f"head_{i}"
        ch = self.inner_dim
        if self.disc_type in ("dit_simple_conv3d", "dit_conv3d"):
            h = nn.Conv(ch, (3, 3, 3), strides=(1, 2, 2),
                        padding=((1, 1), (1, 1), (1, 1)), name=f"{name}_c0")(f)
            h = nn.silu(nn.GroupNorm(num_groups=_get_optimal_groups(ch),
                                     name=f"{name}_n0")(h))
            if self.disc_type == "dit_conv3d":
                h = nn.Conv(ch, (3, 3, 3), strides=(2, 2, 2),
                            padding=((1, 1), (1, 1), (1, 1)), name=f"{name}_c1")(h)
                h = nn.silu(nn.GroupNorm(num_groups=_get_optimal_groups(ch),
                                         name=f"{name}_n1")(h))
            h = nn.Conv(1, (1, 1, 1), name=f"{name}_out")(h)
            return jnp.mean(h, axis=(1, 2, 3))
        if self.disc_type == "dit_conv1d_2d":
            b, t, hh, ww, c = f.shape
            h = nn.Conv(ch, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)), name=f"{name}_sp")(f)
            h = nn.silu(nn.GroupNorm(num_groups=_get_optimal_groups(ch),
                                     name=f"{name}_n0")(h))
            h = nn.Conv(ch, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                        name=f"{name}_tm")(h)
            h = nn.silu(nn.GroupNorm(num_groups=_get_optimal_groups(ch),
                                     name=f"{name}_n1")(h))
            h = nn.Conv(1, (1, 1, 1), name=f"{name}_out")(h)
            return jnp.mean(h, axis=(1, 2, 3))
        if self.disc_type == "dit_attention":
            b = f.shape[0]
            tokens = f.reshape(b, -1, f.shape[-1])
            tokens = nn.Dense(ch, name=f"{name}_proj")(tokens)
            q = self.param(f"{name}_query", nn.initializers.normal(0.02), (1, 1, ch))
            attn = jax.nn.softmax(
                (q @ jnp.swapaxes(tokens, 1, 2)) / jnp.sqrt(ch), axis=-1)
            pooled = (attn @ tokens)[:, 0]
            return nn.Dense(1, name=f"{name}_out")(nn.silu(pooled))
        if self.disc_type == "dit_factorized":
            h = jnp.mean(f, axis=(2, 3))  # spatial pool -> [B, T, C]
            h = nn.Dense(ch, name=f"{name}_fc0")(h)
            h = nn.silu(h)
            h = nn.Conv(ch, (3,), padding=((1, 1),), name=f"{name}_tconv")(h)
            h = nn.silu(h)
            return jnp.mean(nn.Dense(1, name=f"{name}_out")(h), axis=1)
        if self.disc_type == "dit_multiscale" or \
                self.disc_type in self._MULTISCALE_PRESETS:
            scales, reduction, mlp_dim = self._MULTISCALE_PRESETS.get(
                self.disc_type,
                (tuple(self.scales), self.channel_reduction, self.mlp_hidden_dim))
            reduced = max(ch // reduction, 1)
            branch_feats = []
            for s in scales:
                h = nn.Conv(reduced, (1, 1, 1), name=f"{name}_s{s}_c0")(f)
                h = nn.leaky_relu(nn.GroupNorm(
                    num_groups=_get_optimal_groups(reduced),
                    name=f"{name}_s{s}_n0")(h), 0.2)
                if s > 1:
                    # clamp the window to the feature dims (tiny test inputs)
                    win = tuple(min(s, d) for d in h.shape[1:4])
                    h = nn.avg_pool(h, win, strides=win)
                h = nn.Conv(reduced, (3, 3, 3),
                            padding=((1, 1), (1, 1), (1, 1)),
                            name=f"{name}_s{s}_c1")(h)
                h = nn.leaky_relu(nn.GroupNorm(
                    num_groups=_get_optimal_groups(reduced),
                    name=f"{name}_s{s}_n1")(h), 0.2)
                branch_feats.append(jnp.mean(h, axis=(1, 2, 3)))
            combined = jnp.concatenate(branch_feats, axis=-1)
            h = nn.leaky_relu(nn.Dense(mlp_dim, name=f"{name}_fc0")(combined), 0.2)
            return nn.Dense(1, name=f"{name}_fc1")(h)
        raise ValueError(f"Unknown disc_type {self.disc_type!r}")

    @nn.compact
    def __call__(self, feats) -> jnp.ndarray:
        indices = self.resolved_feature_indices
        if len(feats) != len(indices):
            raise ValueError(f"Got {len(feats)} features for {len(indices)} heads")
        logits = [self._head(f, i) for i, f in enumerate(feats)]
        return jnp.concatenate([l.reshape(l.shape[0], -1) for l in logits], axis=1)


DISCRIMINATORS["video_dit"] = Discriminator_VideoDiT
