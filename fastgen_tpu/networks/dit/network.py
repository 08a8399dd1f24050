"""DiT / SiT in flax.linen, NHWC (ref ``fastgen/networks/DiT/network.py``).

AdaLN-zero transformer over latent patches. Attention routes through
``ops.attention.dot_product_attention`` (XLA or Pallas flash). Facebook-DiT
checkpoint conversion lives in ``utils/torch_convert.py``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.network import FastGenNetwork
from fastgen_tpu.ops.attention import dot_product_attention
from fastgen_tpu.ops.schedules import NET_PRED_TYPES


def sinusoidal_2d_embeddings(embed_dim: int, grid_size: int) -> np.ndarray:
    """2D sin-cos positional embeddings (ref ``DiT/network.py:712`` region)."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64)
        omega = 1.0 / 10000 ** (omega / (dim / 2.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)  # [N, D]


class FourierTimeEmbedding(nn.Module):
    """Sinusoidal features -> 2-layer SiLU MLP (ref ``DiT/network.py:60-101``)."""

    embed_dim: int
    frequency_dim: int = 256
    max_freq: float = 10000.0

    @nn.compact
    def __call__(self, t):
        half = self.frequency_dim // 2
        freqs = jnp.exp(-math.log(self.max_freq)
                        * jnp.arange(half, dtype=jnp.float32) / half)
        angles = t.astype(jnp.float32)[:, None] * freqs[None, :]
        feats = jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=-1)
        normal_init = nn.initializers.normal(stddev=0.02)
        h = nn.Dense(self.embed_dim, kernel_init=normal_init, name="proj_0")(
            feats.astype(t.dtype) if t.dtype != jnp.float32 else feats)
        h = nn.silu(h)
        return nn.Dense(self.embed_dim, kernel_init=normal_init, name="proj_2")(h)


class ConditionalEmbedding(nn.Module):
    """Class-label embedding with a null token for CFG (ref ``DiT/network.py:104-146``)."""

    num_classes: int
    embed_dim: int
    cfg_enabled: bool = False
    cfg_dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, class_ids, train: bool = False, rng=None):
        dropout_rate = self.cfg_dropout_rate if self.cfg_enabled else 0.0
        num_embeddings = self.num_classes + (1 if self.cfg_dropout_rate > 0 else 0)
        table = nn.Embed(num_embeddings, self.embed_dim,
                         embedding_init=nn.initializers.normal(stddev=0.02),
                         name="class_embeddings")
        if train and dropout_rate > 0 and rng is not None:
            mask = jax.random.uniform(rng, class_ids.shape) < dropout_rate
            class_ids = jnp.where(mask, self.num_classes, class_ids)
        return table(class_ids)


class Attention(nn.Module):
    """Multi-head self-attention, qkv bias, fused via ops.attention."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x, causal_block=None):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        xavier = nn.initializers.xavier_uniform()
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, kernel_init=xavier,
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = dot_product_attention(q, k, v, impl=self.attn_impl,
                                    causal_block=causal_block)
        out = out.reshape(b, n, c)
        return nn.Dense(self.dim, kernel_init=xavier, name="proj")(out)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        xavier = nn.initializers.xavier_uniform()
        h = nn.Dense(self.hidden_dim, kernel_init=xavier, name="fc1")(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.out_dim, kernel_init=xavier, name="fc2")(h)


def modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class DiTBlock(nn.Module):
    """AdaLN-zero transformer block (ref ``DiT/network.py:153-201``)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    attn_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x, c, causal_block=None):
        params = nn.Dense(6 * self.dim, kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="conditioning_net")(nn.silu(c))
        (attn_shift, attn_scale, attn_gate,
         ffn_shift, ffn_scale, ffn_gate) = jnp.split(params, 6, axis=1)

        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         name="attn_norm")(x)
        h = modulate(h, attn_shift, attn_scale)
        h = Attention(self.dim, self.num_heads, attn_impl=self.attn_impl,
                      name="attention")(h, causal_block=causal_block)
        x = x + attn_gate[:, None, :] * h

        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         name="ffn_norm")(x)
        h = modulate(h, ffn_shift, ffn_scale)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="feed_forward")(h)
        x = x + ffn_gate[:, None, :] * h
        return x


class OutputProjection(nn.Module):
    """AdaLN final projection, zero-init (ref ``DiT/network.py:206-225``)."""

    dim: int
    patch_size: int
    out_channels: int

    @nn.compact
    def __call__(self, x, c):
        params = nn.Dense(2 * self.dim, kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="adaptive_params")(nn.silu(c))
        shift, scale = jnp.split(params, 2, axis=1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         name="output_norm")(x)
        h = modulate(h, shift, scale)
        return nn.Dense(self.patch_size**2 * self.out_channels,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, name="projection")(h)


class DiT(FastGenNetwork):
    """Diffusion transformer (ref ``DiT/network.py:228-700``). NHWC latents."""

    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    enable_class_dropout: bool = False
    num_classes: int = 1000
    learn_sigma: bool = False
    r_timestep: bool = False
    scale_t: bool = True
    time_cond_type: str = "abs"   # "abs" | "diff"
    net_pred_type: str = "flow"
    schedule_type: str = "rf"
    use_sit_convention: bool = False
    attn_impl: Optional[str] = None

    @property
    def label_dim(self) -> int:
        return self.num_classes

    @property
    def img_resolution(self) -> int:
        return self.input_size * 8

    def setup(self):
        self.out_channels = self.in_channels * (2 if self.learn_sigma else 1)
        xavier = nn.initializers.xavier_uniform()
        self.x_embedder = nn.Conv(
            self.hidden_size, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            kernel_init=xavier, name="x_embedder")
        self.t_embedder = FourierTimeEmbedding(self.hidden_size)
        self.r_embedder = (FourierTimeEmbedding(self.hidden_size)
                           if self.r_timestep else None)
        self.y_embedder = ConditionalEmbedding(
            self.num_classes, self.hidden_size, self.enable_class_dropout,
            self.class_dropout_prob)
        num_patches = (self.input_size // self.patch_size) ** 2
        grid = int(np.sqrt(num_patches))
        pos = sinusoidal_2d_embeddings(self.hidden_size, grid)[None]
        self.pos_embed = self.variable(
            "buffers", "pos_embed", lambda: jnp.asarray(pos, jnp.float32))
        self.blocks = [DiTBlock(self.hidden_size, self.num_heads,
                                mlp_ratio=self.mlp_ratio, attn_impl=self.attn_impl,
                                name=f"blocks_{i}")
                       for i in range(self.depth)]
        self.final_layer = OutputProjection(self.hidden_size, self.patch_size,
                                            self.out_channels)
        self.logvar_linear = nn.Dense(1, name="logvar_linear")

    def unpatchify(self, x):
        """[B, N, p*p*C] -> [B, H, W, C] (ref ``DiT/network.py:433-450``)."""
        c = self.out_channels
        p = self.patch_size
        h = w = int(np.sqrt(x.shape[1]))
        x = x.reshape(x.shape[0], h, w, p, p, c)
        x = jnp.einsum("bhwpqc->bhpwqc", x)
        return x.reshape(x.shape[0], h * p, w * p, c)

    def prepare_t(self, t, dtype):
        if t is None:
            return None
        if self.scale_t:
            t = self.noise_scheduler.rescale_t(t)
        return t.astype(dtype)

    def __call__(self, x_t, t, condition=None, r=None,
                 return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (),
                 return_logvar: bool = False,
                 fwd_pred_type: Optional[str] = None,
                 train: bool = False, causal_block=None, **fwd_kwargs):
        if fwd_pred_type is not None:
            assert fwd_pred_type in NET_PRED_TYPES
        x_in, t_in = x_t, t

        if condition is None:
            condition = jnp.full((x_t.shape[0],), self.num_classes
                                 if self.class_dropout_prob > 0 else 0, jnp.int32)
        elif condition.ndim == 2:
            # one-hot; zero rows mean unconditional -> null token
            has_class = jnp.any(condition != 0, axis=1)
            condition = jnp.where(has_class, jnp.argmax(condition, axis=1),
                                  self.num_classes)
        condition = condition.astype(jnp.int32)

        t = self.prepare_t(t, x_t.dtype)
        r = self.prepare_t(r, x_t.dtype)
        if self.use_sit_convention:
            t = 1 - t

        x = self.x_embedder(x_t)
        b, hp, wp, cdim = x.shape
        x = x.reshape(b, hp * wp, cdim) + self.pos_embed.value.astype(x.dtype)

        t_emb = self.t_embedder(t)
        if self.r_embedder is not None and r is not None:
            if self.time_cond_type == "diff":
                r_emb = self.r_embedder(t - r)
            elif self.time_cond_type == "abs":
                r_emb = self.r_embedder(r)
            else:
                raise ValueError(f"Invalid time_cond_type {self.time_cond_type}")
        elif self.r_embedder is not None:
            r_emb = self.r_embedder(jnp.zeros_like(t))
        else:
            r_emb = jnp.zeros_like(t_emb)

        rng = self.make_rng("dropout") if (train and self.enable_class_dropout) else None
        y = self.y_embedder(condition, train=train, rng=rng)
        c = t_emb + y + r_emb

        features = []
        for idx, block in enumerate(self.blocks):
            x = block(x, c, causal_block=causal_block)
            if idx in feature_indices:
                # token features -> [B, H', W', C] grid for conv discriminators
                features.append(x.reshape(b, hp, wp, cdim))
            if return_features_early and len(features) == len(feature_indices):
                return features

        x = self.final_layer(x, c)
        x = self.unpatchify(x)
        if self.learn_sigma:
            x = x[..., : self.in_channels]
        if self.use_sit_convention and self.net_pred_type == "flow":
            x = -x

        x = self.noise_scheduler.convert_model_output(
            x_in, x, t_in, src_pred_type=self.net_pred_type,
            target_pred_type=fwd_pred_type or self.net_pred_type)

        out = x if not feature_indices else [x, features]
        logvar = self.logvar_linear(t_emb)
        if return_logvar:
            return out, logvar
        return out

    def sample(self, noise, condition=None, neg_condition=None,
               guidance_scale: Optional[float] = 5.0, num_steps: int = 50,
               solver: str = "euler", **kwargs):
        """Euler sampler in flow space for RF (ref ``DiT/network.py:600-700``
        region); CFG via doubled batch; ``solver="dpm2m"`` for multistep."""
        if solver == "dpm2m":
            from fastgen_tpu.ops.solvers import net_dpm2m_sample

            return net_dpm2m_sample(self, noise, condition, neg_condition,
                                    guidance_scale, num_steps)
        ns = self.noise_scheduler
        t_list = np.linspace(ns.max_t, 0.0, num_steps + 1, dtype=np.float64)
        x = ns.latents(noise, t_init=jnp.asarray(float(t_list[0]), jnp.float32))
        use_cfg = (guidance_scale is not None and guidance_scale > 1.0
                   and neg_condition is not None)
        b = x.shape[0]

        # lax.scan over the schedule: one compiled step, O(1) HLO in
        # num_steps (see EDMPrecond.sample)
        def step(x, pair):
            t_cur, t_next = pair[0], pair[1]
            tb = jnp.full((b,), t_cur, jnp.float32)
            if use_cfg:
                v = self(jnp.concatenate([x, x]), jnp.concatenate([tb, tb]),
                         condition=jnp.concatenate([neg_condition, condition]),
                         fwd_pred_type="flow")
                v_neg, v_pos = jnp.split(v, 2)
                v = v_neg + guidance_scale * (v_pos - v_neg)
            else:
                v = self(x, tb, condition=condition, fwd_pred_type="flow")
            return x - (t_cur - t_next).astype(x.dtype) * v, None

        t_arr = jnp.asarray(t_list, jnp.float32)
        pairs = jnp.stack([t_arr[:-1], t_arr[1:]], axis=1)
        x, _ = jax.lax.scan(step, x, pairs)
        return x
