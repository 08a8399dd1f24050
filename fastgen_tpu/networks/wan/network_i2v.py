"""WanI2V / CausalWanI2V: image-to-video first-frame conditioning
(ref ``fastgen/networks/WanI2V/network.py:81`` + ``network_causal.py:24``).

Conditioning: the first latent frame is given; the input to the backbone is
``concat([x_t, mask(4ch), first_frame_latents(16ch)], channel)`` (the Wan2.1
I2V concat-mask variant). Optional CLIP image embeddings ride as extra
cross-attention tokens prepended to the text context
(``encoder_hidden_states_image``; ref ``CausalWanAttnProcessor`` image branch,
``network_causal.py:294-322``). ``preserve_conditioning`` keeps the first
frame fixed through the student sample loop (ref ``model.py:343-370``)."""

from __future__ import annotations


import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.wan.network import CausalWanVideoDiT, WanVideoDiT


def _assemble_i2v_input(x_t, condition):
    """x_t [B,T,H,W,C] + first_frame_cond [B,T,H,W,C+4mask] -> concat input."""
    ffc = condition.get("first_frame_cond") if isinstance(condition, dict) else None
    if ffc is None:
        b, tt, h, w, c = x_t.shape
        ffc = jnp.zeros((b, tt, h, w, c + 4), x_t.dtype)
    return jnp.concatenate([x_t, ffc.astype(x_t.dtype)], axis=-1)


def _replace_first_frame(x_t, t, condition):
    """Wan2.2 TI2V frame-replacement conditioning (ref
    ``WanI2V/network.py:297-302,334-341``): the first latent frame becomes
    the clean conditioning latent and gets a per-frame timestep of 0
    (``expand_timesteps``). Returns (x_in, t_frames)."""
    ffc = condition.get("first_frame_cond") if isinstance(condition, dict) else None
    if ffc is None:
        return x_t, t
    x_in = jnp.concatenate([ffc[:, :1].astype(x_t.dtype), x_t[:, 1:]], axis=1)
    if t.ndim == 1:
        t = jnp.repeat(t[:, None], x_t.shape[1], axis=1)
    t = t.at[:, 0].set(0.0)
    return x_in, t


def _image_context(condition, context_tokens, embed_fn):
    img_embeds = (condition.get("encoder_hidden_states_image")
                  if isinstance(condition, dict) else None)
    if img_embeds is None:
        return context_tokens
    return jnp.concatenate([embed_fn(img_embeds), context_tokens], axis=1)


class WanI2V(WanVideoDiT):
    """Bidirectional I2V Wan (ref ``WanI2V/network.py:81``).

    ``concat_mask=True`` is the Wan2.1 concat-mask variant (input channels
    widen by C+4); ``concat_mask=False`` is the Wan2.2 TI2V frame-replacement
    variant with per-frame timesteps (ref ``WanI2V/network.py:184-190``)."""

    is_i2v: bool = True
    concat_mask: bool = True
    image_embed_dim: int = 1280  # CLIP vision width

    def setup(self):
        super().setup()
        self.img_embedder_0 = nn.Dense(self.dim, name="img_embedder_0")
        self.img_embedder_2 = nn.Dense(self.dim, name="img_embedder_2")

    def _embed_image(self, img_embeds):
        return self.img_embedder_2(nn.gelu(self.img_embedder_0(img_embeds),
                                           approximate=True))

    def __call__(self, x_t, t, condition=None, **kwargs):
        if self.concat_mask:
            x_in = _assemble_i2v_input(x_t, condition)
        else:
            x_in, t = _replace_first_frame(x_t, t, condition)
        if isinstance(condition, dict) and \
                condition.get("encoder_hidden_states_image") is not None:
            img_ctx = self._embed_image(condition["encoder_hidden_states_image"])
            out = super().__call__(x_in, t, condition=condition,
                                   extra_context=img_ctx, **kwargs)
        else:
            out = super().__call__(x_in, t, condition=condition, **kwargs)
        if not self.concat_mask:
            out = self._pin_first_frame_outputs(out, condition, **kwargs)
        return out

    def _pin_first_frame_outputs(self, out, condition, return_logvar=False,
                                 return_features_early=False, **_):
        """Replace the converted output's first frame with the clean latent
        (ref ``WanI2V/network.py:509-519`` _replace_first_frame on out)."""
        ffc = condition.get("first_frame_cond") if isinstance(condition, dict) \
            else None
        if ffc is None or return_features_early:
            return out

        def pin(o):
            return jnp.concatenate([ffc[:, :1].astype(o.dtype), o[:, 1:]],
                                   axis=1)

        if return_logvar:
            res, logvar = out
            res = pin(res) if not isinstance(res, list) else [pin(res[0]), res[1]]
            return res, logvar
        if isinstance(out, list):       # [out, features]
            return [pin(out[0]), out[1]]
        return pin(out)

    def preserve_conditioning(self, x, condition):
        """Keep the given first latent frame fixed (ref ``model.py:343``)."""
        if isinstance(condition, dict) and condition.get("first_frame_latent") is not None:
            first = condition["first_frame_latent"]
            return jnp.concatenate([first[:, :1].astype(x.dtype), x[:, 1:]], axis=1)
        return x


class CausalWanI2V(CausalWanVideoDiT):
    """Causal I2V Wan (ref ``WanI2V/network_causal.py:24``).

    ``concat_mask=False`` gives the Wan2.2 TI2V frame-replacement variant;
    in AR generation only the chunk containing frame 0 is conditioned
    (``start_frame`` is traced, so the replacement is a ``jnp.where``)."""

    is_i2v: bool = True
    concat_mask: bool = True

    def __call__(self, x_t, t, condition=None, **kwargs):
        if self.concat_mask:
            x_in = _assemble_i2v_input(x_t, condition)
        else:
            x_in, t = _replace_first_frame(x_t, t, condition)
        return super().__call__(x_in, t, condition=condition, **kwargs)

    def forward_chunk(self, x_chunk, t, cache, start_frame, condition=None, **kwargs):
        ffc = condition.get("first_frame_cond") if isinstance(condition, dict) else None
        if self.concat_mask:
            if ffc is None:
                b, tt, h, w, c = x_chunk.shape
                chunk_cond = jnp.zeros((b, tt, h, w, c + 4), x_chunk.dtype)
            else:
                chunk_cond = ffc[:, start_frame:start_frame + x_chunk.shape[1]]
            x_in = jnp.concatenate([x_chunk, chunk_cond.astype(x_chunk.dtype)],
                                   axis=-1)
        elif ffc is not None:
            is_first = jnp.asarray(start_frame) == 0
            frame0 = jnp.where(is_first, ffc[:, :1].astype(x_chunk.dtype),
                               x_chunk[:, :1])
            x_in = jnp.concatenate([frame0, x_chunk[:, 1:]], axis=1)
            if t.ndim == 1:
                t = jnp.repeat(t[:, None], x_chunk.shape[1], axis=1)
            t = t.at[:, 0].set(jnp.where(is_first, 0.0, t[:, 0]))
        else:
            x_in = x_chunk
        return super().forward_chunk(x_in, t, cache, start_frame,
                                     condition=condition, **kwargs)

    def preserve_conditioning(self, x, condition):
        if isinstance(condition, dict) and condition.get("first_frame_latent") is not None:
            first = condition["first_frame_latent"]
            return jnp.concatenate([first[:, :1].astype(x.dtype), x[:, 1:]], axis=1)
        return x
