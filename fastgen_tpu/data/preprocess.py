"""Batch preprocessing: raw pixels/text -> latents/embeddings.

TPU-native counterpart of ``Trainer.preprocess_data``
(ref ``fastgen/trainer.py:374-476``):

* ``real`` / ``noise`` raw pixels are VAE-encoded when the model carries a
  ``vae`` and the batch is not already in latent space; raw values are kept
  under ``real_raw`` / ``noise_raw``;
* ``condition`` / ``neg_condition`` lists of prompt strings are text-encoded;
* I2V: the first raw frame becomes ``first_frame_cond`` — zero-padded to the
  full clip + a 4-channel mask when ``net.concat_mask`` (Wan2.1), or a single
  clean latent frame for frame-replacement models — VAE-encoded with
  ``mode="argmax"`` like the reference (``trainer.py:433``), plus
  ``first_frame_latent`` for ``preserve_conditioning``;
* CLIP image embeddings of the first frame -> ``encoder_hidden_states_image``;
* vid2vid: ``vid_context`` via ``net.prepare_vid_conditioning`` (VACE);
* Cosmos video2world: ``conditioning_latents`` + ``condition_mask``.

Deviation from the reference: the video-context outputs are merged into the
``condition`` dict (the reference keeps them as sibling batch keys and moves
them in ``model._prepare_training_data``, ``model.py:431-485``) — our nets
read every conditioning signal from one dict, which keeps the jitted step
signature stable.

Layouts are TPU-native: images [B,H,W,C], videos [B,T,H,W,C].
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _is_text_list(v) -> bool:
    return isinstance(v, (list, tuple)) and len(v) > 0 and isinstance(v[0], str)


def _needs_vae(x, input_shape) -> bool:
    """True when the batch is raw pixels, not latents (the reference compares
    channel counts, ``trainer.py:404``; channels are trailing here)."""
    return x.ndim >= 4 and x.shape[-1] != input_shape[-1]


def _encode_cond_first_frame(vae, first, concat_mask: bool, num_frames: int):
    """first [B,1,H,W,C] raw -> latent conditioning for I2V."""
    if concat_mask:
        b, _, h, w, c = first.shape
        padded = jnp.concatenate(
            [first, jnp.zeros((b, num_frames - 1, h, w, c), first.dtype)], axis=1)
        lat = vae.encode(padded, mode="argmax")
        mask = jnp.zeros(lat.shape[:-1] + (4,), lat.dtype)
        mask = mask.at[:, :1].set(1.0)
        return jnp.concatenate([mask, lat], axis=-1), lat[:, :1]
    lat = vae.encode(first, mode="argmax")
    return lat, lat


def preprocess_data(model, data: Dict[str, Any], augment_pipe=None,
                    rng: Optional[jax.Array] = None) -> Dict[str, Any]:
    """Encode a raw batch in place of the reference's autocast block."""
    data = dict(data)
    net = model.net
    vae = getattr(model, "vae", None)
    text_encoder = getattr(model, "text_encoder", None)
    image_encoder = getattr(model, "image_encoder", None)
    enc_dtype = getattr(model, "precision_amp_enc", None) or model.precision

    if rng is None:
        rng = jax.random.PRNGKey(0)

    if augment_pipe is not None:
        rng, sub = jax.random.split(rng)
        data = augment_pipe(sub, data)

    # ---- data / noise -> latents (ref trainer.py:399-407)
    for k in ("real", "noise"):
        raw_k = f"{k}_raw"
        if k in data and raw_k not in data and not _is_text_list(data[k]):
            x = jnp.asarray(data[k])
            data[raw_k] = x
            if vae is not None and _needs_vae(x, model.input_shape):
                rng, sub = jax.random.split(rng)
                data[k] = vae.encode(x, rng=sub, precision=enc_dtype)

    # ---- text conditions (ref trainer.py:409-414)
    for k in ("condition", "neg_condition"):
        raw_k = f"{k}_raw"
        if k in data and raw_k not in data and _is_text_list(data[k]):
            data[raw_k] = data[k]
            if text_encoder is None:
                raise ValueError(
                    f"batch[{k!r}] holds prompt strings but the model has no "
                    "text_encoder configured (model.text_encoder)")
            emb = text_encoder.encode(data[k], precision=enc_dtype)
            data[k] = emb if isinstance(emb, dict) else {"text_embeds": emb}

    # ---- video context (ref trainer.py:416-471)
    if "real_raw" in data and data["real_raw"].ndim == 5:
        real_raw = data["real_raw"]
        cond = data.get("condition")
        cond = dict(cond) if isinstance(cond, dict) else (
            {} if cond is None else {"text_embeds": cond})

        if getattr(net, "is_i2v", False):
            first = real_raw[:, :1]
            if vae is not None:
                ffc, ff_lat = _encode_cond_first_frame(
                    vae, first, getattr(net, "concat_mask", True),
                    real_raw.shape[1])
            else:
                ffc, ff_lat = first, first
            cond["first_frame_cond"] = ffc.astype(enc_dtype)
            cond["first_frame_latent"] = ff_lat.astype(enc_dtype)

        if image_encoder is not None:
            cond["encoder_hidden_states_image"] = image_encoder.encode(
                real_raw[:, 0], precision=enc_dtype)

        if getattr(net, "is_vid2vid", False) and "vid_context" not in cond:
            # VACE control context, by priority (ref trainer.py:443-452 +
            # vace_depth_annotator.py): precomputed latents -> raw control
            # video -> on-the-fly depth annotation -> the clip itself.
            if "vid_context" in data or "depth_latent" in data:
                cond["vid_context"] = jnp.asarray(
                    data.get("vid_context", data.get("depth_latent")), enc_dtype)
            else:
                ctrl = data.get("control_video")
                annotator = getattr(model, "depth_annotator", None)
                if ctrl is None and annotator is not None:
                    # annotator expects [0,1] RGB; batch values are [-1,1]
                    ctrl = annotator((real_raw + 1.0) * 0.5) * 2.0 - 1.0
                elif ctrl is None:
                    ctrl = real_raw
                ctrl = jnp.asarray(ctrl)
                if vae is not None and _needs_vae(ctrl, model.input_shape):
                    ctrl = vae.encode(ctrl, mode="argmax", precision=enc_dtype)
                cond["vid_context"] = ctrl.astype(enc_dtype)

        if getattr(net, "is_video2world", False):
            n_cond = getattr(net, "num_conditioning_frames", 1)
            first_frames = real_raw[:, :n_cond]
            lat = (vae.encode(first_frames, mode="argmax", precision=enc_dtype)
                   if vae is not None else first_frames)
            t_latent = data["real"].shape[1]
            t_cond = lat.shape[1]
            # pad conditioning latents to the full latent clip, mask marks them
            pad = jnp.zeros((lat.shape[0], t_latent - t_cond) + lat.shape[2:],
                            lat.dtype)
            cond["conditioning_latents"] = jnp.concatenate([lat, pad], axis=1)
            mask = jnp.zeros((lat.shape[0], t_latent) + lat.shape[2:-1] + (1,),
                             lat.dtype)
            cond["condition_mask"] = mask.at[:, :t_cond].set(1.0)

        if cond:
            data["condition"] = cond
            # CFG negates text only; video context is shared with neg_condition
            neg = data.get("neg_condition")
            if isinstance(neg, dict) or neg is None:
                merged = dict(cond)
                if isinstance(neg, dict):
                    merged.update(neg)
                    data["neg_condition"] = merged
            elif hasattr(neg, "shape"):
                merged = dict(cond)
                merged["text_embeds"] = neg
                data["neg_condition"] = merged

    # ---- final dtype pass (ref trainer.py:473-474): device put happens at
    # shard_batch; here we only normalize floating dtypes
    def cast(v):
        # v.dtype directly: jnp.asarray(v) here would do an H2D transfer of
        # the whole leaf just to inspect its dtype
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating):
            return jnp.asarray(v, model.precision)
        return v

    return {k: (jax.tree_util.tree_map(cast, v)
                if not _is_text_list(v) and not k.endswith("_raw") else v)
            for k, v in data.items()}
