"""Shared inference helpers (ref ``scripts/inference/inference_utils.py``)."""

from __future__ import annotations

import os
import sys
from typing import Optional

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO_ROOT)


def load_prompt_file(path: str):
    """Read a prompt-list file: one prompt per line, blank lines and
    ``#``-comments skipped (ref CLI ``--prompt_file`` assets under
    ``scripts/inference/prompts/``)."""
    with open(path) as f:
        prompts = [ln.strip() for ln in f if ln.strip() and not ln.startswith("#")]
    if not prompts:
        raise SystemExit(f"prompt file {path} has no prompts")
    return prompts


def init_model(config):
    """Instantiate the method object from a config (ref ``inference_utils.py:75``)."""
    from fastgen_tpu.utils import instantiate

    model = instantiate(config.model_class, config=config.model)
    model.init_optimizers()
    return model


def load_state(config, model, ckpt_path: Optional[str] = None, step=None):
    """Restore the MethodState from a run's checkpoint dir (or a given path)."""
    from fastgen_tpu.utils.checkpointer import Checkpointer
    import jax

    state = model.init_state(jax.random.PRNGKey(config.trainer.seed))
    save_dir = ckpt_path or os.path.join(config.log_config.save_path,
                                         config.trainer.checkpointer.save_dir)
    ckpt = Checkpointer(save_dir, async_save=False)
    # checkpoints exclude frozen nets (teacher/cm_teacher); restore into the
    # pruned template and re-attach the initialized/pretrained frozen params
    restored, _, found = ckpt.load(model.prune_for_checkpoint(state), step=step)
    if restored is None:
        raise FileNotFoundError(f"No checkpoint found in {save_dir}")
    return model.restore_frozen(restored, state), found


def select_params(model, state, use_ema: bool = True):
    """EMA params if present, else the raw student (ref EMA-or-net key pick,
    ``inference_utils.py:105``)."""
    if use_ema and state.ema:
        name = sorted(state.ema.keys())[0]
        return state.ema[name]
    return state.params["net"]


def save_image_grid(images, path: str):
    """[-1,1] NHWC float -> one PNG grid."""
    import numpy as np
    import PIL.Image

    arr = np.nan_to_num(np.asarray(images, np.float32))
    arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
    n = arr.shape[0]
    side = int(np.ceil(np.sqrt(n)))
    h, w, c = arr.shape[1:]
    grid = np.zeros((side * h, side * w, c), np.uint8)
    for i in range(n):
        r, col = divmod(i, side)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = arr[i]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    PIL.Image.fromarray(grid.squeeze()).save(path)
    return path


def save_images(images, out_dir: str, prefix: str):
    import numpy as np
    import PIL.Image

    os.makedirs(out_dir, exist_ok=True)
    arr = np.nan_to_num(np.asarray(images, np.float32))
    arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
    paths = []
    for i, img in enumerate(arr):
        p = os.path.join(out_dir, f"{prefix}_{i:05d}.png")
        PIL.Image.fromarray(img.squeeze()).save(p)
        paths.append(p)
    return paths


def save_video_frames(video, out_dir: str, prefix: str, fps: int = 16):
    """[-1,1] [T,H,W,C] -> per-frame PNGs + an animated GIF + an .npz
    (no av/ffmpeg codec in this image; GIF is the codec-free playable)."""
    import numpy as np
    import PIL.Image

    os.makedirs(out_dir, exist_ok=True)
    arr = np.nan_to_num(np.asarray(video, np.float32))
    arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
    frames = []
    for ti, frame in enumerate(arr):
        img = PIL.Image.fromarray(frame.squeeze())
        img.save(os.path.join(out_dir, f"{prefix}_f{ti:04d}.png"))
        frames.append(img.convert("P", palette=PIL.Image.ADAPTIVE))
    if len(frames) > 1:
        frames[0].save(os.path.join(out_dir, f"{prefix}.gif"), save_all=True,
                       append_images=frames[1:], duration=int(1000 / fps),
                       loop=0)
    np.savez_compressed(os.path.join(out_dir, f"{prefix}.npz"), video=arr)
    return out_dir


# --------------------------------------------------------------------------
# Conditioning-media loading + preparation (ref video_model_inference.py:
# load_conditioning_video:63-125, load_conditioning_image:127-177, preparers
# prepare_wani2v_condition:178 / prepare_cosmos_v2w_condition:254 /
# prepare_vacewan_condition:296)
# --------------------------------------------------------------------------

def vae_scale_factors(vae):
    """(temporal, spatial) compression of a VAE wrapper; (1, 1) without one."""
    if vae is None:
        return 1, 1
    m = vae.module
    sf = 2 ** (len(m.ch_mult) - 1)
    tf = 2 ** sum(bool(b) for b in getattr(m, "temporal_downsample", ()))
    return tf, sf


def load_image_file(path: str, height: int, width: int):
    """PNG/JPG -> [H, W, 3] float32 in [-1, 1] (bicubic resize)."""
    import numpy as np
    import PIL.Image

    img = PIL.Image.open(path).convert("RGB").resize((width, height),
                                                     PIL.Image.BICUBIC)
    return np.asarray(img, np.float32) / 127.5 - 1.0


def load_video_frames_file(path: str, num_frames: int, height: int, width: int):
    """``.npy``/``.npz`` array or a directory of image frames -> [T, H, W, 3]
    float32 in [-1, 1]. Short clips pad with the last frame; long clips use a
    centered segment (ref ``video_model_inference.py:110-119``)."""
    import numpy as np
    import PIL.Image

    if os.path.isdir(path):
        files = sorted(os.path.join(path, f) for f in os.listdir(path)
                       if f.lower().endswith((".png", ".jpg", ".jpeg")))
        if not files:
            raise FileNotFoundError(f"no image frames in {path}")
        arr = np.stack([load_image_file(f, height, width) for f in files])
    else:
        arr = np.load(path)
        if hasattr(arr, "files"):              # npz
            arr = arr[arr.files[0]]
        arr = np.asarray(arr, np.float32)
        if arr.max() > 2.0:                    # uint8-range payload
            arr = arr / 127.5 - 1.0
        if arr.shape[1] != height or arr.shape[2] != width:
            frames = [np.asarray(PIL.Image.fromarray(
                np.clip((f + 1) * 127.5, 0, 255).astype(np.uint8)).resize(
                    (width, height), PIL.Image.BICUBIC), np.float32) / 127.5 - 1.0
                for f in arr]
            arr = np.stack(frames)
    t = arr.shape[0]
    if t < num_frames:
        arr = np.concatenate(
            [arr, np.repeat(arr[-1:], num_frames - t, axis=0)], axis=0)
    elif t > num_frames:
        start = max(0, (t - num_frames) // 2)
        arr = arr[start:start + num_frames]
    return arr


def prepare_video_conditions(model, prompts, neg_prompts=None, image=None,
                             cond_video=None, rng=None):
    """Build training-consistent condition dicts for the video CLI by running
    the conditioning media through ``preprocess_data`` itself (the reference
    re-implements per-model preparers; routing through the training path
    guarantees the layouts match training exactly).

    ``image`` [H,W,3] / ``cond_video`` [T,H,W,3] are pixels in [-1,1];
    prompts are strings (encoded in-process) or precomputed embedding dicts.
    Returns ``(condition, neg_condition)``.
    """
    import numpy as np
    import jax
    from fastgen_tpu.data.preprocess import preprocess_data

    t_latent = model.input_shape[0]
    tf, sf = vae_scale_factors(getattr(model, "vae", None))
    pixel_t = 1 + tf * (t_latent - 1)
    h, w = model.input_shape[1] * sf, model.input_shape[2] * sf

    if cond_video is not None:
        clip = np.asarray(cond_video, np.float32)
    elif image is not None:
        # replicate the image to the full pixel clip
        # (ref load_conditioning_image:127-177)
        clip = np.repeat(np.asarray(image, np.float32)[None], pixel_t, axis=0)
    else:
        clip = np.zeros((pixel_t, h, w, 3), np.float32)

    batch = {"real": clip[None]}
    if isinstance(prompts, (list, tuple)):
        batch["condition"] = list(prompts)
        batch["neg_condition"] = list(neg_prompts) if neg_prompts else \
            [""] * len(prompts)
    else:                                   # precomputed embedding dict/array
        batch["condition"] = prompts
        if neg_prompts is not None:
            batch["neg_condition"] = neg_prompts
    out = preprocess_data(model, batch,
                          rng=rng if rng is not None else jax.random.PRNGKey(0))
    cond, neg = out.get("condition"), out.get("neg_condition")
    if cond is not None and not isinstance(cond, dict):
        cond = {"text_embeds": cond}
    if neg is not None and not isinstance(neg, dict):
        neg = {"text_embeds": neg}
    if isinstance(prompts, (list, tuple)):
        n = len(prompts)
    elif isinstance(prompts, dict) and "text_embeds" in prompts:
        # precomputed-embedding path: batch size rides in the embeddings
        n = int(prompts["text_embeds"].shape[0])
    else:
        n = None
    if n and n > 1:
        import jax.numpy as jnp
        # conditioning media is shared across samples; broadcast batch-1 leaves
        def rep(v):
            return jnp.repeat(v, n, axis=0) if hasattr(v, "shape") and \
                v.shape[:1] == (1,) else v
        cond = {k: rep(v) for k, v in cond.items()} if cond else cond
        neg = {k: rep(v) for k, v in neg.items()} if neg else neg
    return cond, neg
