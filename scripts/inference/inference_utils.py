"""Shared inference helpers (ref ``scripts/inference/inference_utils.py``)."""

from __future__ import annotations

import os
import sys
from typing import Optional

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO_ROOT)


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
    restored, _, found = ckpt.load(state, step=step)
    if restored is None:
        raise FileNotFoundError(f"No checkpoint found in {save_dir}")
    return restored, found


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


def save_video_frames(video, out_dir: str, prefix: str):
    """[-1,1] [T,H,W,C] -> per-frame PNGs + an .npz (no av codec in image)."""
    import numpy as np
    import PIL.Image

    os.makedirs(out_dir, exist_ok=True)
    arr = np.nan_to_num(np.asarray(video, np.float32))
    arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
    for ti, frame in enumerate(arr):
        PIL.Image.fromarray(frame.squeeze()).save(
            os.path.join(out_dir, f"{prefix}_f{ti:04d}.png"))
    np.savez_compressed(os.path.join(out_dir, f"{prefix}.npz"), video=arr)
    return out_dir
