"""Crop / resize utilities (ref ``fastgen/datasets/crop_resize.py:38-141``)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import PIL.Image


def resize_aspect_preserving(img: PIL.Image.Image, target: int) -> PIL.Image.Image:
    """Resize so the SHORT side equals ``target`` (aspect preserved)."""
    w, h = img.size
    if min(w, h) == target:
        return img
    if w < h:
        new_w, new_h = target, int(round(h * target / w))
    else:
        new_w, new_h = int(round(w * target / h)), target
    return img.resize((new_w, new_h), PIL.Image.LANCZOS)


def center_crop(img: PIL.Image.Image, size: Tuple[int, int]) -> PIL.Image.Image:
    tw, th = size
    w, h = img.size
    left = (w - tw) // 2
    top = (h - th) // 2
    return img.crop((left, top, left + tw, top + th))


def random_crop(img: PIL.Image.Image, size: Tuple[int, int],
                rng: Optional[np.random.RandomState] = None) -> PIL.Image.Image:
    rng = rng or np.random
    tw, th = size
    w, h = img.size
    left = int(rng.randint(0, max(w - tw, 0) + 1))
    top = int(rng.randint(0, max(h - th, 0) + 1))
    return img.crop((left, top, left + tw, top + th))


def crop_resize_image(img: PIL.Image.Image, resolution: int,
                      crop_mode: str = "center",
                      rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Aspect-preserving resize + crop to [resolution, resolution] uint8 HWC."""
    img = img.convert("RGB")
    img = resize_aspect_preserving(img, resolution)
    if crop_mode == "center":
        img = center_crop(img, (resolution, resolution))
    elif crop_mode == "random":
        img = random_crop(img, (resolution, resolution), rng)
    else:
        raise ValueError(f"Unknown crop mode {crop_mode!r}")
    return np.asarray(img, np.uint8)
