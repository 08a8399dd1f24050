"""Generate a class-conditional procedural image dataset in the EDM zip layout
(``<out>.zip`` with pngs + ``dataset.json``, the format of
``fastgen_tpu/data/class_cond_dataset.py`` / ref ``fastgen/datasets/class_cond_dataset.py``).

Purpose: the build environment has zero egress — CIFAR-10 and pretrained
teachers cannot be downloaded — so the full quality pipeline
(teacher pretrain -> DMD2 distill -> 50k-sample FID sweep) is demonstrated
end-to-end on a procedurally generated dataset with real visual structure:
10 texture/shape families with heavy intra-class variation (color, phase,
frequency, position, global illumination). The point is that every stage of
the recipe runs and the FID separates good from bad models; the absolute
number is not comparable to CIFAR-10 FID.

    python scripts/make_procedural_dataset.py --out /root/data/procgen-32x32.zip \
        --num 50000 --res 32
"""

from __future__ import annotations

import argparse
import io
import json
import os
import zipfile

import numpy as np
import PIL.Image


def _grid(res):
    y, x = np.mgrid[0:res, 0:res].astype(np.float32) / res
    return x, y


def _smooth_noise(rs, res, scale):
    """Low-frequency random field: upsampled coarse noise (perlin-ish)."""
    coarse = rs.randn(scale, scale).astype(np.float32)
    img = np.asarray(PIL.Image.fromarray(coarse).resize((res, res),
                                                        PIL.Image.BICUBIC))
    return (img - img.min()) / (img.max() - img.min() + 1e-8)


def _colorize(field, c0, c1):
    """Map a [H,W] field in [0,1] onto a color gradient c0 -> c1."""
    return c0[None, None] * (1 - field[..., None]) + c1[None, None] * field[..., None]


def render(cls: int, rs: np.random.RandomState, res: int) -> np.ndarray:
    x, y = _grid(res)
    c0 = rs.uniform(0, 1, 3).astype(np.float32)
    c1 = rs.uniform(0, 1, 3).astype(np.float32)
    if cls == 0:  # oriented stripes
        ang = rs.uniform(0, np.pi)
        freq = rs.uniform(3, 9)
        ph = rs.uniform(0, 2 * np.pi)
        f = 0.5 + 0.5 * np.sin(2 * np.pi * freq *
                               (x * np.cos(ang) + y * np.sin(ang)) + ph)
    elif cls == 1:  # checkerboard
        n = rs.randint(3, 8)
        ph = rs.uniform(0, 1, 2)
        f = ((np.floor((x + ph[0]) * n) + np.floor((y + ph[1]) * n)) % 2)
    elif cls == 2:  # filled circle on gradient background
        cx, cy = rs.uniform(0.25, 0.75, 2)
        r = rs.uniform(0.12, 0.3)
        f = (((x - cx) ** 2 + (y - cy) ** 2) < r * r).astype(np.float32)
    elif cls == 3:  # axis-aligned rectangle
        x0, y0 = rs.uniform(0.05, 0.45, 2)
        w, h = rs.uniform(0.2, 0.5, 2)
        f = ((x > x0) & (x < x0 + w) & (y > y0) & (y < y0 + h)).astype(np.float32)
    elif cls == 4:  # radial rings
        cx, cy = rs.uniform(0.3, 0.7, 2)
        freq = rs.uniform(4, 10)
        rr = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
        f = 0.5 + 0.5 * np.sin(2 * np.pi * freq * rr + rs.uniform(0, 6.28))
    elif cls == 5:  # plasma (sum of sinusoids)
        f = np.zeros_like(x)
        for _ in range(3):
            kx, ky = rs.uniform(-6, 6, 2)
            f = f + np.sin(2 * np.pi * (kx * x + ky * y) + rs.uniform(0, 6.28))
        f = (f - f.min()) / (f.max() - f.min() + 1e-8)
    elif cls == 6:  # smooth random field
        f = _smooth_noise(rs, res, rs.randint(3, 6))
    elif cls == 7:  # voronoi-ish cells (nearest of k seed points)
        k = rs.randint(4, 9)
        pts = rs.uniform(0, 1, (k, 2)).astype(np.float32)
        d = np.min((x[..., None] - pts[None, None, :, 0]) ** 2 +
                   (y[..., None] - pts[None, None, :, 1]) ** 2, axis=-1)
        f = np.sqrt(d)
        f = (f - f.min()) / (f.max() - f.min() + 1e-8)
    elif cls == 8:  # diagonal gradient + hard edge
        ang = rs.uniform(0, 2 * np.pi)
        t = x * np.cos(ang) + y * np.sin(ang)
        f = np.clip((t - t.min()) / (t.max() - t.min() + 1e-8), 0, 1)
        f = np.where(f > rs.uniform(0.3, 0.7), f, 0.15 * f)
    else:  # cls == 9: cross/plus shape
        cx, cy = rs.uniform(0.35, 0.65, 2)
        wdt = rs.uniform(0.06, 0.16)
        f = (((np.abs(x - cx) < wdt) | (np.abs(y - cy) < wdt))
             ).astype(np.float32)
    img = _colorize(f.astype(np.float32), c0, c1)
    # global illumination jitter + slight sensor noise for intra-class spread
    img = img * rs.uniform(0.7, 1.0) + rs.uniform(0, 0.15)
    img = img + rs.randn(res, res, 3).astype(np.float32) * 0.02
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--num", type=int, default=50000)
    p.add_argument("--res", type=int, default=32)
    p.add_argument("--classes", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    labels = []
    # atomic: a timeout mid-write must not leave a truncated zip that later
    # stages silently consume (the [ ! -f ] guards in the pipeline scripts
    # would treat a corrupt partial file as done)
    tmp_out = args.out + ".tmp"
    with zipfile.ZipFile(tmp_out, "w", zipfile.ZIP_STORED) as z:
        for i in range(args.num):
            cls = i % args.classes
            rs = np.random.RandomState((args.seed + 7919 * i) % (1 << 31))
            img = render(cls, rs, args.res)
            fname = f"img{i:07d}.png"
            buf = io.BytesIO()
            PIL.Image.fromarray(img).save(buf, format="png")
            z.writestr(fname, buf.getvalue())
            labels.append([fname, cls])
            if (i + 1) % 5000 == 0:
                print(f"{i + 1}/{args.num}")
        z.writestr("dataset.json", json.dumps({"labels": labels}))
    os.replace(tmp_out, args.out)
    print(f"wrote {args.num} images -> {args.out}")


if __name__ == "__main__":
    main()
