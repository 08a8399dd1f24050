"""EDM/ADA-style augmentation pipeline with conditioning labels, in jnp/NHWC
(ref ``fastgen/datasets/augment.py:280-559``).

Same parameter sampling and label layout as the reference (labels feed the
networks' ``aug_condition`` input, ``EDM/network.py:904-917``):

* pixel blitting (xflip / yflip / rotate_int / translate_int) — exact;
* geometric (scale / rotate_frac / aniso / translate_frac) — same parameter
  distributions and labels; the warp applies the reference's sym6-wavelet
  2x up/down anti-aliasing around the affine resample (``antialias=True``,
  the default). The only deviation is TPU-shaped: the reference reflect-pads
  by a data-dependent per-batch margin clamped to ``width-1``; here the pad
  is always that static maximum so the whole pipe stays jittable;
* color (brightness / contrast / lumaflip / hue / saturation) — exact
  homogeneous color-matrix math.

Runs jitted on device with an explicit PRNG key (the loader calls it on the
already-sharded batch, so augmentation rides the accelerator, not the host).
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp


# sym6 orthogonal wavelet scaling filter (pywt dec_lo layout), normalized to
# unit DC gain — the ADA geometric anti-aliasing filter (ref augment pipe
# registers the same 12-tap sym6 as its geometry filter). Orthogonality of
# the √2-normalized taps makes the 2x up→down chain an exact identity, so
# prob-gated-off samples pass through the AA warp unchanged.
_SYM6 = np.array([
    0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
    -0.048311742585633, 0.4910559419267466, 0.787641141030194,
    0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
    0.04472490177066578, 0.0017677118642428036, -0.007800708325034148],
    np.float64)
_SYM6 = _SYM6 / _SYM6.sum()
_HZ_PAD = len(_SYM6) // 4


def _sep_upfirdn(x, taps, axis, up=1, down=1, pad=(0, 0)):
    """1-D upfirdn along a spatial axis of [N,H,W,C]: zero-insert ``up``,
    pad, cross-correlate with ``taps``, decimate ``down``. Flip ``taps``
    before calling for a true convolution. Negative pad crops."""
    c = x.shape[3]
    p0, p1 = pad
    # lhs_dilation inserts zeros only *between* samples; upfirdn's zero-stuff
    # appends (up-1) trailing zeros too — fold them into the high padding
    p1 += up - 1
    if p0 < 0 or p1 < 0:
        sl = [slice(None)] * 4
        sl[axis] = slice(max(-p0, 0), x.shape[axis] - max(-p1, 0))
        x = x[tuple(sl)]
        p0, p1 = max(p0, 0), max(p1, 0)
    kh, kw = (len(taps), 1) if axis == 1 else (1, len(taps))
    kernel = jnp.tile(jnp.asarray(taps, x.dtype).reshape(kh, kw, 1, 1),
                      (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(down, 1) if axis == 1 else (1, down),
        padding=((p0, p1), (0, 0)) if axis == 1 else ((0, 0), (p0, p1)),
        lhs_dilation=(up, 1) if axis == 1 else (1, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def _upsample2x(x):
    """Anti-aliased 2x upsample (separable sym6, true convolution, gain 2/axis)."""
    fw = len(_SYM6)
    taps = _SYM6[::-1] * 2.0
    pad = ((fw + 1) // 2, (fw - 2) // 2)
    x = _sep_upfirdn(x, taps, axis=1, up=2, pad=pad)
    return _sep_upfirdn(x, taps, axis=2, up=2, pad=pad)


def _downsample2x_crop(x, crop):
    """Matched anti-aliased 2x downsample with edge crop (ref's
    ``downsample2d(..., padding=-crop, flip_filter=True)``)."""
    fw = len(_SYM6)
    pad = (-crop + (fw - 1) // 2, -crop + (fw - 2) // 2)
    x = _sep_upfirdn(x, _SYM6, axis=1, down=2, pad=pad)
    return _sep_upfirdn(x, _SYM6, axis=2, down=2, pad=pad)


def _rotate2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([jnp.stack([c, -s, z], -1),
                      jnp.stack([s, c, z], -1),
                      jnp.stack([z, z, o], -1)], -2)


def _scale2d(sx, sy):
    z, o = jnp.zeros_like(sx), jnp.ones_like(sx)
    return jnp.stack([jnp.stack([sx, z, z], -1),
                      jnp.stack([z, sy, z], -1),
                      jnp.stack([z, z, o], -1)], -2)


def _translate2d(tx, ty):
    z, o = jnp.zeros_like(tx), jnp.ones_like(tx)
    return jnp.stack([jnp.stack([o, z, tx], -1),
                      jnp.stack([z, o, ty], -1),
                      jnp.stack([z, z, o], -1)], -2)


def _rotate3d_about(axis, theta):
    """Rotation of the RGB color cube about ``axis`` (homogeneous 4x4)."""
    vx, vy, vz = axis[0], axis[1], axis[2]
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    cc = 1 - c
    n = theta.shape[0]
    m = jnp.zeros((n, 4, 4))
    rows = [
        [vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s],
        [vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s],
        [vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c],
    ]
    for i, row in enumerate(rows):
        for j, vij in enumerate(row):
            m = m.at[:, i, j].set(vij)
    m = m.at[:, 3, 3].set(1.0)
    return m


class AugmentPipe:
    def __init__(self, p=1, xflip=0, yflip=0, rotate_int=0, translate_int=0,
                 translate_int_max=0.125, scale=0, rotate_frac=0, aniso=0,
                 translate_frac=0, scale_std=0.2, rotate_frac_max=1,
                 aniso_std=0.2, aniso_rotate_prob=0.5, translate_frac_std=0.125,
                 brightness=0, contrast=0, lumaflip=0, hue=0, saturation=0,
                 brightness_std=0.2, contrast_std=0.5, hue_max=1,
                 saturation_std=1, antialias=True, warp_impl="matmul"):
        self.antialias = bool(antialias)
        self.warp_impl = str(warp_impl)
        self.p = float(p)
        self.xflip = float(xflip)
        self.yflip = float(yflip)
        self.rotate_int = float(rotate_int)
        self.translate_int = float(translate_int)
        self.translate_int_max = float(translate_int_max)
        self.scale = float(scale)
        self.rotate_frac = float(rotate_frac)
        self.aniso = float(aniso)
        self.translate_frac = float(translate_frac)
        self.scale_std = float(scale_std)
        self.rotate_frac_max = float(rotate_frac_max)
        self.aniso_std = float(aniso_std)
        self.aniso_rotate_prob = float(aniso_rotate_prob)
        self.translate_frac_std = float(translate_frac_std)
        self.brightness = float(brightness)
        self.contrast = float(contrast)
        self.lumaflip = float(lumaflip)
        self.hue = float(hue)
        self.saturation = float(saturation)
        self.brightness_std = float(brightness_std)
        self.contrast_std = float(contrast_std)
        self.hue_max = float(hue_max)
        self.saturation_std = float(saturation_std)
        # all pipe attributes are Python floats (static under the closure),
        # so the whole augment graph compiles once per image shape instead of
        # dispatching ~10² eager ops per batch in the data path
        self._process_jit = jax.jit(self._process)

    @property
    def label_dim(self) -> int:
        dim = 0
        dim += 1 if self.xflip > 0 else 0
        dim += 1 if self.yflip > 0 else 0
        dim += 2 if self.rotate_int > 0 else 0
        dim += 2 if self.translate_int > 0 else 0
        dim += 1 if self.scale > 0 else 0
        dim += 2 if self.rotate_frac > 0 else 0
        dim += 2 if self.aniso > 0 else 0
        dim += 2 if self.translate_frac > 0 else 0
        dim += 1 if self.brightness > 0 else 0
        dim += 1 if self.contrast > 0 else 0
        dim += 1 if self.lumaflip > 0 else 0
        dim += 2 if self.hue > 0 else 0
        dim += 1 if self.saturation > 0 else 0
        return dim

    def process(self, key, images):
        """images [N, H, W, C] -> (augmented, labels [N, label_dim])."""
        return self._process_jit(key, images)

    def _process(self, key, images):
        n, h, w_dim, c = images.shape
        labels = []
        keys = iter(jax.random.split(key, 32))

        def gate(k, prob, val, zero):
            return jnp.where(jax.random.uniform(k, val.shape[:1] + (1,) * (val.ndim - 1))
                             < prob * self.p, val, zero)

        # blitting ---------------------------------------------------------
        if self.xflip > 0:
            wv = jax.random.randint(next(keys), (n, 1, 1, 1), 0, 2)
            wv = gate(next(keys), self.xflip, wv, jnp.zeros_like(wv))
            images = jnp.where(wv == 1, images[:, :, ::-1], images)
            labels.append(wv.reshape(n, 1).astype(jnp.float32))

        if self.yflip > 0:
            wv = jax.random.randint(next(keys), (n, 1, 1, 1), 0, 2)
            wv = gate(next(keys), self.yflip, wv, jnp.zeros_like(wv))
            images = jnp.where(wv == 1, images[:, ::-1], images)
            labels.append(wv.reshape(n, 1).astype(jnp.float32))

        if self.rotate_int > 0:
            wv = jax.random.randint(next(keys), (n, 1, 1, 1), 0, 4)
            wv = gate(next(keys), self.rotate_int, wv, jnp.zeros_like(wv))
            images = jnp.where((wv == 1) | (wv == 2), images[:, :, ::-1], images)
            images = jnp.where((wv == 2) | (wv == 3), images[:, ::-1], images)
            images = jnp.where((wv == 1) | (wv == 3),
                               jnp.swapaxes(images, 1, 2), images)
            labels.append(((wv == 1) | (wv == 2)).reshape(n, 1).astype(jnp.float32))
            labels.append(((wv == 2) | (wv == 3)).reshape(n, 1).astype(jnp.float32))

        if self.translate_int > 0:
            wv = jax.random.uniform(next(keys), (2, n, 1, 1, 1)) * 2 - 1
            wv = jnp.where(jax.random.uniform(next(keys), (1, n, 1, 1, 1))
                           < self.translate_int * self.p, wv, jnp.zeros_like(wv))
            tx = jnp.round(wv[0] * (w_dim * self.translate_int_max)).astype(jnp.int32)
            ty = jnp.round(wv[1] * (h * self.translate_int_max)).astype(jnp.int32)
            ys = jnp.arange(h)[None, :, None, None]
            xs = jnp.arange(w_dim)[None, None, :, None]
            # mirror-wrap indexing (ref ``augment.py:381-384``)
            xi = w_dim - 1 - jnp.abs(w_dim - 1 - (xs - tx) % (w_dim * 2 - 2))
            yi = h - 1 - jnp.abs(h - 1 - (ys + ty) % (h * 2 - 2))
            images = jnp.take_along_axis(images, yi, axis=1)
            images = jnp.take_along_axis(images, xi, axis=2)
            labels.append((tx.reshape(n, 1) / (w_dim * self.translate_int_max))
                          .astype(jnp.float32))
            labels.append((ty.reshape(n, 1) / (h * self.translate_int_max))
                          .astype(jnp.float32))

        # geometric --------------------------------------------------------
        g_inv = jnp.tile(jnp.eye(3)[None], (n, 1, 1))
        any_geom = False

        if self.scale > 0:
            wv = jax.random.normal(next(keys), (n,))
            wv = jnp.where(jax.random.uniform(next(keys), (n,)) < self.scale * self.p,
                           wv, 0.0)
            s = 2.0 ** (wv * self.scale_std)
            g_inv = g_inv @ _scale2d(1 / s, 1 / s)
            labels.append(wv.reshape(n, 1))
            any_geom = True

        if self.rotate_frac > 0:
            wv = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * (
                np.pi * self.rotate_frac_max)
            wv = jnp.where(jax.random.uniform(next(keys), (n,))
                           < self.rotate_frac * self.p, wv, 0.0)
            g_inv = g_inv @ _rotate2d(wv)  # rotate2d_inv(-w) == rotate2d(w)
            labels.append((jnp.cos(wv) - 1).reshape(n, 1))
            labels.append(jnp.sin(wv).reshape(n, 1))
            any_geom = True

        if self.aniso > 0:
            wv = jax.random.normal(next(keys), (n,))
            r = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * np.pi
            wv = jnp.where(jax.random.uniform(next(keys), (n,)) < self.aniso * self.p,
                           wv, 0.0)
            r = jnp.where(jax.random.uniform(next(keys), (n,))
                          < self.aniso_rotate_prob, r, 0.0)
            s = 2.0 ** (wv * self.aniso_std)
            g_inv = g_inv @ _rotate2d(-r) @ _scale2d(1 / s, s) @ _rotate2d(r)
            labels.append((wv * jnp.cos(r)).reshape(n, 1))
            labels.append((wv * jnp.sin(r)).reshape(n, 1))
            any_geom = True

        if self.translate_frac > 0:
            wv = jax.random.normal(next(keys), (2, n))
            wv = jnp.where(jax.random.uniform(next(keys), (1, n))
                           < self.translate_frac * self.p, wv, 0.0)
            g_inv = g_inv @ _translate2d(-wv[0] * (w_dim * self.translate_frac_std),
                                         -wv[1] * (h * self.translate_frac_std))
            labels.append(wv[0].reshape(n, 1))
            labels.append(wv[1].reshape(n, 1))
            any_geom = True

        if any_geom:
            images = self._affine_warp(images, g_inv)

        # color ------------------------------------------------------------
        m = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
        any_color = False
        luma = np.asarray([1, 1, 1, 0]) / np.sqrt(3)
        luma_outer = jnp.asarray(np.outer(luma, luma), jnp.float32)

        if self.brightness > 0:
            wv = jax.random.normal(next(keys), (n,))
            wv = jnp.where(jax.random.uniform(next(keys), (n,))
                           < self.brightness * self.p, wv, 0.0)
            b = wv * self.brightness_std
            t3 = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
            t3 = t3.at[:, 0, 3].set(b).at[:, 1, 3].set(b).at[:, 2, 3].set(b)
            m = t3 @ m
            labels.append(wv.reshape(n, 1))
            any_color = True

        if self.contrast > 0:
            wv = jax.random.normal(next(keys), (n,))
            wv = jnp.where(jax.random.uniform(next(keys), (n,))
                           < self.contrast * self.p, wv, 0.0)
            cmul = 2.0 ** (wv * self.contrast_std)
            s3 = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
            for i in range(3):
                s3 = s3.at[:, i, i].set(cmul)
            m = s3 @ m
            labels.append(wv.reshape(n, 1))
            any_color = True

        if self.lumaflip > 0:
            wv = jax.random.randint(next(keys), (n, 1, 1), 0, 2).astype(jnp.float32)
            wv = jnp.where(jax.random.uniform(next(keys), (n, 1, 1))
                           < self.lumaflip * self.p, wv, 0.0)
            m = (jnp.eye(4)[None] - 2 * luma_outer[None] * wv) @ m
            labels.append(wv.reshape(n, 1))
            any_color = True

        if self.hue > 0:
            wv = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * (np.pi * self.hue_max)
            wv = jnp.where(jax.random.uniform(next(keys), (n,)) < self.hue * self.p,
                           wv, 0.0)
            m = _rotate3d_about(luma[:3] / np.linalg.norm(luma[:3]), wv) @ m
            labels.append((jnp.cos(wv) - 1).reshape(n, 1))
            labels.append(jnp.sin(wv).reshape(n, 1))
            any_color = True

        if self.saturation > 0:
            wv = jax.random.normal(next(keys), (n, 1, 1))
            wv = jnp.where(jax.random.uniform(next(keys), (n, 1, 1))
                           < self.saturation * self.p, wv, 0.0)
            m = (luma_outer[None] + (jnp.eye(4)[None] - luma_outer[None])
                 * (2.0 ** (wv * self.saturation_std))) @ m
            labels.append(wv.reshape(n, 1))
            any_color = True

        if any_color:
            flat = images.reshape(n, h * w_dim, c).transpose(0, 2, 1)  # [N,C,HW]
            if c == 3:
                flat = m[:, :3, :3] @ flat + m[:, :3, 3:]
            elif c == 1:
                m1 = m.mean(axis=1, keepdims=True)
                flat = flat * m1[:, :, :3].sum(axis=2, keepdims=True) + m1[:, :, 3:]
            else:
                raise ValueError("Image must have 1 or 3 channels")
            images = flat.transpose(0, 2, 1).reshape(n, h, w_dim, c)

        label_arr = (jnp.concatenate(labels, axis=1)
                     if labels else jnp.zeros((n, 0), jnp.float32))
        return images, label_arr

    def _resample(self, images, sy, sx, h_out, w_out):
        """Batched bilinear resample at fractional coords.

        images [N,H,W,C], sy/sx [N,P] -> [N,h_out,w_out,C]. Out-of-range
        coords fade to 0 exactly like ``map_coordinates(mode="constant")``.

        TPU-first: the sample is computed as two separable one-hot-weight
        contractions (an MXU matmul over rows + a VPU reduce over columns)
        instead of a 2-D ``lax.gather`` — arbitrary-index gathers serialize
        on TPU while [P,H]x[H,W*C] matmuls run at MXU speed. ``impl="gather"``
        keeps the map_coordinates path for debugging/parity.
        """
        n, h, w_dim, c = images.shape
        if self.warp_impl == "gather":
            def warp_one(img, y, x):
                out = jax.vmap(lambda ch: jax.scipy.ndimage.map_coordinates(
                    ch, [y, x], order=1, mode="constant", cval=0.0),
                    in_axes=2, out_axes=1)(img)
                return out.reshape(h_out, w_out, c)

            return jax.vmap(warp_one)(images, sy, sx)

        wy = jnp.maximum(0.0, 1.0 - jnp.abs(
            sy[:, :, None] - jnp.arange(h, dtype=jnp.float32)))    # [N,P,H]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(
            sx[:, :, None] - jnp.arange(w_dim, dtype=jnp.float32)))  # [N,P,W]
        rows = jnp.einsum("nph,nhwc->npwc", wy, images)            # MXU
        out = jnp.einsum("npw,npwc->npc", wx, rows)                # VPU reduce
        return out.reshape(n, h_out, w_out, c)

    def _affine_warp(self, images, g_inv):
        if self.antialias:
            return self._affine_warp_aa(images, g_inv)
        return self._affine_warp_bilinear(images, g_inv)

    def _affine_warp_aa(self, images, g_inv):
        """ADA geometric warp: reflect-pad -> sym6 2x upsample -> bilinear
        affine resample -> matched sym6 2x downsample + crop.

        Matches the reference's anti-aliased geometry chain with one
        TPU-first change: the reflect-pad margin is the static worst case
        (``w-1``/``h-1``, exactly the reference's clamp ceiling) instead of a
        data-dependent per-batch margin, keeping every shape static under jit.
        """
        n, h, w_dim, c = images.shape
        hp = _HZ_PAD
        px, py = w_dim - 1, h - 1
        x = jnp.pad(images, ((0, 0), (py, py), (px, px), (0, 0)), mode="reflect")
        x = _upsample2x(x)
        h_up, w_up = x.shape[1], x.shape[2]
        h_out, w_out = 2 * (h + 2 * hp), 2 * (w_dim + 2 * hp)

        # conjugate g_inv (centered original-pixel coords, symmetric pad adds
        # no origin shift) into align_corners=False normalized coords of the
        # upsampled source grid vs the enlarged output grid
        s2 = np.diag([2.0, 2.0, 1.0])
        s2i = np.diag([0.5, 0.5, 1.0])
        t_half = np.array([[1, 0, -0.5], [0, 1, -0.5], [0, 0, 1]], np.float64)
        t_half_i = np.array([[1, 0, 0.5], [0, 1, 0.5], [0, 0, 1]], np.float64)
        n_up = np.diag([2.0 / w_up, 2.0 / h_up, 1.0])
        n_out_i = np.diag([w_out / 2.0, h_out / 2.0, 1.0])
        g = jnp.asarray(s2, g_inv.dtype) @ g_inv @ jnp.asarray(s2i, g_inv.dtype)
        g = jnp.asarray(t_half, g.dtype) @ g @ jnp.asarray(t_half_i, g.dtype)
        g = jnp.asarray(n_up, g.dtype) @ g @ jnp.asarray(n_out_i, g.dtype)

        ys = (2.0 * jnp.arange(h_out, dtype=jnp.float32) + 1.0) / h_out - 1.0
        xs = (2.0 * jnp.arange(w_out, dtype=jnp.float32) + 1.0) / w_out - 1.0
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        coords = jnp.stack([gx, gy, jnp.ones_like(gx)], 0).reshape(3, -1)

        src = jnp.einsum("nij,jp->nip", g, coords)                 # [N,3,P]
        sx = (src[:, 0] + 1.0) * (w_up / 2.0) - 0.5
        sy = (src[:, 1] + 1.0) * (h_up / 2.0) - 0.5
        x = self._resample(x, sy, sx, h_out, w_out)
        return _downsample2x_crop(x, 2 * hp)

    def _affine_warp_bilinear(self, images, g_inv):
        """Plain bilinear affine resample (``antialias=False`` fast path)."""
        n, h, w_dim, c = images.shape
        cy, cx = (h - 1) / 2, (w_dim - 1) / 2
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w_dim, dtype=jnp.float32), indexing="ij")
        coords = jnp.stack([xs - cx, ys - cy, jnp.ones_like(xs)], 0).reshape(3, -1)
        src = jnp.einsum("nij,jp->nip", g_inv, coords)  # [N, 3, HW]
        return self._resample(images, src[:, 1] + cy, src[:, 0] + cx, h, w_dim)

    def __call__(self, key, data):
        """Batch-dict interface (ref ``augment.py:552-559``)."""
        images, aug_cond = self.process(key, data["real"])
        data = dict(data)
        data["real"] = images
        if data.get("condition") is not None:
            data["condition"] = {"orig_condition": data["condition"],
                                 "aug_condition": aug_cond}
        else:
            data["condition"] = {"aug_condition": aug_cond}
        return data
