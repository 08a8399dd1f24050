"""InceptionV3 FID detector in flax.linen (ref ``fastgen/networks/inception.py:23``
loads NVIDIA's pickled detector via torch; this is a native JAX port so the
eval loop has no torch runtime dependency).

Architecture follows pytorch-fid's ``pt_inception-2015-12-05`` port of the
original TF FID network: torchvision InceptionV3 layout with the FID-specific
deviations (avg-pool branches use ``count_include_pad=False``; ``Mixed_7b``
pools with avg, ``Mixed_7c`` with max; 1008-way fc). Weights load from the
pytorch-fid state dict (``pt_inception-2015-12-05-6726825d.pth``) via
``convert_inception``. Inference-only: BatchNorm uses stored running stats
(eps 1e-3).

Inputs: uint8 [N, H, W, 3] -> bilinear resize to 299 (no antialias, matching
``F.interpolate(..., align_corners=False)``) -> scaled to [-1, 1]. Features:
the 2048-dim pre-fc pooled activations (``pool3``), the standard FID layer.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


_CALIBRATING = False


class _calibration:
    """While active, every BasicConv2d normalizes with the *current batch's*
    statistics and sows them into the ``calib`` collection — used to give a
    randomly-initialized detector healthy activation scales at depth (random
    deep CNNs otherwise collapse to near-constant features). Run eagerly:

        with _calibration():
            _, aux = net.apply(vars, imgs, mutable=["calib"])
        vars = apply_calibration(vars, aux["calib"])
    """

    def __enter__(self):
        global _CALIBRATING
        _CALIBRATING = True

    def __exit__(self, *a):
        global _CALIBRATING
        _CALIBRATING = False


def apply_calibration(variables: Dict[str, Any], calib: Dict[str, Any]
                      ) -> Dict[str, Any]:
    """Write sowed per-layer batch stats into the bn_mean/bn_var params."""
    import flax

    params = flax.core.unfreeze(variables)["params"]

    def walk(p_node, c_node):
        for k, v in c_node.items():
            if k == "calib_stats":
                if isinstance(v, tuple) and len(v) == 1:
                    v = v[0]
                m, var = v
                p_node["bn_mean"] = np.asarray(m)
                p_node["bn_var"] = np.asarray(var)
            else:
                walk(p_node[k], v)

    walk(params, calib)
    return {"params": params}


class BasicConv2d(nn.Module):
    """Conv (no bias) + BatchNorm(eps=1e-3, running stats) + ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        if _CALIBRATING:
            mean = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.var(x, axis=(0, 1, 2))
            self.sow("calib", "calib_stats", (mean, var),
                     init_fn=lambda: None, reduce_fn=lambda _, b: b)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _avg_pool_3x3_nopad_count(x):
    """3x3 stride-1 avg pool, pad 1, count_include_pad=False (the FID
    network's deviation from torchvision)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


def _max_pool(x, window, strides, padding=((0, 0), (0, 0))):
    return nn.max_pool(x, window, strides=strides, padding=padding)


_P1 = ((1, 1), (1, 1))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)),
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_P1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_P1, name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(
            _avg_pool_3x3_nopad_count(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_P1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(
            _avg_pool_3x3_nopad_count(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str  # "avg" (Mixed_7b) | "max" (Mixed_7c)

    @nn.compact
    def __call__(self, x):
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=p13, name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=p31, name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_P1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=p13, name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=p31, name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "avg":
            pooled = _avg_pool_3x3_nopad_count(x)
        else:
            pooled = _max_pool(x, (3, 3), (1, 1), padding=_P1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """FID InceptionV3; ``__call__`` returns (features_2048, logits_1008)."""

    num_classes: int = 1008

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_P1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, (3, 3), (2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))          # adaptive avg pool -> 2048
        logits = nn.Dense(self.num_classes, name="fc")(feats)
        return feats, logits


def preprocess_uint8(images_uint8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [N, H, W, 3] -> float32 [N, 299, 299, 3] in [-1, 1]
    (pytorch-fid: bilinear resize w/o antialias, then x*2-1)."""
    x = images_uint8.astype(jnp.float32) / 255.0
    n, h, w, c = x.shape
    if (h, w) != (299, 299):
        x = jax.image.resize(x, (n, 299, 299, c), method="bilinear",
                             antialias=False)
    return x * 2.0 - 1.0


def convert_inception(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """pytorch-fid / torchvision InceptionV3 state dict -> flax params.

    Keys: ``<block>.conv.weight`` [O,I,kh,kw], ``<block>.bn.{weight,bias,
    running_mean,running_var}``, ``fc.{weight,bias}``. Aux-classifier keys
    (``AuxLogits.*``) and ``num_batches_tracked`` are skipped.
    """
    from fastgen_tpu.utils.torch_convert import _set_nested, _to_conv2d, _to_dense

    params: Dict[str, Any] = {}
    for key, v in state_dict.items():
        if key.startswith("AuxLogits") or "num_batches_tracked" in key:
            continue
        v = np.asarray(v)
        parts = key.split(".")
        if parts[0] == "fc":
            leaf = {"weight": ("kernel", _to_dense), "bias": ("bias", None)}[parts[1]]
            _set_nested(params, ("fc", leaf[0]), leaf[1](v) if leaf[1] else v)
            continue
        *scope, mod, leaf = parts
        if mod == "conv" and leaf == "weight":
            _set_nested(params, (*scope, "conv", "kernel"), _to_conv2d(v))
        elif mod == "bn":
            name = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean", "running_var": "bn_var"}[leaf]
            _set_nested(params, (*scope, name), v)
        else:
            raise ValueError(f"Unmapped inception key {key}")
    return {"params": params}
