"""Torch checkpoint -> JAX param-tree converters.

Every method starts from a pretrained torch teacher (SURVEY §7 "checkpoint
interop"), so this is the bridge: load a ``.pth``/``.pkl`` state dict with
torch-CPU and remap names/layouts into the flax trees of our networks.

Layout rules:
* torch Linear ``weight [O, I]``      -> dense ``kernel [I, O]`` (transpose)
* torch Conv2d ``weight [O, I, kh, kw]`` -> ``kernel [kh, kw, I, O]``
* torch Conv3d ``weight [O, I, kt, kh, kw]`` -> ``kernel [kt, kh, kw, I, O]``
* GroupNorm/LayerNorm ``weight``      -> ``scale``
* buffers (RoPE tables, pos_embed) map into the ``buffers`` collection

Name maps are per-architecture; ``convert_edm`` covers EDMPrecond
(SongUNet/DhariwalUNet — the flax modules use the same submodule names with
``.`` -> ``_`` in the enc/dec dicts), ``convert_dit`` covers DiT including the
Facebook-format aliases the reference also handles
(``DiT/network.py:346-404``).
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Dict, Tuple

import numpy as np

from fastgen_tpu.utils import logging_utils as logger


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.pth`` checkpoint (or EDM-style pickle) to numpy."""
    import torch

    if path.endswith((".pkl", ".pickle")):
        with open(path, "rb") as f:
            data = pickle.load(f)
        # EDM pickles hold {'ema': network} module objects
        if isinstance(data, dict) and hasattr(data.get("ema"), "state_dict"):
            sd = data["ema"].state_dict()
        elif hasattr(data, "state_dict"):
            sd = data.state_dict()
        else:
            sd = data
    else:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        # trainer checkpoints: {"model": {"net": sd, ...}, ...}
        if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
            sd = sd["model"].get("net", sd["model"])
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def _set_nested(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _to_dense(w):     # [O, I] -> [I, O]
    return np.ascontiguousarray(w.T)


def _to_conv2d(w):    # [O, I, kh, kw] -> [kh, kw, I, O]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _to_conv3d(w):    # [O, I, kt, kh, kw] -> [kt, kh, kw, I, O]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def convert_edm(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """EDMPrecond torch state dict -> flax variables {'params': ...}.

    Torch names: ``model.enc.32x32_conv.weight`` ...; flax scopes:
    ``model/enc_32x32_conv/kernel`` (linen names dict-held submodules
    ``enc_<key>``). Custom layers: Linear(weight/bias) -> kernel/bias,
    Conv2d(weight/bias) -> kernel/bias, GroupNorm(weight/bias) -> scale/bias,
    FourierEmbedding freqs buffer -> param.
    """
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[0] != "model":
            logger.debug(f"skipping non-model key {key}")
            continue
        parts = parts[1:]
        # enc/dec dict entries: enc.<name>.<sub...> -> enc_<name>/<sub...>
        if parts[0] in ("enc", "dec") and len(parts) >= 2:
            scope = [f"{parts[0]}_{parts[1]}"] + parts[2:-1]
        else:
            scope = parts[:-1]
        leaf = parts[-1]

        if leaf == "weight":
            if value.ndim == 4:
                _set_nested(params, ("model", *scope, "kernel"), _to_conv2d(value))
            elif value.ndim == 2:
                _set_nested(params, ("model", *scope, "kernel"), _to_dense(value))
            elif value.ndim == 1:  # GroupNorm
                _set_nested(params, ("model", *scope, "scale"), value)
            else:
                raise ValueError(f"Unexpected weight rank for {key}: {value.shape}")
        elif leaf == "bias":
            _set_nested(params, ("model", *scope, "bias"), value)
        elif leaf == "freqs":  # FourierEmbedding buffer
            _set_nested(params, ("model", *scope, "freqs"), value)
        elif leaf == "resample_filter":
            continue  # fixed constant, not a parameter in the flax build
        else:
            logger.warning(f"Unmapped EDM key {key}")
    return {"params": params}


_DIT_RENAMES = [
    # Facebook-format aliases (ref ``DiT/network.py:346-404``)
    (re.compile(r"^t_embedder\.mlp\."), "t_embedder.proj_net."),
    (re.compile(r"\.attn\."), ".attention."),
    (re.compile(r"\.mlp\."), ".feed_forward."),
    (re.compile(r"^y_embedder\.embedding_table"), "y_embedder.class_embeddings"),
    (re.compile(r"^final_layer\.linear"), "final_layer.projection"),
    (re.compile(r"^final_layer\.adaLN_modulation"), "final_layer.adaptive_params"),
    (re.compile(r"\.adaLN_modulation\."), ".conditioning_net."),
]

# reference module path -> our flax scope path (templated)
_DIT_SCOPE_MAP = [
    (re.compile(r"^x_embedder\.proj\.(weight|bias)$"), ("x_embedder", "{conv}")),
    (re.compile(r"^t_embedder\.proj_net\.0\.(weight|bias)$"),
     ("t_embedder", "proj_0", "{dense}")),
    (re.compile(r"^t_embedder\.proj_net\.2\.(weight|bias)$"),
     ("t_embedder", "proj_2", "{dense}")),
    (re.compile(r"^r_embedder\.proj_net\.0\.(weight|bias)$"),
     ("r_embedder", "proj_0", "{dense}")),
    (re.compile(r"^r_embedder\.proj_net\.2\.(weight|bias)$"),
     ("r_embedder", "proj_2", "{dense}")),
    (re.compile(r"^y_embedder\.class_embeddings\.weight$"),
     ("y_embedder", "class_embeddings", "embedding")),
    (re.compile(r"^blocks\.(\d+)\.attention\.qkv\.(weight|bias)$"),
     ("blocks_{0}", "attention", "qkv", "{dense}")),
    (re.compile(r"^blocks\.(\d+)\.attention\.proj\.(weight|bias)$"),
     ("blocks_{0}", "attention", "proj", "{dense}")),
    (re.compile(r"^blocks\.(\d+)\.feed_forward\.fc1\.(weight|bias)$"),
     ("blocks_{0}", "feed_forward", "fc1", "{dense}")),
    (re.compile(r"^blocks\.(\d+)\.feed_forward\.fc2\.(weight|bias)$"),
     ("blocks_{0}", "feed_forward", "fc2", "{dense}")),
    (re.compile(r"^blocks\.(\d+)\.conditioning_net\.1\.(weight|bias)$"),
     ("blocks_{0}", "conditioning_net", "{dense}")),
    (re.compile(r"^final_layer\.adaptive_params\.1\.(weight|bias)$"),
     ("final_layer", "adaptive_params", "{dense}")),
    (re.compile(r"^final_layer\.projection\.(weight|bias)$"),
     ("final_layer", "projection", "{dense}")),
    (re.compile(r"^logvar_linear\.(weight|bias)$"), ("logvar_linear", "{dense}")),
]


def convert_dit(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """DiT torch state dict (ours or Facebook format) -> flax variables."""
    params: Dict[str, Any] = {}
    buffers: Dict[str, Any] = {}
    for key, value in state_dict.items():
        name = key
        for pat, repl in _DIT_RENAMES:
            name = pat.sub(repl, name)
        if name == "pos_embed":
            buffers["pos_embed"] = value
            continue
        matched = False
        for pat, scope_tmpl in _DIT_SCOPE_MAP:
            m = pat.match(name)
            if not m:
                continue
            matched = True
            groups = m.groups()
            idx = groups[0] if groups and groups[0].isdigit() else None
            leaf_kind = groups[-1] if groups else "weight"
            scope = []
            for part in scope_tmpl:
                if part == "{dense}":
                    if leaf_kind == "weight":
                        scope.append("kernel")
                        value = _to_dense(value)
                    else:
                        scope.append("bias")
                elif part == "{conv}":
                    if leaf_kind == "weight":
                        scope.append("kernel")
                        value = _to_conv2d(value)
                    else:
                        scope.append("bias")
                elif "{0}" in part:
                    scope.append(part.format(idx))
                else:
                    scope.append(part)
            _set_nested(params, tuple(scope), value)
            break
        if not matched:
            logger.warning(f"Unmapped DiT key {key}")
    out = {"params": params}
    if buffers:
        out["buffers"] = buffers
    return out


def convert_wan(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """diffusers ``WanTransformer3DModel`` state dict -> ``WanVideoDiT`` params.

    Covers the T2V trunk exactly (patch embedding, condition embedder,
    blocks, output head) plus the fastgen-added ``logvar_linear`` /
    ``r_embedder`` heads (ref ``Wan/network.py:607-620``). I2V extras: the
    image-embedder FF maps onto our ``img_embedder_0/2``; per-attention
    ``add_k_proj``/``add_v_proj`` image-KV projections have no counterpart
    (our I2V prepends CLIP tokens to the cross-attention context instead,
    ``network_i2v.py``) and are skipped with a warning.
    """
    sd = {}
    for k, v in state_dict.items():
        for pre in ("model.", "transformer.", "net."):
            if k.startswith(pre):
                k = k[len(pre):]
        sd[k] = v

    params: Dict[str, Any] = {}

    def put(path: str, v):
        _set_nested(params, tuple(path.split(".")), np.asarray(v))

    def dense(dst: str, src: str):
        put(dst + ".kernel", _to_dense(sd[src + ".weight"]))
        if src + ".bias" in sd:
            put(dst + ".bias", sd[src + ".bias"])

    # patch embedding: Conv3d [D, C, kt, kh, kw]
    put("patch_embedding.kernel", _to_conv3d(sd["patch_embedding.weight"]))
    put("patch_embedding.bias", sd["patch_embedding.bias"])

    # condition embedder (time MLP + 6*dim proj), text embedder
    dense("condition_embedder.time_embedder_0",
          "condition_embedder.time_embedder.linear_1")
    dense("condition_embedder.time_embedder_2",
          "condition_embedder.time_embedder.linear_2")
    dense("condition_embedder.time_proj", "condition_embedder.time_proj")
    dense("text_embedder_0", "condition_embedder.text_embedder.linear_1")
    dense("text_embedder_2", "condition_embedder.text_embedder.linear_2")
    if "condition_embedder.image_embedder.ff.net.0.proj.weight" in sd:
        dense("img_embedder_0", "condition_embedder.image_embedder.ff.net.0.proj")
        dense("img_embedder_2", "condition_embedder.image_embedder.ff.net.2")

    # fastgen-added heads (present in distilled checkpoints)
    if "logvar_linear.weight" in sd:
        dense("logvar_linear", "logvar_linear")
    for a, b in (("r_embedder.time_embedder_0", "r_embedder.time_embedder.linear_1"),
                 ("r_embedder.time_embedder_2", "r_embedder.time_embedder.linear_2"),
                 ("r_embedder.time_proj", "r_embedder.time_proj")):
        if b + ".weight" in sd:
            dense(a, b)

    n_blocks = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    for i in range(n_blocks):
        src = f"blocks.{i}."
        dst = f"blocks_{i}."
        for attn in ("attn1", "attn2"):
            dense(dst + f"{attn}.to_q", src + f"{attn}.to_q")
            dense(dst + f"{attn}.to_k", src + f"{attn}.to_k")
            dense(dst + f"{attn}.to_v", src + f"{attn}.to_v")
            out_key = (src + f"{attn}.to_out.0" if src + f"{attn}.to_out.0.weight" in sd
                       else src + f"{attn}.to_out")
            dense(dst + f"{attn}.to_out", out_key)
            for nm in ("norm_q", "norm_k"):
                if src + f"{attn}.{nm}.weight" in sd:
                    put(dst + f"{attn}.{nm}.scale", sd[src + f"{attn}.{nm}.weight"])
        if src + "norm2.weight" in sd:
            put(dst + "norm2.scale", sd[src + "norm2.weight"])
            put(dst + "norm2.bias", sd[src + "norm2.bias"])
        dense(dst + "ffn.fc1", src + "ffn.net.0.proj")
        dense(dst + "ffn.fc2", src + "ffn.net.2")
        table = np.asarray(sd[src + "scale_shift_table"])
        put(dst + "scale_shift_table", table.reshape(1, 6, -1))

    put("out_scale_shift_table", np.asarray(sd["scale_shift_table"]).reshape(1, 2, -1))
    dense("proj_out", "proj_out")

    handled_markers = ("patch_embedding", "condition_embedder", "blocks.",
                       "scale_shift_table", "proj_out", "logvar_linear",
                       "r_embedder")
    for k in sd:
        if not any(m in k for m in handled_markers):
            logger.warning(f"Unmapped Wan key {k}")
        elif "add_k_proj" in k or "add_v_proj" in k or "norm_added" in k:
            logger.warning(f"Skipped Wan image-KV key {k} (architecture-adapted)")
    return {"params": params}


def convert_edm2(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """NVIDIA EDM2 ``Precond`` state dict -> ``EDM2Precond`` params.

    The flax module reuses NVIDIA's own submodule naming
    (``{res}x{res}_conv`` / ``_down`` / ``_up`` / ``_block{i}`` / ``_in{i}``,
    ref ``networks/EDM2/network.py:294-455``), so conversion is mechanical:
    ``unet.enc.X`` -> ``unet.enc_X``, MPConv ``weight`` -> ``mp_weight`` with
    OIHW->HWIO (or [O,I]->[I,O]) layout; gains and Fourier freqs/phases copy
    through unchanged.
    """
    params: Dict[str, Any] = {}
    for key, v in state_dict.items():
        v = np.asarray(v)
        parts = key.split(".")
        # enc./dec. dict entries fold into flax's attr_key naming
        out_parts = []
        i = 0
        while i < len(parts):
            if parts[i] in ("enc", "dec") and i + 1 < len(parts):
                out_parts.append(f"{parts[i]}_{parts[i + 1]}")
                i += 2
            else:
                out_parts.append(parts[i])
                i += 1
        if out_parts[-1] == "weight":
            out_parts[-1] = "mp_weight"
            if v.ndim == 4:
                v = _to_conv2d(v)
            elif v.ndim == 2:
                v = _to_dense(v)
        _set_nested(params, tuple(out_parts), v)
    return {"params": params}


CONVERTERS = {"edm": convert_edm, "dit": convert_dit, "wan": convert_wan,
              "edm2": convert_edm2}


def convert_checkpoint(path: str, arch: str) -> Dict[str, Any]:
    """Load + convert a torch checkpoint for the given architecture family."""
    if arch not in CONVERTERS:
        raise KeyError(f"No converter for arch {arch!r}; available: {list(CONVERTERS)}")
    sd = load_torch_state_dict(path)
    variables = CONVERTERS[arch](sd)
    n = sum(v.size for v in _iter_leaves(variables))
    logger.info(f"Converted {path} ({arch}): {n/1e6:.2f}M params")
    return variables


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree


def verify_against_template(variables: Dict[str, Any], template: Dict[str, Any],
                            strict: bool = False) -> Tuple[int, int]:
    """Check converted tree against a flax-initialized template; returns
    (matched, missing). Shape mismatches always raise."""
    matched = missing = 0

    def walk(conv, tmpl, path=""):
        nonlocal matched, missing
        for k, tv in tmpl.items():
            p = f"{path}/{k}"
            if not isinstance(tv, dict):
                cv = conv.get(k) if isinstance(conv, dict) else None
                if cv is None:
                    missing += 1
                    if strict:
                        raise KeyError(f"Converted checkpoint missing {p}")
                    logger.warning(f"missing param {p}")
                elif tuple(cv.shape) != tuple(tv.shape):
                    raise ValueError(f"shape mismatch at {p}: "
                                     f"{cv.shape} vs {tv.shape}")
                else:
                    matched += 1
            else:
                walk(conv.get(k, {}) if isinstance(conv, dict) else {}, tv, p)

    walk(variables, template)
    return matched, missing
