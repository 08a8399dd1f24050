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


def convert_sd_unet(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """diffusers ``UNet2DConditionModel`` state dict (SD 1.5 or SDXL) ->
    ``StableDiffusion15``/``StableDiffusionXL`` params (ref loads the
    diffusers UNet directly, ``SD15/network.py:438`` / ``SDXL/network.py:159``).

    Handles both SD15's conv 1x1 ``proj_in/proj_out`` and SDXL's linear ones
    (``use_linear_projection``): linear [O, I] reshapes to a 1x1 conv kernel.
    """
    sd = {}
    for k, v in state_dict.items():
        for pre in ("model.", "unet.", "net."):
            if k.startswith(pre):
                k = k[len(pre):]
        sd[k] = v

    params: Dict[str, Any] = {}

    def put(path: str, v):
        _set_nested(params, ("unet", *path.split(".")), np.asarray(v))

    def dense(dst: str, src: str):
        put(dst + ".kernel", _to_dense(sd[src + ".weight"]))
        if src + ".bias" in sd:
            put(dst + ".bias", sd[src + ".bias"])

    def conv(dst: str, src: str):
        put(dst + ".kernel", _to_conv2d(sd[src + ".weight"]))
        if src + ".bias" in sd:
            put(dst + ".bias", sd[src + ".bias"])

    def norm(dst: str, src: str):
        put(dst + ".scale", sd[src + ".weight"])
        put(dst + ".bias", sd[src + ".bias"])

    def proj_1x1(dst: str, src: str):
        w = sd[src + ".weight"]
        if w.ndim == 4:                      # SD15: Conv2d 1x1
            put(dst + ".kernel", _to_conv2d(w))
        else:                                # SDXL: Linear -> 1x1 conv kernel
            put(dst + ".kernel", _to_dense(w)[None, None])
        put(dst + ".bias", sd[src + ".bias"])

    def resnet(dst: str, src: str):
        norm(dst + ".norm1", src + ".norm1")
        conv(dst + ".conv1", src + ".conv1")
        dense(dst + ".time_emb_proj", src + ".time_emb_proj")
        norm(dst + ".norm2", src + ".norm2")
        conv(dst + ".conv2", src + ".conv2")
        if src + ".conv_shortcut.weight" in sd:
            conv(dst + ".conv_shortcut", src + ".conv_shortcut")

    def transformer(dst: str, src: str):
        norm(dst + ".norm", src + ".norm")
        proj_1x1(dst + ".proj_in", src + ".proj_in")
        proj_1x1(dst + ".proj_out", src + ".proj_out")
        d = 0
        while f"{src}.transformer_blocks.{d}.norm1.weight" in sd:
            bsrc = f"{src}.transformer_blocks.{d}"
            bdst = f"{dst}.block_{d}"
            norm(bdst + ".norm1", bsrc + ".norm1")
            norm(bdst + ".norm2", bsrc + ".norm2")
            norm(bdst + ".norm3", bsrc + ".norm3")
            for attn in ("attn1", "attn2"):
                dense(f"{bdst}.{attn}_q", f"{bsrc}.{attn}.to_q")
                dense(f"{bdst}.{attn}_k", f"{bsrc}.{attn}.to_k")
                dense(f"{bdst}.{attn}_v", f"{bsrc}.{attn}.to_v")
                dense(f"{bdst}.{attn}_out", f"{bsrc}.{attn}.to_out.0")
            dense(bdst + ".ff_proj", bsrc + ".ff.net.0.proj")
            dense(bdst + ".ff_out", bsrc + ".ff.net.2")
            d += 1

    conv("conv_in", "conv_in")
    dense("time_embedding_1", "time_embedding.linear_1")
    dense("time_embedding_2", "time_embedding.linear_2")
    if "add_embedding.linear_1.weight" in sd:  # SDXL
        dense("add_embedding_1", "add_embedding.linear_1")
        dense("add_embedding_2", "add_embedding.linear_2")

    n_down = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("down_blocks."))
    for b in range(n_down):
        li = 0
        while f"down_blocks.{b}.resnets.{li}.norm1.weight" in sd:
            resnet(f"down_{b}_res_{li}", f"down_blocks.{b}.resnets.{li}")
            if f"down_blocks.{b}.attentions.{li}.norm.weight" in sd:
                transformer(f"down_{b}_attn_{li}", f"down_blocks.{b}.attentions.{li}")
            li += 1
        if f"down_blocks.{b}.downsamplers.0.conv.weight" in sd:
            conv(f"down_{b}_downsample", f"down_blocks.{b}.downsamplers.0.conv")

    resnet("mid_res_0", "mid_block.resnets.0")
    transformer("mid_attn", "mid_block.attentions.0")
    resnet("mid_res_1", "mid_block.resnets.1")

    n_up = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("up_blocks."))
    for b in range(n_up):
        li = 0
        while f"up_blocks.{b}.resnets.{li}.norm1.weight" in sd:
            resnet(f"up_{b}_res_{li}", f"up_blocks.{b}.resnets.{li}")
            if f"up_blocks.{b}.attentions.{li}.norm.weight" in sd:
                transformer(f"up_{b}_attn_{li}", f"up_blocks.{b}.attentions.{li}")
            li += 1
        if f"up_blocks.{b}.upsamplers.0.conv.weight" in sd:
            conv(f"up_{b}_upsample", f"up_blocks.{b}.upsamplers.0.conv")

    norm("conv_norm_out", "conv_norm_out")
    conv("conv_out", "conv_out")
    return {"params": params}


def convert_flux(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """diffusers ``FluxTransformer2DModel`` state dict -> ``Flux`` params
    (ref wraps the diffusers model, ``Flux/network.py:327``).

    Fused layouts: the joint blocks' separate ``to_q/to_k/to_v`` (and the
    text stream's ``add_{q,k,v}_proj``) concatenate into our fused
    ``img_qkv``/``txt_qkv``; single blocks concat q/k/v/``proj_mlp`` into
    ``qkv_mlp``. ``norm_out.linear`` chunks (scale, shift) in diffusers'
    AdaLayerNormContinuous — swapped into our (shift, scale) order.
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

    def fused_dense(dst: str, srcs):
        put(dst + ".kernel",
            np.concatenate([_to_dense(sd[s + ".weight"]) for s in srcs], axis=1))
        if srcs[0] + ".bias" in sd:
            put(dst + ".bias",
                np.concatenate([sd[s + ".bias"] for s in srcs], axis=0))

    dense("x_embedder", "x_embedder")
    dense("context_embedder", "context_embedder")
    dense("time_embed.proj_0", "time_text_embed.timestep_embedder.linear_1")
    dense("time_embed.proj_2", "time_text_embed.timestep_embedder.linear_2")
    if "time_text_embed.guidance_embedder.linear_1.weight" in sd:
        dense("guidance_embed.proj_0", "time_text_embed.guidance_embedder.linear_1")
        dense("guidance_embed.proj_2", "time_text_embed.guidance_embedder.linear_2")
    dense("pooled_embed_0", "time_text_embed.text_embedder.linear_1")
    dense("pooled_embed_2", "time_text_embed.text_embedder.linear_2")

    n_joint = 1 + max((int(k.split(".")[1]) for k in sd
                       if k.startswith("transformer_blocks.")), default=-1)
    for i in range(n_joint):
        src = f"transformer_blocks.{i}"
        dst = f"joint_{i}"
        dense(dst + ".img_mod.lin", src + ".norm1.linear")
        dense(dst + ".txt_mod.lin", src + ".norm1_context.linear")
        fused_dense(dst + ".img_qkv",
                    [src + ".attn.to_q", src + ".attn.to_k", src + ".attn.to_v"])
        fused_dense(dst + ".txt_qkv",
                    [src + ".attn.add_q_proj", src + ".attn.add_k_proj",
                     src + ".attn.add_v_proj"])
        put(dst + ".img_qkv_qnorm.scale", sd[src + ".attn.norm_q.weight"])
        put(dst + ".img_qkv_knorm.scale", sd[src + ".attn.norm_k.weight"])
        put(dst + ".txt_qkv_qnorm.scale", sd[src + ".attn.norm_added_q.weight"])
        put(dst + ".txt_qkv_knorm.scale", sd[src + ".attn.norm_added_k.weight"])
        dense(dst + ".img_proj", src + ".attn.to_out.0")
        dense(dst + ".txt_proj", src + ".attn.to_add_out")
        dense(dst + ".img_mlp_in", src + ".ff.net.0.proj")
        dense(dst + ".img_mlp_out", src + ".ff.net.2")
        dense(dst + ".txt_mlp_in", src + ".ff_context.net.0.proj")
        dense(dst + ".txt_mlp_out", src + ".ff_context.net.2")

    n_single = 1 + max((int(k.split(".")[1]) for k in sd
                        if k.startswith("single_transformer_blocks.")), default=-1)
    for i in range(n_single):
        src = f"single_transformer_blocks.{i}"
        dst = f"single_{i}"
        dense(dst + ".mod.lin", src + ".norm.linear")
        fused_dense(dst + ".qkv_mlp",
                    [src + ".attn.to_q", src + ".attn.to_k", src + ".attn.to_v",
                     src + ".proj_mlp"])
        put(dst + ".qnorm.scale", sd[src + ".attn.norm_q.weight"])
        put(dst + ".knorm.scale", sd[src + ".attn.norm_k.weight"])
        dense(dst + ".proj_out", src + ".proj_out")

    # AdaLayerNormContinuous chunks (scale, shift); our module splits
    # (shift, scale) -> swap the two output halves
    w = _to_dense(sd["norm_out.linear.weight"])
    dim = w.shape[1] // 2
    put("norm_out_mod.lin.kernel",
        np.concatenate([w[:, dim:], w[:, :dim]], axis=1))
    b = sd["norm_out.linear.bias"]
    put("norm_out_mod.lin.bias", np.concatenate([b[dim:], b[:dim]], axis=0))
    dense("proj_out", "proj_out")
    if "logvar_linear.weight" in sd:
        dense("logvar_linear", "logvar_linear")
    return {"params": params}


def convert_cogvideox(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """diffusers ``CogVideoXTransformer3DModel`` state dict -> ``CogVideoX``
    params (ref wraps the diffusers model, ``CogVideoX/network.py:402``).

    ``to_q/to_k/to_v`` fuse into ``qkv``; the block's shared
    CogVideoXLayerNormZero affine + modulation map onto ``norm1``/``norm2``
    submodules; the 2B sincos positional buffer is non-persistent in
    diffusers (recomputed in our module), so it is absent from state dicts.
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

    def norm(dst: str, src: str):
        put(dst + ".scale", sd[src + ".weight"])
        put(dst + ".bias", sd[src + ".bias"])

    put("patch_embed.kernel", _to_conv2d(sd["patch_embed.proj.weight"]))
    put("patch_embed.bias", sd["patch_embed.proj.bias"])
    dense("text_proj", "patch_embed.text_proj")
    dense("time_embed.proj_0", "time_embedding.linear_1")
    dense("time_embed.proj_2", "time_embedding.linear_2")

    n_blocks = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("transformer_blocks."))
    for i in range(n_blocks):
        src = f"transformer_blocks.{i}"
        dst = f"blocks_{i}"
        for nz in ("norm1", "norm2"):
            dense(f"{dst}.{nz}.lin", f"{src}.{nz}.linear")
            norm(f"{dst}.{nz}.norm", f"{src}.{nz}.norm")
        put(dst + ".qkv.kernel",
            np.concatenate([_to_dense(sd[f"{src}.attn1.{p}.weight"])
                            for p in ("to_q", "to_k", "to_v")], axis=1))
        put(dst + ".qkv.bias",
            np.concatenate([sd[f"{src}.attn1.{p}.bias"]
                            for p in ("to_q", "to_k", "to_v")], axis=0))
        norm(dst + ".norm_q", src + ".attn1.norm_q")
        norm(dst + ".norm_k", src + ".attn1.norm_k")
        dense(dst + ".proj", src + ".attn1.to_out.0")
        dense(dst + ".ff_in", src + ".ff.net.0.proj")
        dense(dst + ".ff_out", src + ".ff.net.2")

    norm("norm_final", "norm_final")
    dense("norm_out_mod", "norm_out.linear")
    norm("norm_out", "norm_out.norm")
    dense("proj_out", "proj_out")
    if "logvar_linear.weight" in sd:
        dense("logvar_linear", "logvar_linear")
    return {"params": params}


def convert_cosmos(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Cosmos Predict2 ``CosmosPredict2DiT`` state dict -> ``CosmosPredict2``
    params (ref ``cosmos_predict2/network.py:57`` + the official-key remap at
    ``:856-926``: ``net.`` / ``transformer.`` prefixes and
    ``._checkpoint_wrapped_module`` wrappers are stripped; Transformer-Engine
    ``_extra_state`` and ``accum_*`` keys skipped)."""
    sd = {}
    for k, v in state_dict.items():
        if "_extra_state" in k or ".accum_" in k or k.startswith("accum_"):
            continue
        k = k.replace("._checkpoint_wrapped_module", "")
        for pre in ("model.", "net.", "transformer."):
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

    dense("x_embedder", "x_embedder.proj.1")
    dense("t_embedder_1", "t_embedder.1.linear_1")
    dense("t_embedder_2", "t_embedder.1.linear_2")
    put("t_embedding_norm.scale", sd["t_embedding_norm.weight"])

    n_blocks = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    for i in range(n_blocks):
        src = f"blocks.{i}"
        dst = f"blocks_{i}"
        for attn in ("self_attn", "cross_attn"):
            for proj in ("q_proj", "k_proj", "v_proj", "output_proj"):
                dense(f"{dst}.{attn}.{proj}", f"{src}.{attn}.{proj}")
            put(f"{dst}.{attn}.q_norm.scale", sd[f"{src}.{attn}.q_norm.weight"])
            put(f"{dst}.{attn}.k_norm.scale", sd[f"{src}.{attn}.k_norm.weight"])
        dense(dst + ".mlp_layer1", src + ".mlp.layer1")
        dense(dst + ".mlp_layer2", src + ".mlp.layer2")
        for mod in ("adaln_modulation_self_attn", "adaln_modulation_cross_attn",
                    "adaln_modulation_mlp"):
            if f"{src}.{mod}.2.weight" in sd:    # AdaLN-LoRA variant
                dense(f"{dst}.{mod}_lora_in", f"{src}.{mod}.1")
                dense(f"{dst}.{mod}", f"{src}.{mod}.2")
            else:
                dense(f"{dst}.{mod}", f"{src}.{mod}.1")

    if "final_layer.adaln_modulation.2.weight" in sd:
        dense("final_adaln_lora_in", "final_layer.adaln_modulation.1")
        dense("final_adaln", "final_layer.adaln_modulation.2")
    else:
        dense("final_adaln", "final_layer.adaln_modulation.1")
    dense("final_linear", "final_layer.linear")
    if "crossattn_proj.0.weight" in sd:
        dense("crossattn_proj", "crossattn_proj.0")
    if "logvar_linear.weight" in sd:
        dense("logvar_linear", "logvar_linear")

    handled = ("x_embedder", "t_embedder", "t_embedding_norm", "blocks.",
               "final_layer", "crossattn_proj", "logvar_linear", "pos_embedder")
    for k in sd:
        if not any(m in k for m in handled):
            logger.warning(f"Unmapped Cosmos key {k}")
    return {"params": params}


def convert_ltx2(state_dict: Dict[str, np.ndarray],
                 audio: bool = False) -> Dict[str, Any]:
    """diffusers ``LTX2VideoTransformer3DModel`` state dict ->
    ``LTX2VideoDiT`` params (ref vendors the same module,
    ``LTX2/transformer_ltx2.py:791``; its FastGen wrapper drops the audio
    keys via ``strict=False``, ``LTX2/network.py:434-445`` — pass
    ``audio=True`` to map them onto an ``audio_enabled`` net instead).

    Block norms (norm1..3, audio_*, *_to_*_norm) and the output LayerNorms
    are affine-free in LTX2 and absent from state dicts.
    """
    sd = {}
    for k, v in state_dict.items():
        for pre in ("model.", "transformer.", "net."):
            if k.startswith(pre):
                k = k[len(pre):]
        sd[k] = v

    params: Dict[str, Any] = {}
    used = set()

    def put(path: str, v):
        _set_nested(params, tuple(path.split(".")), np.asarray(v))

    def dense(dst: str, src: str):
        used.add(src + ".weight")
        put(dst + ".kernel", _to_dense(sd[src + ".weight"]))
        if src + ".bias" in sd:
            used.add(src + ".bias")
            put(dst + ".bias", sd[src + ".bias"])

    def rms(dst: str, src: str):
        used.add(src + ".weight")
        put(dst + ".scale", sd[src + ".weight"])

    def table(dst: str, src: str):
        used.add(src)
        put(dst, sd[src])

    def attn(dst: str, src: str):
        for p in ("to_q", "to_k", "to_v"):
            dense(f"{dst}.{p}", f"{src}.{p}")
        dense(dst + ".to_out", src + ".to_out.0")
        rms(dst + ".norm_q", src + ".norm_q")
        rms(dst + ".norm_k", src + ".norm_k")

    def adaln(dst: str, src: str):
        dense(dst + ".linear_1", src + ".emb.timestep_embedder.linear_1")
        dense(dst + ".linear_2", src + ".emb.timestep_embedder.linear_2")
        dense(dst + ".linear", src + ".linear")

    dense("proj_in", "proj_in")
    adaln("time_embed", "time_embed")
    dense("caption_projection_0", "caption_projection.linear_1")
    dense("caption_projection_1", "caption_projection.linear_2")
    table("out_scale_shift_table", "scale_shift_table")
    dense("proj_out", "proj_out")
    if "logvar_linear.weight" in sd:
        dense("logvar_linear", "logvar_linear")

    if audio:
        dense("audio_proj_in", "audio_proj_in")
        adaln("audio_time_embed", "audio_time_embed")
        dense("audio_caption_projection_0", "audio_caption_projection.linear_1")
        dense("audio_caption_projection_1", "audio_caption_projection.linear_2")
        adaln("av_ca_video_ss", "av_cross_attn_video_scale_shift")
        adaln("av_ca_audio_ss", "av_cross_attn_audio_scale_shift")
        adaln("av_ca_video_gate", "av_cross_attn_video_a2v_gate")
        adaln("av_ca_audio_gate", "av_cross_attn_audio_v2a_gate")
        table("audio_out_scale_shift_table", "audio_scale_shift_table")
        dense("audio_proj_out", "audio_proj_out")

    n_blocks = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("transformer_blocks."))
    for i in range(n_blocks):
        src = f"transformer_blocks.{i}"
        dst = f"block_{i}"
        attn(dst + ".attn1", src + ".attn1")
        attn(dst + ".attn2", src + ".attn2")
        dense(dst + ".ff_in", src + ".ff.net.0.proj")
        dense(dst + ".ff_out", src + ".ff.net.2")
        table(dst + ".scale_shift_table", src + ".scale_shift_table")
        if audio:
            attn(dst + ".audio_attn1", src + ".audio_attn1")
            attn(dst + ".audio_attn2", src + ".audio_attn2")
            attn(dst + ".audio_to_video_attn", src + ".audio_to_video_attn")
            attn(dst + ".video_to_audio_attn", src + ".video_to_audio_attn")
            dense(dst + ".audio_ff_in", src + ".audio_ff.net.0.proj")
            dense(dst + ".audio_ff_out", src + ".audio_ff.net.2")
            table(dst + ".audio_scale_shift_table",
                  src + ".audio_scale_shift_table")
            table(dst + ".video_a2v_ca_table",
                  src + ".video_a2v_cross_attn_scale_shift_table")
            table(dst + ".audio_a2v_ca_table",
                  src + ".audio_a2v_cross_attn_scale_shift_table")

    dropped = [k for k in sd if k not in used]
    if dropped:
        logger.info(f"convert_ltx2: dropped {len(dropped)} keys "
                    f"({'audio' if not audio else 'unmapped'}: "
                    f"{dropped[:4]}{'...' if len(dropped) > 4 else ''})")
    return {"params": params}


def convert_wan_vae(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """diffusers ``AutoencoderKLWan`` state dict -> flax
    ``encoders.wan_vae.AutoencoderKLWan`` variables (ref wraps this VAE as
    ``WanVideoEncoder``, ``fastgen/networks/Wan/network.py:484-541``).

    Key mapping (torch -> flax tree):
      ``encoder.down_blocks.N.``            -> ``encoder/down_blocks_N/``
      ``decoder.up_blocks.N.resnets.J.``    -> ``decoder/up_blocks_N/resnets_J/``
      ``...up_blocks.N.upsamplers.0.``      -> ``.../upsamplers_0/``
      ``mid_block.resnets.K. / attentions.0.`` -> ``mid_block/resnets_K/ ...``
      ``.resample.1.`` (Sequential conv)    -> ``resample_1/`` (as 1x3x3 conv3d)
      conv ``weight [O,I,(kt,)kh,kw]``      -> ``kernel [kt,kh,kw,I,O]``
      WanRMS_norm ``gamma [C,1,1(,1)]``     -> ``gamma [C]``
      attention ``to_qkv/proj`` 1x1 Conv2d  -> Dense ``kernel [I,O]``
    """
    params: Dict[str, Any] = {}
    used = set()

    def arr(name):
        used.add(name)
        return state_dict[name]

    def put(path: str, value):
        _set_nested(params, tuple(path.split("/")), value)

    for key in list(state_dict):
        if not key.endswith((".weight", ".bias", ".gamma")):
            continue
        path = (key
                .replace("encoder.down_blocks.", "encoder.down_blocks_")
                .replace("decoder.up_blocks.", "decoder.up_blocks_")
                .replace(".resnets.", ".resnets_")
                .replace(".attentions.0.", ".attentions_0.")
                .replace(".upsamplers.0.", ".upsamplers_0.")
                .replace(".resample.1.", ".resample_1.")
                .replace("mid_block.resnets_", "mid_block.resnets_"))
        parts = path.split(".")
        leaf = parts[-1]
        scope = "/".join(parts[:-1])
        w = arr(key)
        if leaf == "gamma":                      # (C,1,1[,1]) -> (C,)
            put(f"{scope}/gamma", w.reshape(w.shape[0]))
        elif leaf == "bias":
            put(f"{scope}/bias", w)
        elif w.ndim == 5:                        # causal conv3d
            put(f"{scope}/kernel", _to_conv3d(w))
        elif w.ndim == 4:
            if w.shape[2] == w.shape[3] == 1:    # 1x1 conv2d == Dense (attn)
                put(f"{scope}/kernel", _to_dense(w[:, :, 0, 0]))
            else:                                # resample conv2d -> 1xKhxKw
                put(f"{scope}/kernel", _to_conv2d(w)[None])
        elif w.ndim == 2:
            put(f"{scope}/kernel", _to_dense(w))
        else:
            raise ValueError(f"convert_wan_vae: unexpected {key} {w.shape}")

    dropped = [k for k in state_dict if k not in used]
    if dropped:
        logger.warning(f"convert_wan_vae: dropped {len(dropped)} keys "
                       f"({dropped[:4]}{'...' if len(dropped) > 4 else ''})")
    return {"params": params}


def convert_cogvideox_vae(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """diffusers ``AutoencoderKLCogVideoX`` state dict -> flax
    ``encoders.cogvideox_vae.AutoencoderKLCogVideoX`` variables (ref wraps
    this VAE as ``CogVideoXVideoEncoder``,
    ``fastgen/networks/CogVideoX/network.py:302-347``).

    Key mapping (torch -> flax tree):
      ``encoder.down_blocks.N.``           -> ``encoder/down_blocks_N/``
      ``decoder.up_blocks.N.resnets.J.``   -> ``decoder/up_blocks_N/resnets_J/``
      ``...samplers.0.conv.``              -> ``...samplers_0/conv/`` (2D conv
                                              as a (1,kh,kw) 3D kernel)
      causal-conv inner ``X.conv.weight``  -> ``X/kernel`` [kt,kh,kw,I,O]
      GroupNorm ``weight``                 -> ``scale``
      spatial-norm ``norm_layer/conv_y/conv_b`` keep their names
      ``conv_shortcut.weight [O,I,1,1,1]`` -> Dense ``kernel [I,O]``
    """
    import re

    params: Dict[str, Any] = {}
    used = set()

    def put(path: str, value):
        _set_nested(params, tuple(path.split("/")), value)

    # causal convs wrap their torch kernel in an inner ``.conv`` module;
    # the flax modules hold the kernel directly
    causal_inner = re.compile(
        r"\.(conv_in|conv_out|conv1|conv2|conv_y|conv_b)\.conv\.")

    for key in list(state_dict):
        if not key.endswith((".weight", ".bias")):
            continue
        path = causal_inner.sub(r".\1.", key)
        path = (path
                .replace("encoder.down_blocks.", "encoder.down_blocks_")
                .replace("decoder.up_blocks.", "decoder.up_blocks_")
                .replace(".resnets.", ".resnets_")
                .replace(".downsamplers.0.", ".downsamplers_0.")
                .replace(".upsamplers.0.", ".upsamplers_0."))
        parts = path.split(".")
        leaf = parts[-1]
        scope = "/".join(parts[:-1])
        w = state_dict[key]
        used.add(key)
        if leaf == "bias":
            put(f"{scope}/bias", w)
        elif w.ndim == 5:
            if w.shape[2] == w.shape[3] == w.shape[4] == 1 and \
                    parts[-2] == "conv_shortcut":
                # SafeConv3d pointwise shortcut == Dense
                put(f"{scope}/kernel", _to_dense(w[:, :, 0, 0, 0]))
            else:
                put(f"{scope}/kernel", _to_conv3d(w))
        elif w.ndim == 4:                        # sampler Conv2d
            put(f"{scope}/kernel", _to_conv2d(w)[None])
        elif w.ndim == 1:                        # GroupNorm weight -> scale
            put(f"{scope}/scale", w)
        else:
            raise ValueError(f"convert_cogvideox_vae: unexpected {key} "
                             f"{w.shape}")

    dropped = [k for k in state_dict if k not in used]
    if dropped:
        logger.warning(f"convert_cogvideox_vae: dropped {len(dropped)} keys "
                       f"({dropped[:4]}{'...' if len(dropped) > 4 else ''})")
    return {"params": params}


CONVERTERS = {"edm": convert_edm, "dit": convert_dit, "wan": convert_wan,
              "wan_vae": convert_wan_vae,
              "cogvideox_vae": convert_cogvideox_vae,
              "edm2": convert_edm2, "sd15": convert_sd_unet,
              "sdxl": convert_sd_unet, "flux": convert_flux,
              "cogvideox": convert_cogvideox, "cosmos": convert_cosmos,
              "ltx2": convert_ltx2}


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
