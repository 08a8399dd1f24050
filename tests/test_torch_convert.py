"""Checkpoint converter tests: synthesize torch-layout state dicts from flax
params (the exact inverse mapping) and verify conversion restores them
bit-exactly with forward parity. Real torch checkpoints follow the same name
contract (``model.enc.32x32_conv.weight`` etc. / Facebook DiT names)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.configs.net import DiT_Test_Config, EDM_Test_Config
from fastgen_tpu.utils import instantiate
from fastgen_tpu.utils.torch_convert import (
    convert_dit,
    convert_edm,
    verify_against_template,
)

KEY = jax.random.PRNGKey(0)


def edm_to_torch_sd(tree, prefix=""):
    sd = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            tk = k[:3] + "." + k[4:] if k.startswith(("enc_", "dec_")) else k
            sd.update(edm_to_torch_sd(v, prefix + tk + "."))
        else:
            v = np.asarray(v)
            if k == "kernel":
                sd[prefix + "weight"] = (np.transpose(v, (3, 2, 0, 1))
                                         if v.ndim == 4 else v.T)
            elif k == "scale":
                sd[prefix + "weight"] = v
            else:
                sd[prefix + k] = v
    return sd


def test_edm_converter_roundtrip():
    net = instantiate(EDM_Test_Config)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.ones((1,))
    cond = jnp.zeros((1, 10))
    params = net.init({"params": KEY}, x, t, condition=cond)
    torch_sd = edm_to_torch_sd(params["params"])
    conv = convert_edm(torch_sd)
    matched, missing = verify_against_template(conv["params"], params["params"])
    assert missing == 0 and matched > 100
    xr = jax.random.normal(KEY, (2, 16, 16, 3))
    tr = jnp.array([1.0, 5.0])
    cr = jax.nn.one_hot(jnp.array([1, 2]), 10)
    out1 = net.apply(params, xr, tr, condition=cr)
    out2 = net.apply({"params": conv["params"]}, xr, tr, condition=cr)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def dit_to_torch_sd(params, buffers):
    """Inverse of convert_dit for our tiny DiT (Facebook-format names)."""
    p = params
    sd = {"pos_embed": np.asarray(buffers["pos_embed"])}

    def dense(torch_name, scope):
        sd[torch_name + ".weight"] = np.asarray(scope["kernel"]).T
        if "bias" in scope:
            sd[torch_name + ".bias"] = np.asarray(scope["bias"])

    sd["x_embedder.proj.weight"] = np.transpose(
        np.asarray(p["x_embedder"]["kernel"]), (3, 2, 0, 1))
    sd["x_embedder.proj.bias"] = np.asarray(p["x_embedder"]["bias"])
    dense("t_embedder.mlp.0", p["t_embedder"]["proj_0"])
    dense("t_embedder.mlp.2", p["t_embedder"]["proj_2"])
    sd["y_embedder.embedding_table.weight"] = np.asarray(
        p["y_embedder"]["class_embeddings"]["embedding"])
    i = 0
    while f"blocks_{i}" in p:
        blk = p[f"blocks_{i}"]
        dense(f"blocks.{i}.attn.qkv", blk["attention"]["qkv"])
        dense(f"blocks.{i}.attn.proj", blk["attention"]["proj"])
        dense(f"blocks.{i}.mlp.fc1", blk["feed_forward"]["fc1"])
        dense(f"blocks.{i}.mlp.fc2", blk["feed_forward"]["fc2"])
        dense(f"blocks.{i}.adaLN_modulation.1", blk["conditioning_net"])
        i += 1
    dense("final_layer.adaLN_modulation.1", p["final_layer"]["adaptive_params"])
    dense("final_layer.linear", p["final_layer"]["projection"])
    dense("logvar_linear", p["logvar_linear"])
    return sd


def test_dit_converter_roundtrip_facebook_names():
    net = instantiate(DiT_Test_Config)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([0.5])
    cond = jax.nn.one_hot(jnp.array([1]), 10)
    variables = net.init({"params": KEY}, x, t, condition=cond)
    torch_sd = dit_to_torch_sd(variables["params"], variables["buffers"])
    conv = convert_dit(torch_sd)
    matched, missing = verify_against_template(conv["params"], variables["params"])
    assert missing == 0 and matched > 20
    xr = jax.random.normal(KEY, (2, 8, 8, 4))
    tr = jnp.array([0.5, 0.9])
    cr = jax.nn.one_hot(jnp.array([1, 2]), 10)
    out1 = net.apply(variables, xr, tr, condition=cr)
    out2 = net.apply({"params": conv["params"], "buffers": conv["buffers"]},
                     xr, tr, condition=cr)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_shape_mismatch_raises():
    net = instantiate(EDM_Test_Config)
    params = net.init({"params": KEY}, jnp.zeros((1, 16, 16, 3)), jnp.ones((1,)),
                      condition=jnp.zeros((1, 10)))
    torch_sd = edm_to_torch_sd(params["params"])
    bad = dict(torch_sd)
    key = next(k for k in bad if k.endswith("weight"))
    bad[key] = bad[key][..., :1]
    conv = convert_edm(bad)
    with pytest.raises(ValueError, match="shape mismatch"):
        verify_against_template(conv["params"], params["params"])


def test_pretrained_path_wiring(tmp_path):
    """config.pretrained_model_path loads into teacher + net (+ fake_score)."""
    import torch

    from fastgen_tpu.configs.experiments.EDM.config_dmd2_test import (
        create_config)
    from fastgen_tpu.utils import instantiate as inst

    config = create_config()
    config.trainer.callbacks = {}
    model = inst(config.model_class, config=config.model)
    model.init_optimizers()
    base = model.init_state(KEY)

    # perturb so loaded != init
    sd = {k: torch.as_tensor(v + 1.0) for k, v in
          edm_to_torch_sd(base.params["teacher"]["params"]).items()}
    path = tmp_path / "teacher.pth"
    torch.save(sd, path)

    config.model.pretrained_model_path = str(path)
    model2 = inst(config.model_class, config=config.model)
    model2.init_optimizers()
    state = model2.init_state(KEY)
    # teacher == loaded (init + 1), and fake_score seeded from teacher
    a = np.asarray(jax.tree_util.tree_leaves(state.params["teacher"])[0])
    b = np.asarray(jax.tree_util.tree_leaves(base.params["teacher"])[0])
    np.testing.assert_allclose(a, b + 1.0, rtol=1e-6)
    c = np.asarray(jax.tree_util.tree_leaves(state.params["fake_score"])[0])
    np.testing.assert_allclose(c, a)


class TestWanConverter:
    """Roundtrip: flax Wan params -> synthetic diffusers-layout torch dict ->
    convert_wan -> exact equality with the original params."""

    def _flax_to_torch_layout(self, params):
        import numpy as np
        sd = {}

        def dense(dst, node):
            sd[dst + ".weight"] = np.asarray(node["kernel"]).T
            if "bias" in node:
                sd[dst + ".bias"] = np.asarray(node["bias"])

        p = params["params"]
        w = np.asarray(p["patch_embedding"]["kernel"])  # [kt,kh,kw,I,O]
        sd["patch_embedding.weight"] = np.transpose(w, (4, 3, 0, 1, 2))
        sd["patch_embedding.bias"] = np.asarray(p["patch_embedding"]["bias"])
        ce = p["condition_embedder"]
        dense("condition_embedder.time_embedder.linear_1", ce["time_embedder_0"])
        dense("condition_embedder.time_embedder.linear_2", ce["time_embedder_2"])
        dense("condition_embedder.time_proj", ce["time_proj"])
        dense("condition_embedder.text_embedder.linear_1", p["text_embedder_0"])
        dense("condition_embedder.text_embedder.linear_2", p["text_embedder_2"])
        i = 0
        while f"blocks_{i}" in p:
            b = p[f"blocks_{i}"]
            for attn in ("attn1", "attn2"):
                for nm in ("to_q", "to_k", "to_v"):
                    dense(f"blocks.{i}.{attn}.{nm}", b[attn][nm])
                dense(f"blocks.{i}.{attn}.to_out.0", b[attn]["to_out"])
                for nm in ("norm_q", "norm_k"):
                    if nm in b[attn]:
                        sd[f"blocks.{i}.{attn}.{nm}.weight"] = \
                            np.asarray(b[attn][nm]["scale"])
            if "scale" in b.get("norm2", {}):
                sd[f"blocks.{i}.norm2.weight"] = np.asarray(b["norm2"]["scale"])
                sd[f"blocks.{i}.norm2.bias"] = np.asarray(b["norm2"]["bias"])
            dense(f"blocks.{i}.ffn.net.0.proj", b["ffn"]["fc1"])
            dense(f"blocks.{i}.ffn.net.2", b["ffn"]["fc2"])
            sd[f"blocks.{i}.scale_shift_table"] = \
                np.asarray(b["scale_shift_table"]).reshape(1, 6, -1)
            i += 1
        sd["scale_shift_table"] = \
            np.asarray(p["out_scale_shift_table"]).reshape(1, 2, -1)
        dense("proj_out", p["proj_out"])
        return sd

    def test_roundtrip_exact(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from fastgen_tpu.networks.wan.network import WanVideoDiT
        from fastgen_tpu.utils.torch_convert import convert_wan, verify_against_template

        net = WanVideoDiT(dim=48, num_layers=2, num_heads=2, ffn_dim=64,
                          in_channels=4, out_channels=4, text_dim=16,
                          rope_max_seq_len=32)
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 4, 4, 4)),
                          jnp.ones((1,)))
        sd = self._flax_to_torch_layout(params)
        conv = convert_wan(sd)
        matched, missing = verify_against_template(conv, params, strict=True)
        assert missing == 0

        def assert_equal(a, b, path=""):
            if isinstance(a, dict):
                assert set(a) == set(b), f"{path}: {set(a)} vs {set(b)}"
                for k in a:
                    assert_equal(a[k], b[k], path + "/" + k)
            else:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                              err_msg=path)

        assert_equal(conv["params"], jax.tree_util.tree_map(np.asarray,
                                                            params["params"]))


class TestEDM2Converter:
    """Roundtrip: flax EDM2 params -> NVIDIA-layout torch dict -> convert."""

    def test_roundtrip_exact(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from fastgen_tpu.networks.edm2.network import EDM2Precond
        from fastgen_tpu.utils.torch_convert import convert_edm2, verify_against_template

        net = EDM2Precond(img_resolution=16, img_channels=3, label_dim=4,
                          model_kwargs=dict(model_channels=8, channel_mult=[1, 2],
                                            num_blocks=1, attn_resolutions=[8]))
        params = net.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 16, 16, 3)), jnp.ones((1,)),
                          condition=jnp.zeros((1, 4)))

        sd = {}
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            keys = [p.key for p in path if hasattr(p, "key")][1:]  # drop 'params'
            v = np.asarray(leaf)
            name = []
            for k in keys:
                if k.startswith(("enc_", "dec_")):
                    name += [k[:3], k[4:]]
                else:
                    name.append(k)
            if name[-1] == "mp_weight":
                name[-1] = "weight"
                v = (np.transpose(v, (3, 2, 0, 1)) if v.ndim == 4 else v.T)
            sd[".".join(name)] = v

        conv = convert_edm2(sd)
        matched, missing = verify_against_template(conv, params, strict=True)
        assert missing == 0

        def assert_equal(a, b, path=""):
            if isinstance(a, dict):
                assert set(a) == set(b), f"{path}: {set(a)} vs {set(b)}"
                for k in a:
                    assert_equal(a[k], b[k], path + "/" + k)
            else:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                              err_msg=path)

        assert_equal(conv["params"],
                     jax.tree_util.tree_map(np.asarray, params["params"]))


def _assert_tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {sorted(a)} vs {sorted(b)}"
        for k in a:
            _assert_tree_equal(a[k], b[k], path + "/" + k)
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)


def _dense_inv(sd, dst, node):
    sd[dst + ".weight"] = np.asarray(node["kernel"]).T
    if "bias" in node:
        sd[dst + ".bias"] = np.asarray(node["bias"])


def _norm_inv(sd, dst, node):
    sd[dst + ".weight"] = np.asarray(node["scale"])
    if "bias" in node:
        sd[dst + ".bias"] = np.asarray(node["bias"])


def _conv_inv(sd, dst, node):
    sd[dst + ".weight"] = np.transpose(np.asarray(node["kernel"]), (3, 2, 0, 1))
    if "bias" in node:
        sd[dst + ".bias"] = np.asarray(node["bias"])


class TestSDUNetConverter:
    """Roundtrip: flax SD UNet params -> synthetic diffusers-layout dict ->
    convert_sd_unet -> exact equality (tests both the SD15 conv-1x1 and the
    SDXL linear proj_in/proj_out paths)."""

    def _unet_to_torch(self, p, linear_proj=False):
        sd = {}

        def transformer(dst, node):
            _norm_inv(sd, dst + ".norm", node["norm"])
            for pj in ("proj_in", "proj_out"):
                w = np.asarray(node[pj]["kernel"])  # [1,1,I,O]
                if linear_proj:
                    sd[f"{dst}.{pj}.weight"] = w[0, 0].T
                else:
                    sd[f"{dst}.{pj}.weight"] = np.transpose(w, (3, 2, 0, 1))
                sd[f"{dst}.{pj}.bias"] = np.asarray(node[pj]["bias"])
            d = 0
            while f"block_{d}" in node:
                blk = node[f"block_{d}"]
                bdst = f"{dst}.transformer_blocks.{d}"
                for nz in ("norm1", "norm2", "norm3"):
                    _norm_inv(sd, f"{bdst}.{nz}", blk[nz])
                for attn in ("attn1", "attn2"):
                    for suffix, tname in (("q", "to_q"), ("k", "to_k"),
                                          ("v", "to_v")):
                        _dense_inv(sd, f"{bdst}.{attn}.{tname}",
                                   blk[f"{attn}_{suffix}"])
                    _dense_inv(sd, f"{bdst}.{attn}.to_out.0", blk[f"{attn}_out"])
                _dense_inv(sd, f"{bdst}.ff.net.0.proj", blk["ff_proj"])
                _dense_inv(sd, f"{bdst}.ff.net.2", blk["ff_out"])
                d += 1

        def resnet(dst, node):
            _norm_inv(sd, dst + ".norm1", node["norm1"])
            _conv_inv(sd, dst + ".conv1", node["conv1"])
            _dense_inv(sd, dst + ".time_emb_proj", node["time_emb_proj"])
            _norm_inv(sd, dst + ".norm2", node["norm2"])
            _conv_inv(sd, dst + ".conv2", node["conv2"])
            if "conv_shortcut" in node:
                _conv_inv(sd, dst + ".conv_shortcut", node["conv_shortcut"])

        _conv_inv(sd, "conv_in", p["conv_in"])
        _dense_inv(sd, "time_embedding.linear_1", p["time_embedding_1"])
        _dense_inv(sd, "time_embedding.linear_2", p["time_embedding_2"])
        if "add_embedding_1" in p:
            _dense_inv(sd, "add_embedding.linear_1", p["add_embedding_1"])
            _dense_inv(sd, "add_embedding.linear_2", p["add_embedding_2"])
        for name, node in p.items():
            import re
            m = re.match(r"down_(\d+)_res_(\d+)$", name)
            if m:
                resnet(f"down_blocks.{m.group(1)}.resnets.{m.group(2)}", node)
            m = re.match(r"down_(\d+)_attn_(\d+)$", name)
            if m:
                transformer(f"down_blocks.{m.group(1)}.attentions.{m.group(2)}",
                            node)
            m = re.match(r"down_(\d+)_downsample$", name)
            if m:
                _conv_inv(sd, f"down_blocks.{name.split('_')[1]}"
                          ".downsamplers.0.conv", node)
            m = re.match(r"up_(\d+)_res_(\d+)$", name)
            if m:
                resnet(f"up_blocks.{m.group(1)}.resnets.{m.group(2)}", node)
            m = re.match(r"up_(\d+)_attn_(\d+)$", name)
            if m:
                transformer(f"up_blocks.{m.group(1)}.attentions.{m.group(2)}",
                            node)
            m = re.match(r"up_(\d+)_upsample$", name)
            if m:
                _conv_inv(sd, f"up_blocks.{name.split('_')[1]}"
                          ".upsamplers.0.conv", node)
        resnet("mid_block.resnets.0", p["mid_res_0"])
        transformer("mid_block.attentions.0", p["mid_attn"])
        resnet("mid_block.resnets.1", p["mid_res_1"])
        _norm_inv(sd, "conv_norm_out", p["conv_norm_out"])
        _conv_inv(sd, "conv_out", p["conv_out"])
        return sd

    @pytest.mark.parametrize("linear_proj", [False, True])
    def test_roundtrip_exact(self, linear_proj):
        from fastgen_tpu.networks.sd.unet import UNet2DCondition
        from fastgen_tpu.utils.torch_convert import (convert_sd_unet,
                                                     verify_against_template)

        kwargs = dict(in_channels=4, out_channels=4,
                      block_out_channels=(16, 32),
                      cross_attn_blocks=(True, False),
                      transformer_depths=(1, 0), fixed_num_heads=2,
                      context_dim=16)
        if linear_proj:  # exercise the SDXL added-embedding path too
            kwargs["addition_embed_dim"] = 24
        unet = UNet2DCondition(**kwargs)
        x = jnp.zeros((1, 16, 16, 4))
        t = jnp.ones((1,))
        ctx = jnp.zeros((1, 7, 16))
        added = jnp.zeros((1, 24)) if linear_proj else None
        params = unet.init({"params": KEY}, x, t, ctx, added_cond=added)
        sd = self._unet_to_torch(params["params"], linear_proj=linear_proj)
        conv = convert_sd_unet(sd)
        matched, missing = verify_against_template(
            conv["params"]["unet"], params["params"], strict=True)
        assert missing == 0
        _assert_tree_equal(conv["params"]["unet"],
                           jax.tree_util.tree_map(np.asarray, params["params"]))


class TestFluxConverter:
    def _flux_to_torch(self, p):
        sd = {}
        _dense_inv(sd, "x_embedder", p["x_embedder"])
        _dense_inv(sd, "context_embedder", p["context_embedder"])
        _dense_inv(sd, "time_text_embed.timestep_embedder.linear_1",
                   p["time_embed"]["proj_0"])
        _dense_inv(sd, "time_text_embed.timestep_embedder.linear_2",
                   p["time_embed"]["proj_2"])
        if "guidance_embed" in p:
            _dense_inv(sd, "time_text_embed.guidance_embedder.linear_1",
                       p["guidance_embed"]["proj_0"])
            _dense_inv(sd, "time_text_embed.guidance_embedder.linear_2",
                       p["guidance_embed"]["proj_2"])
        _dense_inv(sd, "time_text_embed.text_embedder.linear_1",
                   p["pooled_embed_0"])
        _dense_inv(sd, "time_text_embed.text_embedder.linear_2",
                   p["pooled_embed_2"])
        i = 0
        while f"joint_{i}" in p:
            b = p[f"joint_{i}"]
            dst = f"transformer_blocks.{i}"
            _dense_inv(sd, dst + ".norm1.linear", b["img_mod"]["lin"])
            _dense_inv(sd, dst + ".norm1_context.linear", b["txt_mod"]["lin"])
            for stream, names in (("img_qkv", ("to_q", "to_k", "to_v")),
                                  ("txt_qkv", ("add_q_proj", "add_k_proj",
                                               "add_v_proj"))):
                w = np.asarray(b[stream]["kernel"])
                bias = np.asarray(b[stream]["bias"])
                dim = w.shape[1] // 3
                for j, nm in enumerate(names):
                    sd[f"{dst}.attn.{nm}.weight"] = w[:, j * dim:(j + 1) * dim].T
                    sd[f"{dst}.attn.{nm}.bias"] = bias[j * dim:(j + 1) * dim]
            sd[dst + ".attn.norm_q.weight"] = np.asarray(
                b["img_qkv_qnorm"]["scale"])
            sd[dst + ".attn.norm_k.weight"] = np.asarray(
                b["img_qkv_knorm"]["scale"])
            sd[dst + ".attn.norm_added_q.weight"] = np.asarray(
                b["txt_qkv_qnorm"]["scale"])
            sd[dst + ".attn.norm_added_k.weight"] = np.asarray(
                b["txt_qkv_knorm"]["scale"])
            _dense_inv(sd, dst + ".attn.to_out.0", b["img_proj"])
            _dense_inv(sd, dst + ".attn.to_add_out", b["txt_proj"])
            _dense_inv(sd, dst + ".ff.net.0.proj", b["img_mlp_in"])
            _dense_inv(sd, dst + ".ff.net.2", b["img_mlp_out"])
            _dense_inv(sd, dst + ".ff_context.net.0.proj", b["txt_mlp_in"])
            _dense_inv(sd, dst + ".ff_context.net.2", b["txt_mlp_out"])
            i += 1
        i = 0
        while f"single_{i}" in p:
            b = p[f"single_{i}"]
            dst = f"single_transformer_blocks.{i}"
            _dense_inv(sd, dst + ".norm.linear", b["mod"]["lin"])
            w = np.asarray(b["qkv_mlp"]["kernel"])
            bias = np.asarray(b["qkv_mlp"]["bias"])
            dim = w.shape[1] // 7
            bounds = [0, dim, 2 * dim, 3 * dim, 7 * dim]
            for j, nm in enumerate(("attn.to_q", "attn.to_k", "attn.to_v",
                                    "proj_mlp")):
                sd[f"{dst}.{nm}.weight"] = w[:, bounds[j]:bounds[j + 1]].T
                sd[f"{dst}.{nm}.bias"] = bias[bounds[j]:bounds[j + 1]]
            sd[dst + ".attn.norm_q.weight"] = np.asarray(b["qnorm"]["scale"])
            sd[dst + ".attn.norm_k.weight"] = np.asarray(b["knorm"]["scale"])
            _dense_inv(sd, dst + ".proj_out", b["proj_out"])
            i += 1
        # our (shift, scale) -> diffusers AdaLayerNormContinuous (scale, shift)
        w = np.asarray(p["norm_out_mod"]["lin"]["kernel"])
        b_ = np.asarray(p["norm_out_mod"]["lin"]["bias"])
        dim = w.shape[1] // 2
        sd["norm_out.linear.weight"] = np.concatenate(
            [w[:, dim:], w[:, :dim]], axis=1).T
        sd["norm_out.linear.bias"] = np.concatenate([b_[dim:], b_[:dim]])
        _dense_inv(sd, "proj_out", p["proj_out"])
        return sd

    def test_roundtrip_exact(self):
        from fastgen_tpu.networks.flux.network import Flux
        from fastgen_tpu.utils.torch_convert import (convert_flux,
                                                     verify_against_template)

        # head_dim must split into the (d/8, 7d/16, 7d/16) RoPE axes -> 32
        net = Flux(dim=96, num_layers=2, num_single_layers=2, num_heads=3,
                   in_channels=4, text_dim=32, pooled_dim=16)
        x = jnp.zeros((1, 8, 8, 4))
        t = jnp.array([0.5])
        cond = {"text_embeds": jnp.zeros((1, 6, 32)),
                "pooled_embeds": jnp.zeros((1, 16))}
        params = net.init({"params": KEY}, x, t, condition=cond)
        sd = self._flux_to_torch(params["params"])
        conv = convert_flux(sd)
        matched, missing = verify_against_template(conv, params, strict=True)
        assert missing == 0
        _assert_tree_equal(conv["params"],
                           jax.tree_util.tree_map(np.asarray, params["params"]))


class TestCogVideoXConverter:
    def _cogvideox_to_torch(self, p):
        sd = {}
        _conv_inv(sd, "patch_embed.proj", p["patch_embed"])
        _dense_inv(sd, "patch_embed.text_proj", p["text_proj"])
        _dense_inv(sd, "time_embedding.linear_1", p["time_embed"]["proj_0"])
        _dense_inv(sd, "time_embedding.linear_2", p["time_embed"]["proj_2"])
        i = 0
        while f"blocks_{i}" in p:
            b = p[f"blocks_{i}"]
            dst = f"transformer_blocks.{i}"
            for nz in ("norm1", "norm2"):
                _dense_inv(sd, f"{dst}.{nz}.linear", b[nz]["lin"])
                _norm_inv(sd, f"{dst}.{nz}.norm", b[nz]["norm"])
            w = np.asarray(b["qkv"]["kernel"])
            bias = np.asarray(b["qkv"]["bias"])
            dim = w.shape[1] // 3
            for j, nm in enumerate(("to_q", "to_k", "to_v")):
                sd[f"{dst}.attn1.{nm}.weight"] = w[:, j * dim:(j + 1) * dim].T
                sd[f"{dst}.attn1.{nm}.bias"] = bias[j * dim:(j + 1) * dim]
            _norm_inv(sd, dst + ".attn1.norm_q", b["norm_q"])
            _norm_inv(sd, dst + ".attn1.norm_k", b["norm_k"])
            _dense_inv(sd, dst + ".attn1.to_out.0", b["proj"])
            _dense_inv(sd, dst + ".ff.net.0.proj", b["ff_in"])
            _dense_inv(sd, dst + ".ff.net.2", b["ff_out"])
            i += 1
        _norm_inv(sd, "norm_final", p["norm_final"])
        _dense_inv(sd, "norm_out.linear", p["norm_out_mod"])
        _norm_inv(sd, "norm_out.norm", p["norm_out"])
        _dense_inv(sd, "proj_out", p["proj_out"])
        return sd

    def test_roundtrip_exact(self):
        from fastgen_tpu.networks.cogvideox.network import CogVideoX
        from fastgen_tpu.utils.torch_convert import (convert_cogvideox,
                                                     verify_against_template)

        net = CogVideoX(dim=96, num_layers=2, num_heads=6, in_channels=4,
                        text_dim=32, sample_frames=4, sample_height=8,
                        sample_width=8)
        x = jnp.zeros((1, 2, 8, 8, 4))
        t = jnp.array([0.5])
        cond = {"text_embeds": jnp.zeros((1, 6, 32))}
        params = net.init({"params": KEY}, x, t, condition=cond)
        sd = self._cogvideox_to_torch(params["params"])
        conv = convert_cogvideox(sd)
        matched, missing = verify_against_template(conv, params, strict=True)
        assert missing == 0
        _assert_tree_equal(conv["params"],
                           jax.tree_util.tree_map(np.asarray, params["params"]))


class TestCosmosConverter:
    def _cosmos_to_torch(self, p, prefix=""):
        sd = {}
        _dense_inv(sd, "x_embedder.proj.1", p["x_embedder"])
        _dense_inv(sd, "t_embedder.1.linear_1", p["t_embedder_1"])
        _dense_inv(sd, "t_embedder.1.linear_2", p["t_embedder_2"])
        sd["t_embedding_norm.weight"] = np.asarray(p["t_embedding_norm"]["scale"])
        i = 0
        while f"blocks_{i}" in p:
            b = p[f"blocks_{i}"]
            src = f"blocks.{i}"
            for attn in ("self_attn", "cross_attn"):
                for proj in ("q_proj", "k_proj", "v_proj", "output_proj"):
                    _dense_inv(sd, f"{src}.{attn}.{proj}", b[attn][proj])
                sd[f"{src}.{attn}.q_norm.weight"] = np.asarray(
                    b[attn]["q_norm"]["scale"])
                sd[f"{src}.{attn}.k_norm.weight"] = np.asarray(
                    b[attn]["k_norm"]["scale"])
            _dense_inv(sd, f"{src}.mlp.layer1", b["mlp_layer1"])
            _dense_inv(sd, f"{src}.mlp.layer2", b["mlp_layer2"])
            for mod in ("adaln_modulation_self_attn",
                        "adaln_modulation_cross_attn", "adaln_modulation_mlp"):
                _dense_inv(sd, f"{src}.{mod}.1", b[mod])
            i += 1
        _dense_inv(sd, "final_layer.adaln_modulation.1", p["final_adaln"])
        _dense_inv(sd, "final_layer.linear", p["final_linear"])
        if "logvar_linear" in p:
            _dense_inv(sd, "logvar_linear", p["logvar_linear"])
        # official-checkpoint prefix + TE noise keys must be stripped/skipped
        sd = {prefix + k: v for k, v in sd.items()}
        sd[prefix + "blocks.0.self_attn._extra_state"] = np.zeros(1)
        return sd

    @pytest.mark.parametrize("prefix", ["", "net."])
    def test_roundtrip_exact(self, prefix):
        from fastgen_tpu.networks.cosmos.network import CosmosPredict2
        from fastgen_tpu.utils.torch_convert import (convert_cosmos,
                                                     verify_against_template)

        net = CosmosPredict2(dim=96, num_layers=2, num_heads=4, ffn_dim=128,
                             in_channels=4, out_channels=4, text_dim=32,
                             rope_max_seq_len=64)
        x = jnp.zeros((1, 4, 8, 8, 4))
        t = jnp.array([0.5])
        cond = {"text_embeds": jnp.zeros((1, 6, 32))}
        params = net.init({"params": KEY}, x, t, condition=cond)
        sd = self._cosmos_to_torch(params["params"], prefix=prefix)
        conv = convert_cosmos(sd)
        matched, missing = verify_against_template(conv, params, strict=True)
        assert missing == 0
        _assert_tree_equal(conv["params"],
                           jax.tree_util.tree_map(np.asarray, params["params"]))


class TestLTX2Converter:
    def _attn_inv(self, sd, dst, node):
        for p in ("to_q", "to_k", "to_v"):
            _dense_inv(sd, f"{dst}.{p}", node[p])
        _dense_inv(sd, dst + ".to_out.0", node["to_out"])
        sd[dst + ".norm_q.weight"] = np.asarray(node["norm_q"]["scale"])
        sd[dst + ".norm_k.weight"] = np.asarray(node["norm_k"]["scale"])

    def _adaln_inv(self, sd, dst, node):
        _dense_inv(sd, dst + ".emb.timestep_embedder.linear_1", node["linear_1"])
        _dense_inv(sd, dst + ".emb.timestep_embedder.linear_2", node["linear_2"])
        _dense_inv(sd, dst + ".linear", node["linear"])

    def _ltx2_to_torch(self, p, audio=False):
        """Inverse map: our params -> diffusers LTX2VideoTransformer3DModel
        state-dict keys (``transformer_ltx2.py:791-1002`` module tree)."""
        sd = {}
        _dense_inv(sd, "proj_in", p["proj_in"])
        self._adaln_inv(sd, "time_embed", p["time_embed"])
        _dense_inv(sd, "caption_projection.linear_1", p["caption_projection_0"])
        _dense_inv(sd, "caption_projection.linear_2", p["caption_projection_1"])
        sd["scale_shift_table"] = np.asarray(p["out_scale_shift_table"])
        _dense_inv(sd, "proj_out", p["proj_out"])
        if "logvar_linear" in p:
            _dense_inv(sd, "logvar_linear", p["logvar_linear"])
        if audio:
            _dense_inv(sd, "audio_proj_in", p["audio_proj_in"])
            self._adaln_inv(sd, "audio_time_embed", p["audio_time_embed"])
            _dense_inv(sd, "audio_caption_projection.linear_1",
                       p["audio_caption_projection_0"])
            _dense_inv(sd, "audio_caption_projection.linear_2",
                       p["audio_caption_projection_1"])
            self._adaln_inv(sd, "av_cross_attn_video_scale_shift",
                            p["av_ca_video_ss"])
            self._adaln_inv(sd, "av_cross_attn_audio_scale_shift",
                            p["av_ca_audio_ss"])
            self._adaln_inv(sd, "av_cross_attn_video_a2v_gate",
                            p["av_ca_video_gate"])
            self._adaln_inv(sd, "av_cross_attn_audio_v2a_gate",
                            p["av_ca_audio_gate"])
            sd["audio_scale_shift_table"] = np.asarray(
                p["audio_out_scale_shift_table"])
            _dense_inv(sd, "audio_proj_out", p["audio_proj_out"])
        i = 0
        while f"block_{i}" in p:
            b = p[f"block_{i}"]
            dst = f"transformer_blocks.{i}"
            self._attn_inv(sd, dst + ".attn1", b["attn1"])
            self._attn_inv(sd, dst + ".attn2", b["attn2"])
            _dense_inv(sd, dst + ".ff.net.0.proj", b["ff_in"])
            _dense_inv(sd, dst + ".ff.net.2", b["ff_out"])
            sd[dst + ".scale_shift_table"] = np.asarray(b["scale_shift_table"])
            if audio:
                self._attn_inv(sd, dst + ".audio_attn1", b["audio_attn1"])
                self._attn_inv(sd, dst + ".audio_attn2", b["audio_attn2"])
                self._attn_inv(sd, dst + ".audio_to_video_attn",
                               b["audio_to_video_attn"])
                self._attn_inv(sd, dst + ".video_to_audio_attn",
                               b["video_to_audio_attn"])
                _dense_inv(sd, dst + ".audio_ff.net.0.proj", b["audio_ff_in"])
                _dense_inv(sd, dst + ".audio_ff.net.2", b["audio_ff_out"])
                sd[dst + ".audio_scale_shift_table"] = np.asarray(
                    b["audio_scale_shift_table"])
                sd[dst + ".video_a2v_cross_attn_scale_shift_table"] = np.asarray(
                    b["video_a2v_ca_table"])
                sd[dst + ".audio_a2v_cross_attn_scale_shift_table"] = np.asarray(
                    b["audio_a2v_ca_table"])
            i += 1
        return sd

    def test_roundtrip_video_only(self):
        from fastgen_tpu.networks.ltx2.network import LTX2VideoDiT
        from fastgen_tpu.utils.torch_convert import (convert_ltx2,
                                                     verify_against_template)

        net = LTX2VideoDiT(in_channels=4, out_channels=4, num_heads=2,
                           head_dim=12, num_layers=2, caption_channels=16)
        params = net.init({"params": KEY}, jnp.zeros((1, 3, 4, 4, 4)),
                          jnp.ones((1,)))
        sd = self._ltx2_to_torch(params["params"])
        conv = convert_ltx2(sd)
        matched, missing = verify_against_template(conv, params, strict=True)
        assert missing == 0
        _assert_tree_equal(conv["params"],
                           jax.tree_util.tree_map(np.asarray, params["params"]))

    def test_roundtrip_audio_video(self):
        from fastgen_tpu.networks.ltx2.network import LTX2VideoDiT
        from fastgen_tpu.utils.torch_convert import (convert_ltx2,
                                                     verify_against_template)

        net = LTX2VideoDiT(in_channels=4, out_channels=4, num_heads=2,
                           head_dim=12, num_layers=2, caption_channels=16,
                           audio_enabled=True, audio_in_channels=6,
                           audio_out_channels=6, audio_num_heads=2,
                           audio_head_dim=6)
        params = net.init({"params": KEY}, jnp.zeros((1, 3, 4, 4, 4)),
                          jnp.ones((1,)),
                          audio_latents=jnp.zeros((1, 5, 6)))
        sd = self._ltx2_to_torch(params["params"], audio=True)
        conv = convert_ltx2(sd, audio=True)
        matched, missing = verify_against_template(conv, params, strict=True)
        assert missing == 0
        _assert_tree_equal(conv["params"],
                           jax.tree_util.tree_map(np.asarray, params["params"]))

    def test_audio_keys_dropped_for_video_only(self):
        """Video-only conversion drops audio keys like the reference's
        strict=False load (``LTX2/network.py:434-445``)."""
        from fastgen_tpu.networks.ltx2.network import LTX2VideoDiT
        from fastgen_tpu.utils.torch_convert import convert_ltx2

        av = LTX2VideoDiT(in_channels=4, out_channels=4, num_heads=2,
                          head_dim=12, num_layers=1, caption_channels=16,
                          audio_enabled=True, audio_in_channels=6,
                          audio_out_channels=6, audio_num_heads=2,
                          audio_head_dim=6)
        params = av.init({"params": KEY}, jnp.zeros((1, 3, 4, 4, 4)),
                         jnp.ones((1,)), audio_latents=jnp.zeros((1, 5, 6)))
        sd = self._ltx2_to_torch(params["params"], audio=True)
        conv = convert_ltx2(sd)  # video-only target
        assert "audio_proj_in" not in conv["params"]
        assert "audio_attn1" not in conv["params"].get("block_0", {})
