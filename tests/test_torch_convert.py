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
