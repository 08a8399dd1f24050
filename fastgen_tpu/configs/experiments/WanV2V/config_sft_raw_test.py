"""Raw-pixel VACEWan V2V SFT smoke config: tiny VACE Wan + video VAE + the
Depth-Anything annotator (random tiny weights), exercising the on-the-fly
depth control path of ``preprocess_data`` (ref ``trainer.py:443-452`` +
``vace_depth_annotator.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import VACEWan_Test_Config, build_depth_annotator
from fastgen_tpu.data.class_cond_dataloader import SyntheticRawVideoLoader
from fastgen_tpu.networks.encoders.wrappers import T5TextEncoder, VideoVAEWrapper


def _tiny_annotator(**kwargs):
    import fastgen_tpu.networks.annotators.depth_anything_v2 as dav2

    dav2._VIT_PRESETS.setdefault("tiny", dict(
        embed_dim=16, depth=2, num_heads=2, intermediate_layer_idx=(0, 0, 1, 1),
        out_channels=(8, 8, 8, 8), features=8))
    return build_depth_annotator(variant="tiny", **kwargs)


def create_config():
    config = create_sft_config()
    config.log_config.group = "wanv2v_test"
    config.log_config.name = "sft_raw_test"
    config.model.net = copy.deepcopy(VACEWan_Test_Config)
    config.model.vae = L(VideoVAEWrapper)(
        base_ch=8, ch_mult=[1, 2], latent_channels=4,
        temporal_downsample=[True], dtype="float32", example_shape=[5, 16, 16])
    config.model.text_encoder = L(T5TextEncoder)(
        allow_hash_tokenizer=True,
        vocab_size=256, d_model=32, d_kv=8, num_heads=4, d_ff=48, num_layers=1,
        rel_buckets=8, rel_max_distance=20, max_length=6, dtype="float32")
    config.model.depth_annotator = L(_tiny_annotator)(input_size=28)
    config.model.input_shape = [3, 8, 8, 4]
    config.model.use_ema = False
    config.dataloader_train = L(SyntheticRawVideoLoader)(
        batch_size=2, frames=5, resolution=16)
    config.trainer.max_iter = 4
    config.trainer.validation_iter = 100
    config.trainer.save_ckpt_iter = 2
    config.trainer.logging_iter = 1
    return config
