"""Frozen encoder stack (text / image / VAE) for conditioning and latents.

TPU-native counterparts of the reference's HF-backed encoders — the reference
wraps ``transformers``/``diffusers`` torch modules
(``SD15/network.py:344-436``, ``Wan/network.py:431-533``,
``Flux/network.py:25-170``, ``DiT/network.py:794``), encodes on GPU under
autocast, and feeds the results to ``Trainer.preprocess_data``
(``trainer.py:374-476``). Here each encoder is a flax module compiled once
with jit; weights convert from the torch checkpoints via
``fastgen_tpu/utils/torch_convert.py``-style name maps in each module.
"""

from fastgen_tpu.networks.encoders.clip import (
    CLIPTextTransformer,
    CLIPVisionTransformer,
    convert_clip_text,
    convert_clip_vision,
)
from fastgen_tpu.networks.encoders.t5 import T5Encoder, convert_t5
from fastgen_tpu.networks.encoders.vae import AutoencoderKL, convert_autoencoder_kl
from fastgen_tpu.networks.encoders.video_vae import CausalVideoVAE
from fastgen_tpu.networks.encoders.wan_vae import AutoencoderKLWan, WanVAE
from fastgen_tpu.networks.encoders.qwen25 import Qwen25TextModel, convert_qwen25
from fastgen_tpu.networks.encoders.wrappers import (
    CogVideoXTextEncoder,
    CosmosTextEncoder,
    FluxTextEncoder,
    HashTokenizer,
    SDXLTextEncoder,
    StableDiffusionTextEncoder,
    T5TextEncoder,
    VAEWrapper,
    VideoVAEWrapper,
    WanImageEncoder,
    WanTextEncoder,
)

__all__ = [
    "CLIPTextTransformer", "CLIPVisionTransformer",
    "convert_clip_text", "convert_clip_vision",
    "T5Encoder", "convert_t5",
    "AutoencoderKL", "convert_autoencoder_kl",
    "CausalVideoVAE", "AutoencoderKLWan", "WanVAE",
    "Qwen25TextModel", "convert_qwen25", "CosmosTextEncoder",
    "StableDiffusionTextEncoder", "SDXLTextEncoder", "FluxTextEncoder",
    "T5TextEncoder", "WanTextEncoder", "CogVideoXTextEncoder",
    "WanImageEncoder", "VAEWrapper", "VideoVAEWrapper", "HashTokenizer",
]
