from fastgen_tpu.networks.ltx2.network import LTX2VideoDiT, pack_latents, unpack_latents

__all__ = ["LTX2VideoDiT", "pack_latents", "unpack_latents"]
