from fastgen_tpu.networks.ltx2.network import (
    LTX2VideoDiT,
    calculate_shift,
    pack_audio_latents,
    pack_latents,
    shift_sigmas,
    unpack_audio_latents,
    unpack_latents,
)

__all__ = ["LTX2VideoDiT", "pack_latents", "unpack_latents",
           "pack_audio_latents", "unpack_audio_latents",
           "calculate_shift", "shift_sigmas"]
