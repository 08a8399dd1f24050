"""fastgen_tpu — TPU-native diffusion-distillation framework.

Package import enables JAX's persistent compilation cache (XLA executables
keyed by HLO hash under ``$FASTGEN_COMPILE_CACHE`` or
``FASTGEN_OUTPUT/jax_cache``): the quality pipeline re-runs the same jitted
programs (train steps, InceptionV3 detector, samplers) across stages and
sessions, and on the tunneled-TPU backend each fresh compile costs minutes.
Set ``FASTGEN_COMPILE_CACHE=0`` to disable.
"""

from __future__ import annotations

import os


def _enable_compilation_cache() -> None:
    cache = os.environ.get("FASTGEN_COMPILE_CACHE", "")
    if cache == "0":
        return
    if not cache:
        root = os.environ.get("FASTGEN_OUTPUT_ROOT", "FASTGEN_OUTPUT")
        cache = os.path.join(root, "jax_cache")
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is an optimization, never fatal
        pass


_enable_compilation_cache()
