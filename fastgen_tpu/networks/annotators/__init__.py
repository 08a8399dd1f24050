from fastgen_tpu.networks.annotators.depth_anything_v2 import (  # noqa: F401
    DepthAnnotator,
    DepthAnythingV2,
    convert_depth_anything,
)
