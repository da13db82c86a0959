"""PlaneRecNet-TPU: a TPU-native (JAX/XLA/Pallas/pjit) re-design of
EryiXie/PlaneRecNet — joint piece-wise planar instance segmentation and
monocular depth estimation from a single RGB image."""

__version__ = "0.1.0"

from planerecnet_tpu.config import (  # noqa: F401
    PlaneRecNetConfig,
    PlaneRecNet_base_config,
    PlaneRecNet_101_config,
    PlaneRecNet_50_config,
    get_cfg,
    set_cfg,
    set_dataset,
)
