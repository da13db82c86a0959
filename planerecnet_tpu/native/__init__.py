"""Native (C) components, built on demand with the system compiler.

The compute path is JAX/XLA/Pallas; these are host-side runtime pieces
(data-loader codecs) where the reference leaned on C extensions
(pycocotools). Loading is best-effort: every native entry point has a
pure-python fallback.
"""

from planerecnet_tpu.native.rle_native import (  # noqa: F401
    native_available,
    rle_decode_counts_native,
    rle_encode_mask_native,
    rle_fill_native,
)
