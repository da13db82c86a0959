from planerecnet_tpu.data.coco import COCO, mask_to_rle, polygons_to_mask, rle_to_mask  # noqa: F401
from planerecnet_tpu.data.datasets import (  # noqa: F401
    DATASET_CLASSES,
    BatchIterator,
    NYUDataset,
    PlaneAnnoDataset,
    PrefetchIterator,
    S2D3DSDataset,
    ScanNetDataset,
    build_dataset,
    collate_batch,
    enforce_size,
    pad_instances,
)
from planerecnet_tpu.data.augmentations import (  # noqa: F401
    BaseTransform,
    Pad,
    ResizeAndPad,
    SSDAugmentation,
)
