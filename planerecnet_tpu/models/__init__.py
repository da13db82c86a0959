from planerecnet_tpu.models.planerecnet import PlaneRecNet  # noqa: F401
from planerecnet_tpu.models.backbone import (  # noqa: F401
    ResNetBackbone, construct_backbone)
