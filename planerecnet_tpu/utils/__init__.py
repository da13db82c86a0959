from planerecnet_tpu.utils.utils import (  # noqa: F401
    MovingAverage,
    ProgressBar,
    SavePath,
    init_console,
)
