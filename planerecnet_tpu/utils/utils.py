"""Console / checkpoint-path utilities (reference utils/utils.py:12-165).

``SavePath`` keeps the reference's checkpoint-name codec
``<model>_<epoch>_<iter>[.npz|_interrupt.npz]`` so resume-by-name and
latest/interrupt discovery behave identically; the payload format is the
framework's own msgpack/npz checkpoints instead of ``.pth``.
"""

from __future__ import annotations

import math
import os
from collections import deque
from pathlib import Path
from typing import Optional

CKPT_EXT = ".npz"


class MovingAverage:
    """Windowed mean that drops non-finite values
    (reference utils/utils.py:12-51)."""

    def __init__(self, max_window_size: int = 1000):
        self.max_window_size = max_window_size
        self.reset()

    def add(self, elem: float):
        if not math.isfinite(elem):
            print("Warning: Moving average ignored a value of %f" % elem)
            return
        self.window.append(elem)
        self.sum += elem
        if len(self.window) > self.max_window_size:
            self.sum -= self.window.popleft()

    append = add

    def reset(self):
        self.window = deque()
        self.sum = 0.0

    def get_avg(self) -> float:
        return self.sum / max(len(self.window), 1)

    def __str__(self):
        return str(self.get_avg())

    def __repr__(self):
        return repr(self.get_avg())

    def __len__(self):
        return len(self.window)


class ProgressBar:
    """Simple string progress bar (reference utils/utils.py:54-89)."""

    def __init__(self, length: int, max_val: int):
        self.max_val = max_val
        self.length = length
        self.cur_val = 0
        self.cur_num_bars = -1
        self._update_str()

    def set_val(self, new_val: int):
        self.cur_val = min(max(new_val, 0), self.max_val)
        self._update_str()

    def is_finished(self) -> bool:
        return self.cur_val == self.max_val

    def _update_str(self):
        num_bars = int(self.length * (self.cur_val / self.max_val))
        if num_bars != self.cur_num_bars:
            self.cur_num_bars = num_bars
            self.string = "█" * num_bars + "░" * (self.length - num_bars)

    def __repr__(self):
        return self.string

    def __str__(self):
        return self.string


def init_console():
    """ANSI escape setup on Windows (reference utils/utils.py:92-99);
    a no-op on every platform this framework targets."""
    if os.name == "nt":  # pragma: no cover
        try:
            from colorama import init
            init()
        except ImportError:
            pass


class SavePath:
    """Checkpoint-name codec ``<model>_<epoch>_<iter>``
    (reference utils/utils.py:102-165)."""

    def __init__(self, model_name: str, epoch: int, iteration: int):
        self.model_name = model_name
        self.epoch = epoch
        self.iteration = iteration

    def get_path(self, root: str = "") -> str:
        file_name = (f"{self.model_name}_{self.epoch}_{self.iteration}"
                     f"{CKPT_EXT}")
        return os.path.join(root, file_name)

    @staticmethod
    def from_str(path: str) -> "SavePath":
        file_name = os.path.basename(path)
        if file_name.endswith(CKPT_EXT):
            file_name = file_name[:-len(CKPT_EXT)]
        elif file_name.endswith(".pth"):
            file_name = file_name[:-4]
        params = file_name.split("_")
        if file_name.endswith("interrupt"):
            params = params[:-1]
        model_name = "_".join(params[:-2])
        return SavePath(model_name, int(params[-2]), int(params[-1]))

    @staticmethod
    def remove_interrupt(save_folder: str):
        for p in Path(save_folder).glob(f"*_interrupt{CKPT_EXT}"):
            p.unlink()

    @staticmethod
    def get_interrupt(save_folder: str) -> Optional[str]:
        for p in Path(save_folder).glob(f"*_interrupt{CKPT_EXT}"):
            return str(p)
        return None

    @staticmethod
    def get_latest(save_folder: str, config: str) -> Optional[str]:
        max_iter, max_name = -1, None
        for p in Path(save_folder).glob(config + "_*"):
            try:
                save = SavePath.from_str(str(p))
            except (ValueError, IndexError):
                continue
            if save.model_name == config and save.iteration > max_iter:
                max_iter = save.iteration
                max_name = str(p)
        return max_name
