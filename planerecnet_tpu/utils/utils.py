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
    """Windowed mean over the last ``max_window_size`` finite samples.

    Same console-smoothing role as the reference's loss averager
    (reference utils/utils.py:12-51): non-finite samples are ignored with a
    warning. The mean is computed lazily with ``math.fsum`` over the bounded
    window (called once per log line), which avoids the drift a running
    add/subtract sum accumulates over a 125k-iteration run.
    """

    def __init__(self, max_window_size: int = 1000):
        self._window: deque = deque(maxlen=max_window_size)

    def add(self, elem: float):
        if math.isfinite(elem):
            self._window.append(float(elem))
        else:
            print(f"Warning: Moving average ignored a value of {elem}")

    append = add

    def reset(self):
        self._window.clear()

    def get_avg(self) -> float:
        if not self._window:
            return 0.0
        return math.fsum(self._window) / len(self._window)

    def __str__(self):
        return str(self.get_avg())

    def __repr__(self):
        return repr(self.get_avg())

    def __len__(self):
        return len(self._window)


class ProgressBar:
    """Console progress bar string, rendered on demand
    (same console role as reference utils/utils.py:54-89)."""

    def __init__(self, length: int, max_val: int):
        self.max_val = max(max_val, 1)
        self.length = length
        self.cur_val = 0

    def set_val(self, new_val: int):
        self.cur_val = min(max(new_val, 0), self.max_val)

    def is_finished(self) -> bool:
        return self.cur_val == self.max_val

    def __repr__(self):
        filled = self.length * self.cur_val // self.max_val
        return "█" * filled + "░" * (self.length - filled)

    __str__ = __repr__


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


def enable_tpu_compile_cache(cache_dir: Optional[str] = None) -> bool:
    """Enable JAX's persistent compilation cache when running on TPU.

    On this environment's remote-compile tunnel a cold PRN-50 pipeline
    compile costs minutes; cached TPU executables reload in seconds
    (PERF.md round 3). CPU AOT artifacts from the remote-compile service
    are NOT safe to reload (SIGILL on this host), so the cache is gated on
    the backend actually being TPU. Returns True when enabled.
    """
    import jax

    # Central platform override for subprocess-driven CLIs (every CLI calls
    # this hook first): plain JAX_PLATFORMS is overridden by the
    # out-of-process TPU plugin on this deployment, so forcing the backend
    # (e.g. PRN_PLATFORM=cpu for the closed-loop CPU test / multi-host
    # workers) must happen in-process before first backend use.
    if os.environ.get("PRN_PLATFORM"):
        try:
            jax.config.update("jax_platforms", os.environ["PRN_PLATFORM"])
        except Exception:
            pass

    try:
        if jax.default_backend() != "tpu":
            return False
        jax.config.update(
            "jax_compilation_cache_dir",
            cache_dir or os.path.expanduser("~/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        return True
    except Exception:
        return False


def tpu_compiler_options() -> dict:
    """Extra XLA:TPU compiler options for the heavy jitted programs.

    Parsed from ``PRN_TPU_COMPILER_OPTIONS`` ("flag=value,flag=value").
    This environment's TPU compiles run on a REMOTE service, so backend
    flags cannot go through ``XLA_FLAGS`` (the local CPU-side parser
    rejects TPU-only flags and aborts the process); per-jit
    ``compiler_options`` travel inside the PJRT compile request instead
    and are validated by the actual TPU compiler. Returns ``{}`` when the
    env is unset or the backend is not TPU (the CPU compiler would reject
    TPU flag names).

    Example: ``PRN_TPU_COMPILER_OPTIONS=xla_tpu_scoped_vmem_limit_kib=65536``.
    """
    spec = os.environ.get("PRN_TPU_COMPILER_OPTIONS", "").strip()
    if not spec:
        return {}
    import jax

    try:
        if jax.default_backend() != "tpu":
            return {}
    except Exception:
        return {}
    opts = {}
    for item in spec.split(","):
        if not item.strip():
            continue
        key, _, val = item.partition("=")
        opts[key.strip()] = val.strip()
    return opts


def jit_kwargs() -> dict:
    """kwargs to splat into ``jax.jit`` for framework-level programs:
    ``{"compiler_options": {...}}`` when PRN_TPU_COMPILER_OPTIONS is set
    on TPU, else ``{}`` (so the default path is byte-identical)."""
    opts = tpu_compiler_options()
    return {"compiler_options": opts} if opts else {}
