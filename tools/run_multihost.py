"""Local N-process multi-host launcher for train.py.

Spawns ``--nproc`` real OS processes, each a full ``train.py --multihost``
worker with its own JAX runtime, wired together through a localhost
coordinator (``jax.distributed.initialize`` + Gloo CPU collectives). This
exercises the REAL multi-host code paths — collective init order, disjoint
per-process input shards, ``make_array_from_process_local_data`` assembly,
main-process-only checkpoint/log gating — that in-process monkeypatched
tests cannot (VERDICT round-3 task 3).

On this single-TPU deployment the workers run on the CPU backend
(``PRN_PLATFORM=cpu`` — the axon TPU plugin overrides ``JAX_PLATFORMS``, so
the platform must be forced in-process; see
parallel/spmd.py::initialize_distributed). On a real pod each host would
run the same ``train.py --multihost`` with its TPU-runtime-provided
coordinator instead.

Usage:
  python tools/run_multihost.py --nproc 2 --devices_per_proc 1 -- \
      --config PlaneRecNet_tiny_config --batch_size 2 ...
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import socket
import subprocess
import sys
import tempfile
from typing import List, Optional

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch(nproc: int, devices_per_proc: int, train_args: List[str],
           platform: str = "cpu", log_dir: Optional[str] = None,
           timeout: Optional[float] = None, port: Optional[int] = None,
           extra_env: Optional[dict] = None) -> List[str]:
    """Run the N-process job; returns the per-process log file paths.
    Raises CalledProcessError on any worker failure."""
    port = port or _free_port()
    log_dir = log_dir or tempfile.mkdtemp(prefix="prn_multihost_")
    os.makedirs(log_dir, exist_ok=True)

    procs, logs = [], []
    for pid in range(nproc):
        env = dict(os.environ)
        env["PRN_PLATFORM"] = platform
        env["PRN_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["PRN_NUM_PROCESSES"] = str(nproc)
        env["PRN_PROCESS_ID"] = str(pid)
        if platform == "cpu":
            flags = env.get("XLA_FLAGS", "")
            env["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                        f"{devices_per_proc}").strip()
            # CPU runs must not share the TPU AOT compile cache (SIGILL on
            # reload — see .claude/skills/verify); drop it for workers.
            env.pop("JAX_COMPILATION_CACHE_DIR", None)
        env.update(extra_env or {})
        log_path = osp.join(log_dir, f"worker{pid}.log")
        logs.append(log_path)
        cmd = [sys.executable, "-u", osp.join(REPO, "train.py"),
               "--multihost"] + list(train_args)
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=open(log_path, "w"),
            stderr=subprocess.STDOUT, cwd=os.getcwd()))

    codes = [p.wait(timeout=timeout) for p in procs]
    for pid, (code, log) in enumerate(zip(codes, logs)):
        print(f"--- worker {pid} (exit {code}) {log} ---")
        with open(log) as f:
            tail = f.readlines()[-12:]
        sys.stdout.writelines(f"[p{pid}] {line}" for line in tail)
    bad = [c for c in codes if c != 0]
    if bad:
        raise subprocess.CalledProcessError(bad[0], "train.py --multihost")
    return logs


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--nproc", type=int, default=2)
    p.add_argument("--devices_per_proc", type=int, default=1)
    p.add_argument("--platform", default="cpu")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--timeout", type=float, default=None)
    p.add_argument("train_args", nargs=argparse.REMAINDER,
                   help="arguments after '--' go to train.py")
    args = p.parse_args(argv)
    train_args = args.train_args
    if train_args and train_args[0] == "--":
        train_args = train_args[1:]
    launch(args.nproc, args.devices_per_proc, train_args,
           platform=args.platform, log_dir=args.log_dir,
           timeout=args.timeout)
    print("all workers completed")


if __name__ == "__main__":
    main()
