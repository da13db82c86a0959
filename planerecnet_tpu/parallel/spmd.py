"""SPMD execution helpers: data-parallel and spatially-partitioned forward.

The reference's only parallelism is a broken single-process DataParallel
(reference train.py:153-213). Here parallelism is expressed as jit shardings
over a ("data", "spatial") mesh:

* **data**: batch axis sharding — the training default; XLA inserts the
  gradient all-reduce over ICI.
* **spatial**: image-height sharding of the conv activations — the analogue
  of context parallelism for this CNN workload (SURVEY.md §2 C16). XLA SPMD
  inserts the halo exchanges for every conv/resize window automatically, so
  a single 640x640 image can be partitioned across chips for
  latency-critical serving.

Multi-host: call ``jax.distributed.initialize()`` first; the same shardings
then span hosts over DCN.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from planerecnet_tpu.config import PlaneRecNetConfig
from planerecnet_tpu.models.planerecnet import PlaneRecNet


def initialize_distributed(**kwargs) -> None:
    """Multi-host entry point (growth path of SURVEY.md §5): initialise the
    JAX distributed runtime so meshes span hosts over DCN.

    Worker wiring can come from the environment (set by a launcher such as
    ``tools/run_multihost.py``): ``PRN_COORDINATOR_ADDRESS`` /
    ``PRN_NUM_PROCESSES`` / ``PRN_PROCESS_ID`` map to the matching
    ``jax.distributed.initialize`` arguments, and ``PRN_PLATFORM`` forces
    the backend (the local-CPU test path — plain ``JAX_PLATFORMS`` is
    overridden by the out-of-process TPU plugin on this deployment, so the
    config update must happen in-process before first backend use).
    Explicit kwargs win over the environment.
    """
    import os
    if os.environ.get("PRN_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PRN_PLATFORM"])
    env_args = (("PRN_COORDINATOR_ADDRESS", "coordinator_address", str),
                ("PRN_NUM_PROCESSES", "num_processes", int),
                ("PRN_PROCESS_ID", "process_id", int))
    for env, key, cast in env_args:
        if env in os.environ and key not in kwargs:
            kwargs[key] = cast(os.environ[env])
    jax.distributed.initialize(**kwargs)


def jit_forward(cfg: PlaneRecNetConfig, mesh: Mesh,
                spatial: bool = False):
    """Jitted model forward with the batch sharded over 'data' and, when
    ``spatial=True``, image height additionally sharded over 'spatial'.

    Returns ``fn(variables, images) -> preds`` with replicated outputs.
    """
    model = PlaneRecNet(cfg)
    repl = NamedSharding(mesh, P())
    img_spec = NamedSharding(
        mesh, P("data", "spatial" if spatial else None, None, None))

    from planerecnet_tpu.utils.utils import jit_kwargs

    @functools.partial(jax.jit, out_shardings=repl, **jit_kwargs())
    def fn(variables, images):
        return model.apply(variables, images, train=False)

    def run(variables, images):
        variables = jax.device_put(variables, repl)
        images = jax.device_put(images, img_spec)
        return fn(variables, images)

    return run
