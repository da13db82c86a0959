"""Training state, optimizer, LR schedule and the jitted/pjit train step.

TPU-native re-design of the reference training loop core
(reference train.py:216-412): the per-iteration python body (zero_grad ->
forward -> loss sum -> backward -> conditional step, train.py:344-354)
becomes one jitted ``train_step`` with donated buffers; the LR warmup + step
schedule (train.py:335-341) becomes a pure function of the step counter (the
reference reconstructs schedule state from the iteration on resume —
train.py:339-341 — which a pure schedule gives for free).

Optimizer parity notes (reference train.py:251-256): the reference creates
Adam param groups with 5x lr for the backbone and 2x for the depth decoder,
but its ``set_lr`` (train.py:415-420) overwrites *all* groups with one value
and is invoked at iteration 0 by warmup — so the multipliers never actually
apply. We default to the effective (uniform-lr) behaviour and expose the
intended multipliers behind ``per_module_lr=True``.

Non-finite-loss handling matches train.py:352-354: gradients are computed
but the update is skipped when the total loss is not finite.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state as flax_train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from planerecnet_tpu.config import PlaneRecNetConfig
from planerecnet_tpu.losses import compute_losses
from planerecnet_tpu.models.planerecnet import PlaneRecNet


class TrainState(flax_train_state.TrainState):
    batch_stats: Any = None
    rng: Optional[jax.Array] = None


def lr_schedule(cfg: PlaneRecNetConfig, base_lr: Optional[float] = None):
    """LR warmup + step decay as a pure function of the iteration
    (reference train.py:335-341; data/config.py:419-431)."""
    lr = base_lr if base_lr is not None else cfg.lr
    steps = jnp.asarray(cfg.lr_steps, jnp.int32)

    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        n_steps = jnp.sum(it >= steps.astype(jnp.float32))
        base = lr * cfg.gamma ** n_steps
        if cfg.lr_warmup_until > 0:
            warm = ((lr - cfg.lr_warmup_init) * (it / cfg.lr_warmup_until)
                    + cfg.lr_warmup_init)
            return jnp.where(it <= cfg.lr_warmup_until, warm, base)
        return base

    return schedule


def make_optimizer(cfg: PlaneRecNetConfig, base_lr: Optional[float] = None,
                   per_module_lr: bool = False) -> optax.GradientTransformation:
    """Adam with the reference's schedule; optional per-module lr multipliers
    (the reference's *intended* 5x-backbone / 2x-depth grouping,
    train.py:251-256)."""
    schedule = lr_schedule(cfg, base_lr)
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)

    # optax.flatten: run the update on ONE raveled vector instead of ~500
    # per-leaf elementwise HLOs. Isolated cost drops 24.8 -> 8.3 ms/update,
    # and inside the fused train-step program the per-leaf form interacted
    # pathologically with the backward's scheduling (~290 ms of a ~300 ms
    # step — measured via tools/profile_train.py --no_opt ablations).
    if not per_module_lr:
        return optax.flatten(
            optax.chain(adam, optax.scale_by_learning_rate(schedule)))

    def multiplier(path, _):
        top = path[0].key if path else ""
        if top == "backbone":
            return 5.0
        if top == "depth_decoder":
            return 2.0
        return 1.0

    def scale_by_module(params):
        return jax.tree_util.tree_map_with_path(multiplier, params)

    # Per-module scaling needs the tree structure, so it sits OUTSIDE the
    # flattened adam+lr core.
    return optax.chain(
        optax.flatten(optax.chain(
            adam, optax.scale_by_learning_rate(schedule))),
        _per_module_scale(scale_by_module),
    )


def _per_module_scale(mult_fn):
    def init_fn(params):
        return mult_fn(params)

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, m: u * m, updates, state), state

    return optax.GradientTransformation(init_fn, update_fn)


def create_train_state(cfg: PlaneRecNetConfig, rng: jax.Array,
                       input_shape: Tuple[int, int] = (480, 640),
                       base_lr: Optional[float] = None,
                       per_module_lr: bool = False) -> TrainState:
    """Initialise model params + batch stats + optimizer state."""
    model = PlaneRecNet(cfg)
    init_rng, state_rng = jax.random.split(rng)
    x = jnp.zeros((1, input_shape[0], input_shape[1], 3), jnp.float32)
    variables = model.init(init_rng, x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg, base_lr, per_module_lr)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx,
        batch_stats=batch_stats, rng=state_rng)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _scatter_mask_rows(b: int, n_cap: int, sparse: jnp.ndarray,
                       slots: jnp.ndarray) -> jnp.ndarray:
    """Scatter (M16, H, W8) valid-slot mask rows into the dense
    (B, n_cap, H, W8) packed form; padding rows carry the out-of-range
    slot ``b * n_cap`` and are dropped."""
    dense = jnp.zeros((b * n_cap,) + sparse.shape[1:], sparse.dtype)
    dense = dense.at[slots].set(sparse, mode="drop")
    return dense.reshape(b, n_cap, *sparse.shape[1:])


def densify_sparse_masks(cfg: PlaneRecNetConfig, batch: Dict) -> Dict:
    """Expand the valid-slot mask wire (``masks_sparse`` + ``mask_slots``,
    see ``data/datasets.py::collate_batch``) into the dense
    ``masks_packed`` form. Runs OUTSIDE the main train-step jit — the
    sparse row count varies per batch (in multiples of 16), and the tiny
    scatter program recompiling per distinct count must not drag the
    300-ms-class step program with it. No-op on dense batches."""
    if "masks_sparse" not in batch:
        return batch
    batch = dict(batch)
    sparse = batch.pop("masks_sparse")
    slots = batch.pop("mask_slots")
    b = batch["image"].shape[0]
    n_cap = cfg.max_instances
    if isinstance(sparse, np.ndarray):
        # Host path (the pjit shard_args route keeps batches in numpy
        # until the sharded device_put).
        dense = np.zeros((b * n_cap,) + sparse.shape[1:], sparse.dtype)
        valid = np.asarray(slots) < b * n_cap
        dense[np.asarray(slots)[valid]] = np.asarray(sparse)[valid]
        batch["masks_packed"] = dense.reshape(b, n_cap, *sparse.shape[1:])
    else:
        batch["masks_packed"] = _scatter_mask_rows(b, n_cap, sparse, slots)
    return batch


def unpack_wire_batch(cfg: PlaneRecNetConfig, batch: Dict) -> Dict:
    """Device-side inverse of ``collate_batch``'s compact wire format
    (host->device transfer is the sustained-training bottleneck on a
    remote-attached chip; see ``data/datasets.py::collate_batch``).

    All three unpacks trace into the jitted step, so they cost VPU cycles
    instead of tunnel bandwidth. Passes dense batches through unchanged
    (synthetic-batch tools and direct ``compute_losses`` callers keep the
    dense contract).
    """
    batch = densify_sparse_masks(cfg, batch)
    batch = dict(batch)
    if "masks_packed" in batch:
        packed = batch.pop("masks_packed")            # (B, N, H, ceil(W/8))
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        bits = (packed[..., None] >> shifts) & jnp.uint8(1)
        w = batch["image"].shape[2]
        batch["masks"] = bits.reshape(*packed.shape[:-1],
                                      packed.shape[-1] * 8)[..., :w]
    if "depth_q" in batch:
        res = cfg.dataset.depth_resolution or 1e-3
        batch["depth"] = batch.pop("depth_q").astype(jnp.float32) * res
    if batch["image"].dtype == jnp.uint8:
        # SSDAugmentation(device_normalize=True) ships u8 BGR; apply the
        # backbone transform here (augmentations.py::backbone_transform).
        from planerecnet_tpu.config import MEANS, STD
        t = cfg.backbone.transform
        img = batch["image"].astype(jnp.float32)
        if t.normalize:
            img = (img - jnp.asarray(MEANS)) / jnp.asarray(STD)
        elif t.subtract_means:
            img = img - jnp.asarray(MEANS)
        elif t.to_float:
            img = img / 255.0
        if t.channel_order == "RGB":
            img = img[..., ::-1]
        batch["image"] = img
    return batch


def grad_step(state: TrainState, batch: Dict, cfg: PlaneRecNetConfig
              ) -> Tuple[Dict, Any, Dict[str, jnp.ndarray]]:
    """Forward + joint loss + backward: returns (grads, new_batch_stats,
    losses). ``cfg`` must be a static (hashable) argument."""
    batch = unpack_wire_batch(cfg, batch)
    step_rng = jax.random.fold_in(state.rng, state.step)

    def loss_fn(params):
        preds, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"], train=True, mutable=["batch_stats"])
        losses = compute_losses(cfg, preds, batch, step_rng)
        total = sum(losses.values())
        return total, (losses, mutated.get("batch_stats", state.batch_stats))

    (total, (losses, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    return grads, new_bs, dict(losses, total=total)


def apply_grads(state: TrainState, grads: Dict, new_bs: Any,
                total: jnp.ndarray) -> TrainState:
    """Optimizer update with the reference's non-finite skip
    (train.py:352-354): gradients are zeroed and every state tree keeps its
    old value when the total loss is not finite."""
    finite = jnp.isfinite(total)
    safe_grads = jax.tree.map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
    updates, new_opt_state = state.tx.update(
        safe_grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    def keep_new(new, old):
        return jax.tree.map(lambda a, b: jnp.where(finite, a, b), new, old)

    return state.replace(
        step=state.step + 1,
        params=keep_new(new_params, state.params),
        opt_state=keep_new(new_opt_state, state.opt_state),
        batch_stats=keep_new(new_bs, state.batch_stats),
    )


def train_step(state: TrainState, batch: Dict, cfg: PlaneRecNetConfig
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step as a single traceable function (used by the
    CPU-mesh tests and the dryrun; on TPU the runtime executes the split
    two-program form — see ``jit_train_step``)."""
    grads, new_bs, losses = grad_step(state, batch, cfg)
    state = apply_grads(state, grads, new_bs, losses["total"])
    return state, losses


# Batch keys with an image-height axis shardable over the 'spatial' mesh
# dimension (2-D data x spatial training): key -> axis index. Wire-format
# keys keep H on the same axis (masks pack along W, depth quantizes).
_SPATIAL_AXES = {"image": 1, "depth": 1, "masks": 2,
                 "depth_q": 1, "masks_packed": 2}


def jit_train_step(cfg: PlaneRecNetConfig, mesh: Optional[Mesh] = None,
                   spatial: bool = False):
    """Jitted train step — the working replacement for the reference's broken
    ``CustomDataParallel`` (train.py:128-213). With a mesh, the batch is
    sharded on its leading axis over 'data' and the state replicated; XLA
    emits the gradient all-reduce over ICI.

    With ``spatial=True`` (and a mesh whose 'spatial' axis is > 1) the
    image-height dimension of the dense inputs is additionally sharded over
    'spatial': XLA SPMD inserts the conv halo exchanges, partitioning the
    640x640 activations across chips — the activation-memory scaling axis
    for this CNN (the analogue of context parallelism, SURVEY.md §2 C16).
    """
    # Two-program split: (forward+loss+backward) and (optimizer update) are
    # separate XLA executables. Fusing them into one program makes this
    # runtime's scheduler interact pathologically with the per-param update
    # tail — measured 553.9 ms/iter fused vs ~30 ms split for the identical
    # math (PRN-101 bs=8 640x640 bf16; see PERF.md round-2 ablations). The
    # split costs one extra dispatch plus a grads round-trip through HBM
    # (~0.6 ms) and keeps every buffer on device.
    gradp = functools.partial(grad_step, cfg=cfg)

    from planerecnet_tpu.utils.utils import jit_kwargs
    jkw = jit_kwargs()

    if mesh is None:
        jit_g = jax.jit(gradp, **jkw)
        jit_u = jax.jit(apply_grads, donate_argnums=(0, 1), **jkw)

        def step(state, batch):
            # Valid-slot mask wire expands OUTSIDE jit_g: its row count
            # varies per batch and must not retrace the step program.
            batch = densify_sparse_masks(cfg, batch)
            grads, new_bs, losses = jit_g(state, batch)
            state = jit_u(state, grads, new_bs, losses["total"])
            return state, losses

        return step

    repl = NamedSharding(mesh, P())

    def shard_args(state, batch):
        # Valid-slot mask rows are not data-shardable (leading axis is the
        # batch-wide valid count, not B) — expand before the sharded puts.
        batch = densify_sparse_masks(cfg, batch)
        state = jax.device_put(state, repl)

        def put(key, x):
            parts = ["data"] + [None] * (x.ndim - 1)
            ax = _SPATIAL_AXES.get(key) if spatial else None
            if ax is not None and x.ndim > ax:
                parts[ax] = "spatial"
            sharding = NamedSharding(mesh, P(*parts))
            if jax.process_count() > 1:
                # Multi-host: every process holds only its disjoint slice of
                # the global batch (BatchIterator shards by process_index);
                # assemble the global array from the per-process shards.
                return jax.make_array_from_process_local_data(sharding, x)
            return jax.device_put(x, sharding)

        batch = {k: put(k, v) for k, v in batch.items()}
        return state, batch

    jit_g = jax.jit(gradp, out_shardings=(repl, repl, repl), **jkw)
    jit_u = jax.jit(apply_grads, donate_argnums=(0, 1), out_shardings=repl,
                    **jkw)

    def step(state, batch):
        grads, new_bs, losses = jit_g(state, batch)
        state = jit_u(state, grads, new_bs, losses["total"])
        return state, losses

    step.shard_args = shard_args
    return step
