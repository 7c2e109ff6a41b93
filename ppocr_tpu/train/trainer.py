"""CTC training step for the recognizer, sharded over a device mesh.

Data parallel over the "data" axis (batch sharded; XLA all-reduces grads
over ICI) + tensor parallel over "model" for the SVTR mixer blocks'
attention/MLP matrices. The 6,625-way CTC projection itself stays
REPLICATED (6,625 is not divisible by practical model-axis widths —
param_shardings documents the rule), so "model" shards the transformer
weights, not the head. Loss is optax's CTC (log-semiring forward
algorithm).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.det_db import det_forward
from ..models.rec_svtr import rec_forward_logits


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def normalize_rec_images(images):
    """uint8 HWC images → the rec [-1, 1] normalization, on device.

    Datasets ship raw uint8 so a training batch moves 4× fewer bytes
    host→device than pre-normalized f32 (the axon tunnel leaks host RSS
    per byte transferred AND wedged mid-run at ~50 GB cumulative during
    the round-3/4 jumbo runs — CLAUDE.md gotchas); f32 inputs pass
    through for pre-normalized callers. Device math is the exact host
    expression ((x/255 − 0.5)·2) in f32, so the loss is bit-identical."""
    if images.dtype == jnp.uint8:
        return (images.astype(jnp.float32) / 255.0 - 0.5) * 2.0
    return images


def ctc_train_loss(params, batch):
    """Mean CTC loss over a batch dict {images, labels, label_paddings}
    (images uint8 or pre-normalized f32 — see normalize_rec_images).

    optax.ctc_loss applies log_softmax internally, so raw logits go in
    directly (an explicit log_softmax first was numerically identical —
    idempotent — but a wasted full-vocab pass per step, review r3)."""
    logits = rec_forward_logits(params, normalize_rec_images(batch["images"]))
    logit_paddings = jnp.zeros(logits.shape[:2], jnp.float32)
    per_seq = optax.ctc_loss(
        logits, logit_paddings, batch["labels"], batch["label_paddings"]
    )
    return jnp.mean(per_seq)


def det_train_loss(params, batch):
    """Balanced BCE on the DB shrink mask, {images [N,H,W,3] normalized,
    masks [N,H,W] ∈ {0,1}}. Positives (shrunk text cores) are a few percent
    of pixels, so each side is mean-normalized separately and averaged —
    the fixed-point analog of DB's 1:3 OHEM without data-dependent shapes
    (XLA-friendly: no sorting/masking by count)."""
    prob = det_forward(params, batch["images"]).astype(jnp.float32)
    m = batch["masks"]
    eps = 1e-6
    p = jnp.clip(prob, eps, 1.0 - eps)
    pos = -(m * jnp.log(p)).sum() / jnp.maximum(m.sum(), 1.0)
    neg = -(((1.0 - m) * jnp.log(1.0 - p)).sum()) / jnp.maximum(
        (1.0 - m).sum(), 1.0
    )
    return pos + neg


def make_det_train_step(
    mesh: Mesh, learning_rate: float = 1e-3
) -> Tuple[optax.GradientTransformation, callable, callable]:
    """Detector trainer: params replicated (all convs, <2M weights), batch
    sharded over "data"; XLA all-reduces grads over ICI. Same
    (optimizer, init_fn, step_fn) contract as :func:`make_train_step`."""
    tx = optax.adamw(learning_rate)
    replicated = NamedSharding(mesh, P())

    def init_fn(params) -> TrainState:
        params = jax.tree.map(
            lambda leaf: jax.device_put(jnp.asarray(leaf), replicated), params
        )
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    batch_sharding = {
        "images": NamedSharding(mesh, P("data")),
        "masks": NamedSharding(mesh, P("data")),
    }

    @jax.jit
    def step_fn(state: TrainState, batch) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(det_train_loss)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def run_step(state, batch):
        batch = {
            k: jax.device_put(v, batch_sharding[k]) for k, v in batch.items()
        }
        return step_fn(state, batch)

    return tx, init_fn, run_step


def param_shardings(mesh: Mesh, params) -> dict:
    """Megatron-style tensor parallelism over the SVTR mixer blocks:
    qkv/fc1 are column-parallel (output dim over "model" — 360/240 divide
    by 8), proj/fc2 are row-parallel (input dim over "model"). The CTC
    vocab (6,625 = 5³·53) does not divide by 2, so the projection stays
    replicated. Everything else (convs) is small and replicated."""
    n_model = mesh.shape["model"]

    def spec(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if leaf.ndim >= 1 and keys[-1] in ("w", "b"):
            col = any(k in keys for k in ("qkv", "fc1"))
            row = any(k in keys for k in ("proj", "fc2"))
            if col and leaf.shape[-1] % n_model == 0:
                if leaf.ndim == 2:
                    return NamedSharding(mesh, P(None, "model"))
                return NamedSharding(mesh, P("model"))
            if row and keys[-1] == "w" and leaf.shape[0] % n_model == 0:
                return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def make_train_step(
    mesh: Mesh, learning_rate: float = 1e-4
) -> Tuple[optax.GradientTransformation, callable, callable]:
    """Returns (optimizer, init_fn, step_fn).

    ``init_fn(params)`` shards params/opt state over the mesh;
    ``step_fn(state, batch)`` is jitted with batch sharded over "data" —
    one optimizer step, returns (state, loss).
    """
    tx = optax.adamw(learning_rate)

    def init_fn(params) -> TrainState:
        p_sh = param_shardings(mesh, params)
        params = jax.tree.map(
            lambda leaf, s: jax.device_put(leaf, s), params, p_sh
        )
        opt_state = tx.init(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    batch_sharding = {
        "images": NamedSharding(mesh, P("data")),
        "labels": NamedSharding(mesh, P("data")),
        "label_paddings": NamedSharding(mesh, P("data")),
    }

    @jax.jit
    def step_fn(state: TrainState, batch) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(ctc_train_loss)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def run_step(state, batch):
        batch = {
            k: jax.device_put(v, batch_sharding[k]) for k, v in batch.items()
        }
        return step_fn(state, batch)

    return tx, init_fn, run_step


class BatchPrefetcher:
    """Host-side batch producer thread: overlaps synthetic data generation
    (PIL rendering is ~0.4 s/batch on one core) with the device step (the
    chip needs no host CPU while it runs), roughly halving step wall time
    on single-core hosts. Pure CPU work on the thread — device calls stay
    on the caller's thread (non-main-thread compiles deadlock the TPU
    tunnel)."""

    def __init__(self, make_batch, depth: int = 4):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        def produce():
            while not self._stop.is_set():
                try:
                    item = make_batch()
                except Exception as e:  # surface in next()
                    item = e
                self._q.put(item)
                if isinstance(item, Exception):
                    return

        self._t = threading.Thread(target=produce, daemon=True)
        self._t.start()

    def next(self):
        item = self._q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        # drain (unblocks a producer stuck in put) AND join: callers touch
        # the shared dataset right after close() (eval batches on the same
        # numpy Generator), so the producer must have fully exited, not
        # merely been signalled, before close() returns
        while self._t.is_alive():
            try:
                self._q.get_nowait()
            except Exception:
                pass
            self._t.join(timeout=0.05)
