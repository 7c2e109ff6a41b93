"""Device mesh construction and sharded inference steps."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import rec_forward
from ..ops.ctc import ctc_topk_device


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the first ``n_devices`` devices.

    ``data`` defaults to n_devices // model. For a single chip this is the
    trivial 1×1 mesh, so all code paths are mesh-shaped from the start.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    elif data * model > n:
        raise ValueError(
            f"data={data} × model={model} needs {data * model} devices, "
            f"have {n}"
        )
    # an explicit smaller data axis uses the first data*model devices
    grid = np.array(devs[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, batch: np.ndarray) -> jax.Array:
    """Place a host batch with the leading axis sharded over "data"."""
    return jax.device_put(batch, NamedSharding(mesh, P("data")))


def shard_rec_params(mesh: Mesh, params) -> dict:
    """Place recognizer params on the mesh with the training-side layout
    (Megatron TP over the SVTR blocks; see train.trainer.param_shardings)."""
    from ..train.trainer import param_shardings

    shardings = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)


def sharded_rec_infer(mesh: Mesh):
    """Build a pjit-style rec inference step: batch sharded over "data",
    logits sharded over "model" until the final argmax gathers.

    Returns ``step(params, batch_u8_nhwc_normalized…)`` — actually takes the
    already-normalized [N,H,W,3] float input to stay transport-agnostic.
    """

    @jax.jit
    def step(params, x):
        probs = rec_forward(params, x)
        idx, val = ctc_topk_device(probs)
        return idx, val

    def run(params, x):
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        return step(params, xs)

    return run
