"""Device mesh + sharding specs (the reference's DataParallel, TPU-native).

The reference scales with single-process torch.nn.DataParallel over 4 GPUs
(reference train.py:349-358): replicate modules, scatter the batch. The
TPU-native equivalent is SPMD over a jax.sharding.Mesh:

  * "data" axis — batch dimension of frames/clips (the only parallelism the
    reference has). Gradients are reduced by XLA-inserted psums over ICI.
  * "model" axis (optional) — shards the rows of the N x N correspondence
    (the one op worth model-parallelism at high resolution): theta/query
    rows are split, phi/values are replicated, so each chip computes a
    row-block of the correlation and no cross-chip softmax is needed.

Everything here is ordinary positional sharding: annotate inputs with
NamedSharding and let XLA insert collectives (no hand-written NCCL-alikes).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Create a ("data", "model") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard one axis over "data", replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of batched arrays with axis 0 sharded over "data"."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree.map(put, tree)


def shard_params(mesh: Mesh, params):
    """Replicate parameters across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), params)
