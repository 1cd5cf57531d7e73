"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from devc_tpu.ops.correspondence import correspondence_warp_einsum
from devc_tpu.parallel.mesh import make_mesh
from devc_tpu.parallel.sharded_corr import correspondence_warp_sharded


def test_row_sharded_correspondence_matches_einsum(rng):
    n_model = min(4, len(jax.devices()))
    mesh = make_mesh(n_data=len(jax.devices()) // n_model, n_model=n_model)

    b, nq, nk, c, v = 1, 64 * n_model, 96, 16, 3
    theta = rng.randn(b, nq, c).astype(np.float32)
    phi = rng.randn(b, nk, c).astype(np.float32)
    values = rng.randn(b, nk, v).astype(np.float32)

    ref_w, ref_s = correspondence_warp_einsum(
        jnp.array(theta), jnp.array(phi), jnp.array(values), temperature=0.01
    )

    theta_s = jax.device_put(
        jnp.array(theta), NamedSharding(mesh, P(None, "model", None))
    )
    phi_r = jax.device_put(jnp.array(phi), NamedSharding(mesh, P()))
    values_r = jax.device_put(jnp.array(values), NamedSharding(mesh, P()))
    with mesh:
        w, s = correspondence_warp_sharded(
            theta_s, phi_r, values_r, mesh, temperature=0.01
        )
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), atol=1e-5)


def test_mesh_helpers():
    from devc_tpu.parallel.mesh import data_sharding, replicated, shard_batch

    mesh = make_mesh()
    assert mesh.axis_names == ("data", "model")
    x = jnp.ones((8, 4, 4, 3))
    xs = jax.device_put(x, data_sharding(mesh, x.ndim))
    assert xs.sharding.spec == P("data", None, None, None)
    tree = shard_batch(mesh, {"a": jnp.ones((8, 2))})
    assert tree["a"].sharding.spec == P("data", None)


def test_key_sharded_correspondence_matches_einsum(rng):
    """Context-parallel (key-sharded) softmax combine is exact."""
    from devc_tpu.parallel.sharded_corr import correspondence_warp_key_sharded

    n_model = min(4, len(jax.devices()))
    mesh = make_mesh(n_data=len(jax.devices()) // n_model, n_model=n_model)

    b, nq, nk, c, v = 1, 48, 64 * n_model, 16, 3
    theta = rng.randn(b, nq, c).astype(np.float32)
    phi = rng.randn(b, nk, c).astype(np.float32)
    values = rng.randn(b, nk, v).astype(np.float32)

    ref_w, ref_s = correspondence_warp_einsum(
        jnp.array(theta), jnp.array(phi), jnp.array(values), temperature=0.02
    )

    phi_s = jax.device_put(
        jnp.array(phi), NamedSharding(mesh, P(None, "model", None))
    )
    values_s = jax.device_put(
        jnp.array(values), NamedSharding(mesh, P(None, "model", None))
    )
    theta_r = jax.device_put(jnp.array(theta), NamedSharding(mesh, P()))
    with mesh:
        w, s = correspondence_warp_key_sharded(
            theta_r, phi_s, values_s, mesh, temperature=0.02
        )
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w), atol=1e-4)


def test_key_sharded_hard_argmax(rng):
    """T=1e-10 across shards: the argmax-average must survive the combine."""
    from devc_tpu.parallel.sharded_corr import correspondence_warp_key_sharded

    n_model = min(2, len(jax.devices()))
    mesh = make_mesh(n_data=len(jax.devices()) // n_model, n_model=n_model)
    b, nq, nk, c, v = 1, 16, 32 * n_model, 8, 3
    theta = rng.randn(b, nq, c).astype(np.float32)
    phi = rng.randn(b, nk, c).astype(np.float32)
    values = rng.randn(b, nk, v).astype(np.float32)
    ref_w, ref_s = correspondence_warp_einsum(
        jnp.array(theta), jnp.array(phi), jnp.array(values), temperature=1e-10
    )
    with mesh:
        w, s = correspondence_warp_key_sharded(
            jax.device_put(jnp.array(theta), NamedSharding(mesh, P())),
            jax.device_put(jnp.array(phi), NamedSharding(mesh, P(None, "model", None))),
            jax.device_put(jnp.array(values), NamedSharding(mesh, P(None, "model", None))),
            mesh, temperature=1e-10,
        )
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w), atol=1e-4)
