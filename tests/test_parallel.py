"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicscribe_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_params,
    shard_batch,
)


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")


def test_mesh_axes(devices_ok):
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    mesh2 = make_mesh(8, model_parallel=2)
    assert dict(mesh2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(8, model_parallel=3)


def test_replicated_params_on_all_devices(devices_ok):
    mesh = make_mesh(8)
    params = {"w": jnp.ones((16, 16)), "b": jnp.zeros((16,))}
    rep = replicate_params(params, mesh)
    assert len(rep["w"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(rep["w"]), np.ones((16, 16)))


def test_sharded_batch_computation(devices_ok):
    """A data-sharded batch computation must produce identical results to the
    single-device computation (GSPMD correctness, not just placement)."""
    mesh = make_mesh(8)
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    w = jnp.ones((4, 4))
    xs = jax.device_put(x, batch_sharding(mesh, 2, axis=0))
    ws = replicate_params(w, mesh)

    f = jax.jit(lambda a, b: jax.nn.relu(a @ b - 10.0))
    got = np.asarray(f(xs, ws))
    want = np.asarray(f(x, w))
    np.testing.assert_allclose(got, want)
    # the batch axis stays sharded over "data"
    out_sharding = f(xs, ws).sharding
    assert len(out_sharding.device_set) == 8


def test_shard_batch_tree(devices_ok):
    mesh = make_mesh(8)
    tree = {"a": jnp.zeros((16, 3)), "b": jnp.zeros((7,))}  # 7 not divisible
    sh = shard_batch(tree, mesh)
    assert len(sh["a"].sharding.device_set) == 8
    # non-divisible leaf falls back to replication without error
    np.testing.assert_array_equal(np.asarray(sh["b"]), np.zeros((7,)))
