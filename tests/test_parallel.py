import jax
import jax.numpy as jnp
import numpy as np

from tinyfaces_tpu.parallel.distributed import (
    host_local_batch,
    initialize,
    process_batch_slice,
)
from tinyfaces_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_tree,
    shard_batch,
)


def test_initialize_noop_single_process():
    initialize()  # must not raise or spawn anything


def test_mesh_and_shardings():
    mesh = make_mesh(jax.devices()[:8])
    assert mesh.shape == {"data": 8}
    batch = {"x": np.arange(16.0).reshape(16, 1)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.is_equivalent_to(batch_sharding(mesh), 2)

    tree = replicate_tree({"w": jnp.ones((3, 3))}, mesh)
    assert tree["w"].sharding.is_fully_replicated


def test_host_local_batch_single_host():
    mesh = make_mesh(jax.devices()[:4])
    batch = {"x": np.arange(8.0).reshape(8, 1)}
    arr = host_local_batch(batch, mesh)["x"]
    assert arr.shape == (8, 1)
    np.testing.assert_array_equal(np.asarray(arr), batch["x"])


def test_process_batch_slice_single_host():
    s = process_batch_slice(24)
    assert (s.start, s.stop) == (0, 24)


def test_sharded_computation_reduces_over_mesh():
    mesh = make_mesh(jax.devices()[:8])
    x = shard_batch(np.ones((16, 4), np.float32), mesh)

    @jax.jit
    def f(x):
        return jnp.sum(x)

    assert float(f(x)) == 64.0
