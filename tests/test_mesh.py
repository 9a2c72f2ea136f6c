"""Mesh / sharding tests on the 8-device virtual CPU backend."""

import jax
import numpy as np

from heatnet_tpu.parallel.mesh import (
    create_mesh, data_sharding, pad_batch_to, replicate, shard_batch,
)


def test_backend_is_8_device_cpu():
    devs = jax.devices()
    assert len(devs) == 8
    assert devs[0].platform == "cpu"


def test_mesh_shape_and_sharding():
    mesh = create_mesh()
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    batch = {"x": np.zeros((16, 4, 4), np.float32)}
    sharded = shard_batch(mesh, batch)
    shards = sharded["x"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (2, 4, 4)


def test_replicate_and_jit_reduction():
    mesh = create_mesh()
    x = shard_batch(mesh, np.arange(16, dtype=np.float32).reshape(16, 1))
    w = replicate(mesh, np.ones((1,), np.float32))
    total = jax.jit(lambda a, b: (a * b).sum())(x, w)
    assert float(total) == float(np.arange(16).sum())


def test_create_mesh_subset_and_model_axis():
    mesh = create_mesh(num_devices=4, model_parallel=2)
    assert dict(mesh.shape) == {"data": 2, "model": 2}


def test_pad_batch_to():
    batch = {"x": np.arange(3, dtype=np.float32)}
    padded, n = pad_batch_to(batch, 8)
    assert n == 3
    assert padded["x"].shape == (8,)
    assert float(padded["x"][-1]) == 2.0
