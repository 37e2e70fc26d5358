"""Mesh/ZeRO sharding helpers, profiling utils, staged checkpoint hand-off."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mmor_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    zero_sharding,
)


def test_make_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh_all = make_mesh()
    assert mesh_all.shape["data"] == len(jax.devices())


def test_shard_and_replicate():
    mesh = make_mesh(n_data=8)
    batch = {"x": jnp.arange(16.0).reshape(16, 1)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.spec == P("data")
    params = {"w": jnp.ones((4, 4))}
    rep = replicate(mesh, params)
    assert rep["w"].sharding.spec == P()


def test_zero_sharding_picks_divisible_axis():
    mesh = make_mesh(n_data=8)
    tree = {
        "big": jnp.zeros((16, 3)),  # 16 % 8 == 0 -> shard axis 0
        "odd": jnp.zeros((3, 5)),  # nothing divides -> replicate
        "scalar": jnp.zeros(()),
    }
    specs = zero_sharding(mesh, tree)
    assert specs["big"].spec == P("data", None)
    assert specs["odd"].spec == P()
    assert specs["scalar"].spec == P()
    # actually place the optimizer-like state
    placed = jax.tree.map(jax.device_put, tree, specs)
    np.testing.assert_array_equal(np.asarray(placed["big"]), np.zeros((16, 3)))


def test_throughput_meter_and_memory_stats():
    import time

    from mmor_tpu.utils.profiling import ThroughputMeter, device_memory_stats

    meter = ThroughputMeter(warmup=1)
    for _ in range(4):
        meter.mark(2)
        time.sleep(0.01)
    assert meter.rate > 0
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_staged_checkpoint_handoff(tmp_path):
    """Stage 1's full-state checkpoint initializes stage 2 (--init_from)."""
    from mmor_tpu.cli.train_panoptic import main

    main(["--synthetic", "--tiny", "--steps", "1", "--frames", "2",
          "--save_every", "1", "--run_dir", str(tmp_path / "s1"),
          "--stage", "ctvis"])
    assert (tmp_path / "s1" / "checkpoint-1" / "state").exists()
    main(["--synthetic", "--tiny", "--steps", "1", "--frames", "2",
          "--save_every", "1", "--run_dir", str(tmp_path / "s2"),
          "--init_from", str(tmp_path / "s1"), "--stage", "online"])
    assert (tmp_path / "s2" / "checkpoint-1" / "state").exists()
