"""Multi-host entry point (VERDICT round-4 missing #3 / SURVEY section 5.8):
single-process fake-multihost tests of the per-process data sharding, the
distributed initializer's single-process no-op, and the global-batch
assembly path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfswa_tpu.data.pipeline import DataLoader, prefetch_to_device
from tfswa_tpu.data.synthetic import SyntheticDataset
from tfswa_tpu.parallel import batch_sharding, create_mesh
from tfswa_tpu.parallel.distributed import (
    initialize_distributed,
    make_global_batch,
    process_info,
)


def _dataset(**kw):
    return SyntheticDataset(
        num_tracks=8, track_seconds=1.0, segment_seconds=0.25,
        sample_rate=4000, random_segments=True, seed=5, **kw,
    )


def test_initialize_distributed_single_process_noop():
    assert initialize_distributed() is False
    assert initialize_distributed(num_processes=1) is False
    assert process_info() == (0, 1)


def test_sharded_loaders_reassemble_global_batches():
    """Two fake processes' loaders must produce exactly the halves of the
    unsharded loader's global batches (same shuffle order, contiguous
    slices — the layout make_global_batch expects)."""
    full = DataLoader(_dataset(), batch_size=4, shuffle=True,
                      num_workers=0, seed=3)
    s0 = DataLoader(_dataset(), batch_size=4, shuffle=True,
                    num_workers=0, seed=3, num_shards=2, shard_index=0)
    s1 = DataLoader(_dataset(), batch_size=4, shuffle=True,
                    num_workers=0, seed=3, num_shards=2, shard_index=1)

    for (gm, gt), (m0, t0), (m1, t1) in zip(iter(full), iter(s0), iter(s1)):
        assert m0.shape[0] == 2 and m1.shape[0] == 2
        np.testing.assert_array_equal(np.concatenate([m0, m1]), gm)
        for k in gt:
            np.testing.assert_array_equal(
                np.concatenate([t0[k], t1[k]]), gt[k]
            )


def test_shard_batch_size_must_divide():
    with pytest.raises(ValueError):
        DataLoader(_dataset(), batch_size=5, num_shards=2)


def test_make_global_batch_single_process_matches_device_put():
    mesh = create_mesh(shape=(4, 1), devices=jax.devices()[:4])
    sharding = batch_sharding(mesh)
    local = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    global_arr = make_global_batch(local, sharding)["x"]
    want = jax.device_put(jnp.asarray(local["x"]), sharding)
    np.testing.assert_array_equal(np.asarray(global_arr), np.asarray(want))
    assert global_arr.sharding == sharding


def test_prefetch_assembles_sharded_batches():
    mesh = create_mesh(shape=(2, 1), devices=jax.devices()[:2])
    sharding = batch_sharding(mesh)
    loader = DataLoader(_dataset(), batch_size=4, shuffle=False,
                        num_workers=0)
    batches = list(prefetch_to_device(iter(loader), size=1,
                                      sharding=sharding))
    assert batches
    mix, _ = batches[0]
    assert mix.sharding == sharding
