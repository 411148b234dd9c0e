"""parallel/distributed.py: multi-host batch-slicing math (VERDICT r1 #10).

`jax.distributed.initialize` needs real peers, so these tests exercise the
slicing logic against mocked process topology — the part a misconfigured
deployment actually gets wrong."""

from unittest import mock

import numpy as np
import pytest

import firewheel_tpu.parallel.distributed as dist


def _slices(global_batch, nproc):
    out = []
    with mock.patch.object(dist.jax, "process_count", return_value=nproc):
        for rank in range(nproc):
            with mock.patch.object(
                dist.jax, "process_index", return_value=rank
            ):
                out.append(dist.local_batch_slice(global_batch))
    return out

def test_slices_partition_the_batch():
    for nproc in (1, 2, 4, 8):
        for global_batch in (nproc, 4 * nproc, 64):
            if global_batch % nproc:
                continue
            slices = _slices(global_batch, nproc)
            covered = np.zeros(global_batch, bool)
            for s in slices:
                assert not covered[s].any(), "overlapping host slices"
                covered[s] = True
            assert covered.all(), "hosts did not cover the global batch"


def test_slices_are_contiguous_rank_ordered():
    slices = _slices(32, 4)
    assert slices == [
        slice(0, 8), slice(8, 16), slice(16, 24), slice(24, 32)
    ]


def test_slice_feeds_host_local_shard():
    # the documented usage: each host slices its own rows out of the
    # global batch of per-instance params
    global_params = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    slices = _slices(16, 4)
    shards = [global_params[s] for s in slices]
    assert all(sh.shape == (4, 3) for sh in shards)
    np.testing.assert_array_equal(np.concatenate(shards), global_params)


def test_single_process_is_identity():
    (s,) = _slices(8, 1)
    assert s == slice(0, 8)


def test_initialize_multihost_forwards_args():
    with mock.patch.object(dist.jax.distributed, "initialize") as ini:
        dist.initialize_multihost("10.0.0.1:1234", 4, 2, local_device_ids=[0])
        ini.assert_called_once_with(
            coordinator_address="10.0.0.1:1234",
            num_processes=4,
            process_id=2,
            local_device_ids=[0],
        )
