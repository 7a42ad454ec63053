"""Sharded all-to-all lookup on a virtual 8-device CPU mesh must agree with
the single-device probe."""

import os

import numpy as np
import pytest

from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.core.encoding import split64
from lmat_tpu.parallel.mesh import make_mesh
from lmat_tpu.parallel.router import ShardedIndex, make_sharded_lookup

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


@pytest.fixture(scope="module")
def idx():
    return build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)


def _queries(idx, n_total, rng):
    n_buckets = idx.bucket_start.shape[0] - 1
    present = (idx.bucket_start[:-1] != idx.bucket_start[1:]).nonzero()[0]
    # half hits, half random
    hit_buckets = rng.choice(present, n_total // 2)
    kmers = []
    for b in hit_buckets:
        s, e = int(idx.bucket_start[b]), int(idx.bucket_start[b + 1])
        j = int(rng.integers(s, e))
        kmers.append((int(b) << 20) | int(idx.suffix[j]))
    kmers += [int(x) for x in rng.integers(0, 1 << 40, n_total - len(kmers))]
    return np.array(kmers, np.uint64)


@pytest.mark.parametrize("data,db", [(2, 4), (1, 8), (8, 1)])
def test_sharded_matches_host(idx, data, db):
    import jax

    if len(jax.devices()) < data * db:
        pytest.skip("not enough devices")
    mesh = make_mesh(data=data, db=db)
    sidx = ShardedIndex.from_index(idx, db)
    rng = np.random.default_rng(7)
    Q = 1024  # divisible by 8 devices
    kmers = _queries(idx, Q, rng)
    hi, lo = split64(kmers)
    valid = np.ones(Q, bool)
    fn = make_sharded_lookup(mesh, sidx, q_per_device=Q // (data * db))
    found, ng, tids, tmask, overflow = fn(hi, lo, valid)
    found, ng, tids, tmask = map(np.asarray, (found, ng, tids, tmask))
    assert int(overflow) == 0
    for i, km in enumerate(kmers):
        host = idx.lookup_host(int(km))
        if host is None:
            assert not found[i], f"query {i} false positive"
        else:
            assert found[i], f"query {i} missed"
            assert ng[i] == host[0]
            assert np.array_equal(tids[i][tmask[i]], host[1])


def test_overflow_reporting(idx):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    mesh = make_mesh(data=1, db=8)
    sidx = ShardedIndex.from_index(idx, 8)
    # all queries to one bucket -> one shard gets everything; tiny cap overflows
    Q = 1024
    b = int((idx.bucket_start[:-1] != idx.bucket_start[1:]).nonzero()[0][0])
    kmers = np.full(Q, (b << 20) | int(idx.suffix[idx.bucket_start[b]]), np.uint64)
    hi, lo = split64(kmers)
    fn = make_sharded_lookup(mesh, sidx, q_per_device=Q // 8, cap=4)
    *_, overflow = fn(hi, lo, np.ones(Q, bool))
    assert int(overflow) > 0
