"""Sharded all-to-all router at non-fixture scale (VERDICT r3 #4).

The fixture-based router tests probe a few thousand k-mers; this one runs
1M k-mers PER SHARD x 8 shards (8M total) with the windowed-arena layout
forced — the configuration the production marker DB actually needs
(dense lists no longer fit, uint32 arena offsets, deep buckets) — and
checks the routed result agrees with the host oracle on a mixed hit/miss
sample, plus the cap-headroom concentration claim the router's overflow
sizing relies on (router.py docstring: prefix buckets are hash-uniform).

Reference parity anchor: the reference runs one whole-DB mmap per MPI rank
(/root/reference/src/read_label.cpp main loop); the sharded router is the
TPU-native replacement (SURVEY.md §2.3 all-to-all row).
"""

import numpy as np
import pytest

from lmat_tpu.core.encoding import split64
from lmat_tpu.core.index import KmerIndex
from lmat_tpu.parallel.mesh import make_mesh
from lmat_tpu.parallel.router import ShardedIndex, make_sharded_lookup

K = 20
N_KMERS = 8_000_000
MAX_TIDS = 8


@pytest.fixture(scope="module")
def big_idx():
    rng = np.random.default_rng(4040)
    kmers = np.unique(
        rng.integers(0, 1 << (2 * K), size=int(N_KMERS * 1.05), dtype=np.uint64)
    )[:N_KMERS]
    lens = np.minimum(rng.geometric(0.6, size=kmers.shape[0]), MAX_TIDS).astype(
        np.int64
    )
    tid_flat = rng.integers(2, 1 << 20, size=int(lens.sum()), dtype=np.int64).astype(
        np.uint32
    )
    return KmerIndex.build_flat(kmers, tid_flat, lens, k=K, max_tids=MAX_TIDS), kmers


def test_router_scale_windowed(big_idx):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    idx, kmers = big_idx
    mesh = make_mesh(data=1, db=8)
    # force the windowed (capacity) arena — the >=10M-kmers-per-shard regime
    sidx = ShardedIndex.from_index(idx, 8, dense_lists=False)
    assert sidx.arena_mode[0] == "window", sidx.arena_mode

    rng = np.random.default_rng(11)
    Q = 16384
    qk = np.concatenate(
        [
            kmers[rng.integers(0, idx.n_kmers, Q // 2)],
            rng.integers(0, 1 << (2 * K), Q - Q // 2, dtype=np.uint64),
        ]
    )
    rng.shuffle(qk)
    hi, lo = split64(qk)
    fn = make_sharded_lookup(mesh, sidx, q_per_device=Q // 8)
    found, ng, tids, tmask, overflow = fn(hi, lo, np.ones(Q, bool))
    found, ng, tids, tmask = map(np.asarray, (found, ng, tids, tmask))
    assert int(overflow) == 0

    sample = rng.integers(0, Q, 512)
    for i in sample:
        host = idx.lookup_host(int(qk[i]))
        if host is None:
            assert not found[i]
        else:
            assert found[i]
            assert ng[i] == host[0]
            assert np.array_equal(tids[i][tmask[i]], host[1])


def test_router_cap_concentration(big_idx):
    """Per-shard query-group sizes concentrate near Q/S for uniform k-mer
    queries: a cap of 2x the mean must leave zero overflow across many
    random batches (this is the sizing rule callers rely on)."""
    idx, kmers = big_idx
    S = 8
    n_buckets = idx.bucket_start.shape[0] - 1
    per = n_buckets // S
    rng = np.random.default_rng(5)
    worst = 0
    Q = 4096
    for _ in range(20):
        qk = kmers[rng.integers(0, idx.n_kmers, Q)]
        owner = (qk >> np.uint64(2 * K - 20)).astype(np.int64) // per
        worst = max(worst, int(np.bincount(owner, minlength=S).max()))
    assert worst <= 2 * (Q // S), worst


def test_router_scale_paged(big_idx):
    """The paged per-shard layout through the full all-to-all router must
    agree with the host oracle (the speed-tier configuration for
    capacity-scale DBs: VERDICT r4, 2-gather shard probe)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    idx, kmers = big_idx
    mesh = make_mesh(data=2, db=4)
    sidx = ShardedIndex.from_index(idx, 4, layout="paged")
    assert sidx.arena_mode[0] == "paged"

    rng = np.random.default_rng(12)
    Q = 8192
    qk = np.concatenate(
        [
            kmers[rng.integers(0, idx.n_kmers, Q // 2)],
            rng.integers(0, 1 << (2 * K), Q - Q // 2, dtype=np.uint64),
        ]
    )
    rng.shuffle(qk)
    hi, lo = split64(qk)
    fn = make_sharded_lookup(mesh, sidx, q_per_device=Q // 8)
    found, ng, tids, tmask, overflow = fn(hi, lo, np.ones(Q, bool))
    found, ng, tids, tmask = map(np.asarray, (found, ng, tids, tmask))
    assert int(overflow) == 0

    sample = rng.integers(0, Q, 512)
    for i in sample:
        host = idx.lookup_host(int(qk[i]))
        if host is None:
            assert not found[i]
        else:
            assert found[i]
            assert ng[i] == host[0]
            assert np.array_equal(tids[i][tmask[i]], host[1])
