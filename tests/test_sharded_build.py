"""Prefix-sharded DB build produces the same index as the single-shot build,
and both agree with the oracle's tax_histo content (sets)."""

import os

import numpy as np

from lmat_tpu.apps.make_db import build_native, build_sharded
from lmat_tpu.core.taxonomy import Taxonomy
from lmat_tpu.io import formats

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


def test_sharded_equals_single(tmp_path):
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    single = build_native(FIX + "/genomes.fa", tax, k=20, max_tids=9)
    sharded = build_sharded(
        FIX + "/genomes.fa", tax, k=20, n_shards_log4=1,
        out_dir=str(tmp_path), max_tids=9,
    )
    assert single.n_kmers == sharded.n_kmers
    assert np.array_equal(single.suffix, sharded.suffix)
    assert np.array_equal(single.bucket_start, sharded.bucket_start)
    assert np.array_equal(single.tid_flat, sharded.tid_flat)


def test_native_build_matches_oracle_sets():
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    mine = build_native(FIX + "/genomes.fa", tax, k=20, max_tids=9)
    oracle = {
        kmer: frozenset(int(t) for t in tids)
        for kmer, tids in formats.read_tax_histo(FIX + "/work/taxhisto.bin")
    }
    assert mine.n_kmers == len(oracle)
    # spot-check content equality of the LCA-closure sets
    rng = np.random.default_rng(1)
    kmers = sorted(oracle)
    for i in rng.choice(len(kmers), 300, replace=False):
        km = kmers[i]
        got = mine.lookup_host(km)
        assert got is not None
        assert frozenset(int(t) for t in got[1]) == oracle[km], hex(km)


def test_lca_closure_batch_matches_scalar():
    """The vectorized closure must match the per-k-mer reference logic on
    random tid sets over the fixture taxonomy."""
    import numpy as np

    from lmat_tpu.apps.make_db import lca_closure, lca_closure_batch
    from lmat_tpu.core.taxonomy import Taxonomy

    FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")
    tax = Taxonomy.from_lmat_file(FIX + "/taxtree.dat")
    all_tids = sorted(tax.parent)
    rng = np.random.default_rng(17)
    K, T = [], []
    expected = {}
    for km in range(300):
        size = int(rng.integers(1, 7))
        tids = list(rng.choice(all_tids, size=size, replace=False))
        if km % 7 == 0:
            tids.append(999999999)  # unknown tid: dropped like the reference
        expected[km] = lca_closure(tax, set(tids))
        for t in tids:
            K.append(km)
            T.append(t)
    K = np.asarray(K, np.uint64)
    T = np.asarray(T, np.uint32)
    got = {}
    for uk, closures in lca_closure_batch(tax, K, T, chunk_pairs=97):
        for km, cl in zip(uk, closures):
            got[int(km)] = cl.tolist()
    for km, exp in expected.items():
        if not exp:
            assert km not in got or got[km] == []
        else:
            assert got[km] == exp, f"kmer {km}: {got.get(km)} != {exp}"
