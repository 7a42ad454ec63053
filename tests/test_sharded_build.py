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
