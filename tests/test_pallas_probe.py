"""Pallas probe kernel (interpret mode on CPU) vs host lookups."""

import os

import numpy as np
import pytest

from lmat_tpu.apps.make_db import build_from_tax_histo
from lmat_tpu.core.encoding import split64
from lmat_tpu.kernels.probe import make_pallas_probe

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small")


def test_pallas_probe_interpret():
    import jax.numpy as jnp

    idx = build_from_tax_histo(FIX + "/work/taxhisto.bin", k=20, max_tids=8)
    max_bucket = int(np.max(np.diff(idx.bucket_start)))
    fn = make_pallas_probe(
        jnp.asarray(idx.bucket_start), jnp.asarray(idx.suffix),
        max_bucket, q_tile=256, pipe=4, interpret=True,
    )
    rng = np.random.default_rng(5)
    # half hits, half misses
    n = 300
    present = (idx.bucket_start[:-1] != idx.bucket_start[1:]).nonzero()[0]
    queries = []
    for b in rng.choice(present, n // 2):
        s, e = int(idx.bucket_start[b]), int(idx.bucket_start[b + 1])
        j = int(rng.integers(s, e))
        queries.append((int(b) << 20) | int(idx.suffix[j]))
    queries += [int(x) for x in rng.integers(0, 1 << 40, n - len(queries))]
    kmers = np.array(queries, np.uint64)
    hi, lo = split64(kmers)
    found, pos = fn(jnp.asarray(hi), jnp.asarray(lo), jnp.ones(n, bool))
    found = np.asarray(found)
    pos = np.asarray(pos)
    for i, km in enumerate(kmers):
        host = idx.lookup_host(int(km))
        if host is None:
            assert not found[i], f"query {i}: false positive"
        else:
            assert found[i], f"query {i}: missed"
            p = int(pos[i])
            ts, te = int(idx.tid_start[p]), int(idx.tid_start[p + 1])
            assert np.array_equal(idx.tid_flat[ts:te], host[1])
