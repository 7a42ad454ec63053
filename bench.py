#!/usr/bin/env python3
"""Benchmark: batched k-mer probe throughput on one chip.

Builds a deterministic synthetic DB (default 8M k-mers), generates reads
half-composed of DB k-mers, and times the jitted device probe pipeline
(encode -> canonical k-mers -> dedup -> GC stats -> two-level index probe).

Prints ONE json line:
  {"metric": "kmer_lookups_per_sec", "value": N, "unit": "lookups/s",
   "vs_baseline": N / 4.2e5}

Baseline: the reference processes ~4.2e5 k-mer positions/s on its bundled
example (8 OpenMP threads; BASELINE.md row 1).
"""

import json
import os
import sys
import time

import numpy as np

K = 20
N_KMERS = int(os.environ.get("BENCH_KMERS", 8_000_000))
B = int(os.environ.get("BENCH_BATCH", 512))
L = int(os.environ.get("BENCH_READLEN", 200))
MAX_TIDS = 8
BASELINE_LOOKUPS_PER_SEC = 4.2e5


def build_synthetic_index():
    from lmat_tpu.core.index import KmerIndex

    rng = np.random.default_rng(12345)
    kmers = np.unique(rng.integers(0, 1 << (2 * K), size=N_KMERS, dtype=np.uint64))
    # ragged taxid lists, 1..MAX_TIDS entries (zipf-ish: mostly singletons)
    lens = np.minimum(rng.geometric(0.6, size=kmers.shape[0]), MAX_TIDS)
    total = int(lens.sum())
    tid_flat = rng.integers(1, 400_000, size=total, dtype=np.uint32)
    tid_start = np.zeros(kmers.shape[0] + 1, np.int64)
    tid_start[1:] = np.cumsum(lens)
    idx = KmerIndex(
        k=K,
        bucket_start=None,
        suffix=None,
        tid_start=tid_start,
        tid_flat=tid_flat,
        ng=lens.astype(np.uint16),
        max_tids=MAX_TIDS,
        search_depth=1,
    )
    # pack via the standard builder path (sorted arrays)
    n_buckets = 1 << (2 * K - 20)
    bucket = (kmers >> np.uint64(20)).astype(np.int64)
    bucket_start = np.zeros(n_buckets + 1, np.int64)
    np.add.at(bucket_start, bucket + 1, 1)
    idx.bucket_start = np.cumsum(bucket_start).astype(np.int32)
    idx.suffix = (kmers & np.uint64((1 << 20) - 1)).astype(np.uint32)
    max_bucket = int(np.max(np.diff(idx.bucket_start)))
    idx.search_depth = max(1, int(np.ceil(np.log2(max_bucket + 1))))
    return idx, kmers


def make_reads(kmers, rng):
    """Reads whose 20-mers sometimes hit the DB: embed DB k-mers as seed
    sequence, mutate lightly."""
    from lmat_tpu.core.encoding import pack64  # noqa: F401

    bases = np.frombuffer(b"ACGT", np.uint8)
    batch = rng.choice(bases, size=(B, L))
    # overwrite half the reads with decoded db k-mers tiled
    picks = rng.choice(kmers.shape[0], size=(B // 2, L // K + 1))
    for i in range(B // 2):
        seq = []
        for j in picks[i]:
            km = int(kmers[j])
            s = [(km >> (2 * (K - 1 - t))) & 3 for t in range(K)]
            seq.extend(s)
        arr = np.array(seq[:L], np.uint8)
        batch[i] = bases[arr]
    return batch


def main():
    t_setup = time.time()
    import jax

    idx, kmers = build_synthetic_index()
    rng = np.random.default_rng(99)
    batch = make_reads(kmers, rng)

    from lmat_tpu.apps.read_label_device import DevicePipeline

    pipe = DevicePipeline(idx.to_device(), k=K)
    batch = jax.device_put(batch)
    out = pipe(batch)
    jax.block_until_ready(out["found"])  # compile + warm
    n_queries = B * (L - K + 1)

    reps = 20
    t0 = time.time()
    for _ in range(reps):
        out = pipe(batch)
    jax.block_until_ready(out["found"])
    dt = (time.time() - t0) / reps
    lookups_per_sec = n_queries / dt

    print(
        json.dumps(
            {
                "metric": "kmer_lookups_per_sec",
                "value": round(lookups_per_sec, 1),
                "unit": "lookups/s",
                "vs_baseline": round(lookups_per_sec / BASELINE_LOOKUPS_PER_SEC, 2),
            }
        )
    )
    print(
        f"# setup {time.time() - t_setup:.1f}s; {n_queries} queries/batch, "
        f"{dt * 1e3:.2f} ms/batch; db {idx.n_kmers} kmers, "
        f"search_depth {idx.search_depth}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
