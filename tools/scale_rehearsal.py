#!/usr/bin/env python3
"""Scale rehearsal: build and probe a >=100M-kmer index on one real chip.

VERDICT r1 item 5: the windowed arena existed but had never been exercised
beyond 4M k-mers (the marker DB is 1.7e9, /root/reference/doc/lmat-doc.txt:464).
This script:

  1. builds a synthetic index of N k-mers (vectorized flat build, no Python
     per-k-mer objects) with a realistic list-length distribution,
  2. uploads it with the WINDOWED arena (the at-scale layout; dense rows
     would be N*(T+1)*4 bytes),
  3. measures probe throughput at B=2048 and spot-checks device lookups
     against the host reference implementation,
  4. prints a capacity table extrapolating to the 1.7B-kmer marker DB.

Usage: python tools/scale_rehearsal.py [--kmers 100000000] [--batches 5]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

K = 20
B = 2048
L = 200
MAX_TIDS = 8


def build(n_kmers: int):
    from lmat_tpu.core.index import KmerIndex

    rng = np.random.default_rng(4242)
    t0 = time.time()
    kmers = np.unique(
        rng.integers(0, 1 << (2 * K), size=n_kmers, dtype=np.uint64)
    )
    lens = np.minimum(rng.geometric(0.6, size=kmers.shape[0]), MAX_TIDS).astype(
        np.int64
    )
    total = int(lens.sum())
    tid_flat = rng.integers(2, 1 << 20, size=total, dtype=np.uint64).astype(
        np.uint32
    )
    idx = KmerIndex.build_flat(kmers, tid_flat, lens, k=K, max_tids=MAX_TIDS)
    print(
        f"built {idx.n_kmers:,} k-mers / {total:,} arena entries "
        f"in {time.time() - t0:.1f}s",
        file=sys.stderr,
    )
    return idx, kmers


def table_bytes(idx, dense):
    tables, mode = idx.packed_tables(dense_lists=dense)
    return {k: v.nbytes for k, v in tables.items()}, mode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kmers", type=int, default=100_000_000)
    ap.add_argument("--batches", type=int, default=5)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    idx, kmers = build(args.kmers)
    sizes, mode = table_bytes(idx, dense=False)
    hbm = sum(sizes.values())
    print(
        f"windowed tables: "
        + ", ".join(f"{k}={v / 1e9:.2f}GB" for k, v in sizes.items())
        + f"; total {hbm / 1e9:.2f} GB (arena mode {mode})",
        file=sys.stderr,
    )

    t0 = time.time()
    dev = idx.to_device(dense_lists=False)
    print(f"upload: {time.time() - t0:.1f}s", file=sys.stderr)

    # reads stitched from DB k-mers (every window after the first junction
    # misses; ~10 true hits per read — probe cost is per query either way)
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    from lmat_tpu.apps.read_label_device import pad_batch, prepare_reads, probe

    picks = rng.integers(0, idx.n_kmers, size=(B, L // K + 1))
    seqs = []
    for i in range(B):
        seq = []
        for j in picks[i]:
            km = int(kmers[j])
            seq.extend((km >> (2 * (K - 1 - t))) & 3 for t in range(K))
        seqs.append(bytes(bases[np.array(seq[:L], np.uint8)]).decode())
    batch = pad_batch(seqs, pad_to=L)

    def step(dev_index, arr):
        pr = probe(dev_index, prepare_reads(arr, K))
        # materialize everything the scorer would consume
        return (
            pr["found"].sum(),
            pr["ng"].astype(np.int32).sum(),
            pr["tids"].astype(np.uint32).max(),
            pr["tmask"].sum(),
        )

    jit_step = jax.jit(step)
    out = jax.block_until_ready(jit_step(dev, batch))
    t0 = time.time()
    for _ in range(args.batches):
        out = jax.block_until_ready(jit_step(dev, batch))
    dt = (time.time() - t0) / args.batches
    P = L - K + 1
    lookups_s = B * P / dt
    print(
        f"probe step {dt * 1e3:.1f} ms/batch = {lookups_s / 1e6:.2f}M lookups/s "
        f"({B / dt:,.0f} reads/s probe-bound); found={int(out[0])}",
        file=sys.stderr,
    )

    # spot-check correctness vs the host reference lookup
    from lmat_tpu.core.encoding import split64

    sample = rng.integers(0, idx.n_kmers, size=256)
    s_kmers = kmers[sample]
    hi, lo = split64(s_kmers)
    f, ng, tids, tmask = jax.device_get(
        jax.jit(dev.lookup)(hi, lo, np.ones(256, bool))
    )
    for i in range(256):
        got = idx.lookup_host(int(s_kmers[i]))
        assert got is not None and f[i], f"miss at {i}"
        assert int(ng[i]) == got[0]
        assert (tids[i][tmask[i]] == got[1]).all()
    print("256/256 device lookups match the host reference", file=sys.stderr)

    marker = 1_700_000_000
    scale = marker / idx.n_kmers
    print(json.dumps({
        "metric": "scale_rehearsal",
        "n_kmers": idx.n_kmers,
        "hbm_gb": round(hbm / 1e9, 2),
        "probe_ms_per_batch": round(dt * 1e3, 2),
        "lookups_per_sec_M": round(lookups_s / 1e6, 2),
        "marker_db_extrapolation": {
            "n_kmers": marker,
            "hbm_gb_total": round(hbm / 1e9 * scale, 1),
            "chips_v5e_16gb": int(np.ceil(hbm * scale / 12e9)),  # 12GB usable
        },
    }))


if __name__ == "__main__":
    main()
