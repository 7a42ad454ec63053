#!/usr/bin/env python3
"""Scale rehearsal: capacity-scale index layouts at >=100M k-mers on a chip.

The production marker DB is 1.7e9 k-mers (reference doc/lmat-doc.txt:464);
round 1/2 benches only ever instantiated 4M.  This tool builds a synthetic
index at SCALE_KMERS (default 1e8) k-mers, uploads BOTH capacity layouts
(windowed = minimum memory; paged = the round-4 2-gather speed tier), and
records for each:

  - host + device memory footprint (measured, not estimated)
  - device probe throughput (lookups/s) at that scale, timed with the
    scan-inside-jit method (NOTES.md: per-call RPC latency would otherwise
    dominate)
  - bit-exact agreement of a device-probe sample vs the host lookup oracle
  - a capacity extrapolation to the 1.7B-k-mer marker DB

Run:  python tools/scale_rehearsal.py            (real TPU via axon)
      SCALE_KMERS=20000000 python tools/scale_rehearsal.py
Writes a JSON report to stdout (one line) + human detail on stderr.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = 20
N = int(float(os.environ.get("SCALE_KMERS", 1e8)))
MAX_TIDS = int(os.environ.get("SCALE_MAX_TIDS", 8))
Q = int(os.environ.get("SCALE_QUERIES", 1 << 19))
ITERS = int(os.environ.get("SCALE_ITERS", 10))
MARKER_DB_KMERS = 1_697_066_355  # doc/lmat-doc.txt:464


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_synthetic(n):
    """Vectorized synthetic index: n unique k-mers, geometric list lengths
    capped at MAX_TIDS, taxids drawn from a 2^20 id space."""
    from lmat_tpu.core.index import KmerIndex

    rng = np.random.default_rng(4242)
    t0 = time.time()
    # draw ~5% extra to survive the unique() collapse at this density
    kmers = np.unique(
        rng.integers(0, 1 << (2 * K), size=int(n * 1.05), dtype=np.uint64)
    )[:n]
    lens = np.minimum(rng.geometric(0.6, size=kmers.shape[0]), MAX_TIDS).astype(
        np.int64
    )
    total = int(lens.sum())
    tid_flat = rng.integers(2, 1 << 20, size=total, dtype=np.int64).astype(np.uint32)
    idx = KmerIndex.build_flat(kmers, tid_flat, lens, k=K, max_tids=MAX_TIDS)
    log(
        f"build: {idx.n_kmers:,} kmers, {total:,} taxid entries in "
        f"{time.time() - t0:.1f}s (host)"
    )
    return idx, kmers


def main():
    import jax

    if os.environ.get("SCALE_PLATFORM"):
        # the axon env force-prepends a TPU plugin over JAX_PLATFORMS; an
        # in-process config update before first device use still wins
        jax.config.update("jax_platforms", os.environ["SCALE_PLATFORM"])
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    idx, kmers = build_synthetic(N)

    # ---- host-side table sizes (the windowed layout the device will hold)
    tables, arena_mode = idx.packed_tables(dense_lists=False)
    sizes = {name: int(t.nbytes) for name, t in tables.items()}
    host_total = sum(sizes.values())
    log(
        "packed tables (windowed arena): "
        + ", ".join(f"{k}={v / 1e9:.3f} GB" for k, v in sizes.items())
        + f"; total {host_total / 1e9:.3f} GB = "
        f"{host_total / idx.n_kmers:.1f} B/kmer"
    )

    dev = jax.devices()[0]
    t0 = time.time()
    dix = idx.to_device(layout="window", dense_lists=False)
    jax.block_until_ready(dix.arena)
    t_up = time.time() - t0
    t0 = time.time()
    dixp = idx.to_device(layout="paged")
    jax.block_until_ready(dixp.paged_pages)
    t_up_paged = time.time() - t0
    stats1 = dev.memory_stats() or {}
    hbm_cap = stats1.get("bytes_limit", 0)

    def dev_bytes(d):
        return sum(
            getattr(t, "nbytes", 0)
            for t in (d.bucket_tab, d.suffix_over, d.rec, d.arena,
                      d.paged_tab, d.paged_pages)
            if t is not None
        )

    hbm_used = dev_bytes(dix)
    hbm_paged = dev_bytes(dixp)
    log(
        f"upload: windowed {hbm_used / 1e9:.3f} GB in {t_up:.1f}s; paged "
        f"{hbm_paged / 1e9:.3f} GB (P={dixp.arena_mode[1]}, "
        f"e={dixp.arena_mode[2]}) in {t_up_paged:.1f}s "
        f"(reported limit {hbm_cap / 1e9:.1f} GB)"
    )

    # ---- correctness sample: device probe vs host oracle, hits and misses
    from lmat_tpu.core.encoding import split64

    rng = np.random.default_rng(77)
    n_s = 4096
    sample = np.concatenate(
        [
            kmers[rng.integers(0, idx.n_kmers, size=n_s // 2)],
            rng.integers(0, 1 << (2 * K), size=n_s // 2, dtype=np.uint64),
        ]
    )
    hi, lo = split64(sample)
    # pass the DeviceIndex as a pytree ARGUMENT: jitting the bound method
    # would capture the multi-GB tables as HLO constants
    lookup = jax.jit(lambda d, h, l, v: d.lookup(h, l, v))
    for name, d in (("windowed", dix), ("paged", dixp)):
        f, ng, tids, tmask = lookup(
            d, jnp.asarray(hi), jnp.asarray(lo), jnp.ones(n_s, bool)
        )
        f, ng, tids, tmask = map(np.asarray, (f, ng, tids, tmask))
        n_bad = 0
        for i in range(n_s):
            want = idx.lookup_host(int(sample[i]))
            if want is None:
                n_bad += bool(f[i])
                continue
            wng, wtids = want
            got = np.sort(tids[i][tmask[i]])
            ok = f[i] and ng[i] == wng and got.shape == wtids.shape and (
                got == np.sort(wtids)
            ).all()
            n_bad += not ok
        log(f"correctness sample [{name}]: {n_s - n_bad}/{n_s} device "
            "lookups match host oracle")
        assert n_bad == 0, f"{name}: {n_bad} mismatches"

    # ---- probe throughput at scale
    qk = np.concatenate(
        [
            kmers[rng.integers(0, idx.n_kmers, size=(Q + ITERS) // 2)],
            rng.integers(0, 1 << (2 * K), size=(Q + ITERS) - (Q + ITERS) // 2,
                         dtype=np.uint64),
        ]
    )
    rng.shuffle(qk)
    qhi, qlo = split64(qk)
    qhi, qlo = jnp.asarray(qhi), jnp.asarray(qlo)

    from jax import lax

    @jax.jit
    def probe_scan(d, h, l, seed):
        # ITERS shifted query windows inside ONE jit: per-call RPC latency
        # (~25-40ms on the axon tunnel) cannot pollute the per-iter time,
        # and the full reduction defeats DCE.  The seed makes every timed
        # call's arguments distinct: the axon runtime MEMOIZES identical
        # executions and would otherwise serve cached results
        # (NOTES.md r4 measurement pitfall).
        def body(c, i):
            hh = lax.dynamic_slice(h, (i,), (Q,))
            ll = lax.dynamic_slice(l, (i,), (Q,))
            found, ngv, tids_, tmask_ = d.lookup(hh, ll, jnp.ones(Q, bool))
            return (c + found.sum().astype(jnp.int32) + ngv.sum()
                    + tids_.astype(jnp.uint32).sum().astype(jnp.int32)
                    + tmask_.sum(), 0)
        c, _ = lax.scan(body, seed, jnp.arange(ITERS))
        return c

    rates = {}
    for name, d in (("windowed", dix), ("paged", dixp)):
        int(probe_scan(d, qhi, qlo, jnp.int32(0)))
        reps = 3
        t0 = time.time()
        outs = [probe_scan(d, qhi, qlo, jnp.int32(i + 1)) for i in range(reps)]
        # VALUE fetch as the barrier: block_until_ready can resolve before
        # remote execution completes (NOTES.md round-5 pitfall)
        _ = [int(o) for o in outs]
        dt = (time.time() - t0) / reps / ITERS
        rates[name] = Q / dt
        log(
            f"probe [{name}]: {Q:,} lookups in {dt * 1e3:.2f} ms/iter = "
            f"{rates[name] / 1e6:.2f}M lookups/s"
        )
    lps = rates["paged"]

    # ---- capacity extrapolation to the 1.7B marker DB, per tier
    usable = (hbm_cap or 16e9) * 0.9  # leave headroom for batch + scorer
    bytes_per_kmer = host_total / idx.n_kmers
    bpk_paged = hbm_paged / idx.n_kmers
    marker_bytes = bytes_per_kmer * MARKER_DB_KMERS
    marker_paged = bpk_paged * MARKER_DB_KMERS
    chips = int(np.ceil(marker_bytes / usable))
    chips_paged = int(np.ceil(marker_paged / usable))
    # projected per-chip classification rate at marker-DB scale: probe-bound
    # reads/s for ~170 queries/read (200bp, within-read dedup)
    qs_per_read = 170
    log(
        f"capacity: windowed {bytes_per_kmer:.1f} B/kmer -> "
        f"{marker_bytes / 1e9:.0f} GB -> {chips} chips; paged "
        f"{bpk_paged:.1f} B/kmer -> {marker_paged / 1e9:.0f} GB -> "
        f"{chips_paged} chips of {usable / 1e9:.1f} GB usable HBM "
        f"(prefix-sharded via parallel/router.py); paged probe-bound "
        f"~{rates['paged'] / qs_per_read / 1e3:.0f}k reads/s/chip"
    )

    print(
        json.dumps(
            {
                "metric": "scale_rehearsal",
                "n_kmers": idx.n_kmers,
                "host_table_gb": round(host_total / 1e9, 3),
                "bytes_per_kmer": round(bytes_per_kmer, 2),
                "device_hbm_gb": round(hbm_used / 1e9, 3),
                "upload_s": round(t_up, 1),
                "probe_mlookups_per_s": round(lps / 1e6, 2),
                "probe_windowed_mlps": round(rates["windowed"] / 1e6, 2),
                "paged_gb": round(hbm_paged / 1e9, 3),
                "paged_bytes_per_kmer": round(bpk_paged, 2),
                "paged_reads_per_s_per_chip_at_marker": int(
                    rates["paged"] / qs_per_read
                ),
                "sample_exact": True,
                "marker_db_gb": round(marker_bytes / 1e9, 1),
                "marker_db_chips": chips,
                "marker_db_gb_paged": round(marker_paged / 1e9, 1),
                "marker_db_chips_paged": chips_paged,
            }
        )
    )


if __name__ == "__main__":
    main()
