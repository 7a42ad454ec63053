#!/usr/bin/env python3
"""Benchmark: end-to-end fast-mode classification throughput on one chip.

Builds a deterministic synthetic DB + taxonomy, synthesizes reads (half with
DB hits), runs the full jitted pipeline (encode -> canonical k-mers -> dedup
-> GC -> two-level probe -> device scorer) plus host line formatting, and
reports reads/s.

Prints ONE json line:
  {"metric": "reads_per_sec_e2e", "value": N, "unit": "reads/s",
   "vs_baseline": N / 2317}

Baseline: the reference classifies 2317 reads/s on its bundled example
(8 OpenMP threads, BASELINE.md row 1).

Measurement integrity (round 5): the runtime memoizes identical executions
(NOTES.md round-4 pitfall), so repeating the SAME batches for a best-of pass
can return in ~0.1 ms/batch and fake the number.  Every timed pass here runs
its own DISTINCT batches (BENCH_PASSES, default 3); all passes are honest
and best-of only absorbs tunnel-congestion variance (the shared link swings
2-3x between windows).  Set BENCH_REPLAY=1 to add a diagnostic pass that
replays pass 1's batches verbatim (quantifies memoization inflation — not
used for the metric).
"""

import json
import os
import sys
import time

import numpy as np

K = 20
N_KMERS = int(os.environ.get("BENCH_KMERS", 4_000_000))
N_TAXA_LEAF = int(os.environ.get("BENCH_TAXA", 20_000))
B = int(os.environ.get("BENCH_BATCH", 2048))
L = int(os.environ.get("BENCH_READLEN", 200))
N_BATCHES = int(os.environ.get("BENCH_BATCHES", 20))
MAX_TIDS = 8
BASELINE_READS_PER_SEC = 2317.0
# workload: "mixed" = half random / half clade reads (the round-1 metric,
# low cross-read duplication); "coverage" = reads sampled from a few organism
# genomes at sequencing coverage (the realistic regime the reference's own
# example models: deep reads over 3 organisms) — enables cross-read dedup
WORKLOAD = os.environ.get("BENCH_WORKLOAD", "mixed")
N_ORGS = int(os.environ.get("BENCH_ORGS", 10))
# cross-read dedup default: OFF for every workload (round-5 measured
# result, BENCH_COVERAGE_r05.json).  Same-window A/B at coverage: dedup
# 0.25 = 46.0k reads/s vs OFF = 79.7k — the dedup probe's 3 extra sorts
# now cost more than the fused-layout probe saves (the earlier +29%
# sweep result compared runs from different tunnel-congestion windows).
# Dedup remains available (BENCH_DEDUP / read-label --dedup) for the
# regime it still wins: capacity-scale DBs where the probe itself is the
# dominant cost (29.5M lookups/s paged tier vs ~65M dedup-sort rate).
DEDUP = float(os.environ.get("BENCH_DEDUP", 0) or 0)


def build_taxonomy():
    """Synthetic 4-level taxonomy: root -> 100 genera -> species -> strains."""
    from lmat_tpu.core.taxonomy import Taxonomy

    parent, names, children = {1: 1}, {1: "root"}, {1: set()}

    def add(tid, par, name):
        parent[tid] = par
        names[tid] = name
        children[tid] = set()
        children[par].add(tid)

    rng = np.random.default_rng(7)
    leaves = []
    tid = 2
    for g in range(100):
        gid = tid; tid += 1
        add(gid, 1, f"genus{g}")
        for s in range(10):
            sid = tid; tid += 1
            add(sid, gid, f"species{g}.{s}")
            n_strains = max(1, N_TAXA_LEAF // 1000)
            for st in range(n_strains):
                lid = tid; tid += 1
                add(lid, sid, f"strain{g}.{s}.{st}")
                leaves.append(lid)
    tax = Taxonomy(parent, names, children)
    for t in parent:
        d = len(tax.path_to_root(t))
        tax.depth[t] = d
        tax.rank[t] = "no_rank" if d == 0 else ["genus", "species", "strain"][d - 1]
    return tax, np.array(leaves)


def build_index(tax, leaves):
    from lmat_tpu.core.index import KmerIndex

    rng = np.random.default_rng(12345)
    kmers = np.unique(rng.integers(0, 1 << (2 * K), size=N_KMERS, dtype=np.uint64))
    lens = np.minimum(rng.geometric(0.6, size=kmers.shape[0]), MAX_TIDS)
    total = int(lens.sum())
    # realistic LCA-collapsed lists: the tids of one k-mer come from a single
    # species clade (random leaves would explode candidate sets)
    n_species = leaves.shape[0] // max(1, N_TAXA_LEAF // 1000)
    strains_per = max(1, N_TAXA_LEAF // 1000)
    species_of = rng.integers(0, n_species, size=kmers.shape[0])
    offs = rng.integers(0, strains_per, size=total)
    rep = np.repeat(species_of, lens)
    tid_flat = leaves[(rep * strains_per + offs) % leaves.shape[0]].astype(np.uint32)
    tid_start = np.zeros(kmers.shape[0] + 1, np.int64)
    tid_start[1:] = np.cumsum(lens)
    idx = KmerIndex(
        k=K, bucket_start=None, suffix=None, tid_start=tid_start,
        tid_flat=tid_flat, ng=lens.astype(np.uint16), max_tids=MAX_TIDS,
        search_depth=1,
    )
    n_buckets = 1 << (2 * K - 20)
    bucket = (kmers >> np.uint64(20)).astype(np.int64)
    bs = np.zeros(n_buckets + 1, np.int64)
    np.add.at(bs, bucket + 1, 1)
    idx.bucket_start = np.cumsum(bs).astype(np.int32)
    idx.suffix = (kmers & np.uint64((1 << 20) - 1)).astype(np.uint32)
    idx.search_depth = max(1, int(np.ceil(np.log2(int(np.max(np.diff(idx.bucket_start))) + 1))))
    # group k-mer indices by species so bench reads stay clade-coherent
    order = np.argsort(species_of, kind="stable")
    bounds = np.searchsorted(species_of[order], np.arange(n_species + 1))
    return idx, kmers, (order, bounds)


def make_reads(kmers, groups, rng, n):
    order, bounds = groups
    n_species = bounds.shape[0] - 1
    bases = np.frombuffer(b"ACGT", np.uint8)
    batch = rng.choice(bases, size=(n, L))
    for i in range(n // 2):
        s = int(rng.integers(0, n_species))
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        if hi <= lo:
            continue
        picks = order[rng.integers(lo, hi, size=L // K + 1)]
        seq = []
        for j in picks:
            km = int(kmers[j])
            seq.extend((km >> (2 * (K - 1 - t))) & 3 for t in range(K))
        batch[i] = bases[np.array(seq[:L], np.uint8)]
    reads = []
    for i in range(n):
        reads.append((f"r{i}", bytes(batch[i]).decode()))
    return reads


def make_genomes(kmers, groups, rng, n_org=10, g_kmers=500):
    """Decode g_kmers DB k-mers per organism into one genome string each.

    Reads sampled from these strings at coverage share windows across reads
    (every overlapping read re-observes the same canonical k-mers), which is
    what real sequencing looks like and what cross-read dedup exploits.
    """
    order, bounds = groups
    n_species = bounds.shape[0] - 1
    picks = rng.choice(n_species, size=n_org, replace=False)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genomes = []
    for s in picks:
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        js = order[rng.integers(lo, hi, size=g_kmers)]
        seq = np.empty(g_kmers * K, np.uint8)
        for m, j in enumerate(js):
            km = int(kmers[j])
            for t in range(K):
                seq[m * K + t] = bases[(km >> (2 * (K - 1 - t))) & 3]
        genomes.append(seq)
    return genomes


def make_reads_coverage(genomes, rng, n):
    """n reads of length L drawn from random offsets of the genomes."""
    reads = []
    for i in range(n):
        g = genomes[int(rng.integers(0, len(genomes)))]
        off = int(rng.integers(0, max(1, len(g) - L)))
        reads.append((f"r{i}", bytes(g[off : off + L]).decode()))
    return reads


def _cache_dir():
    """Persistent compile cache: XLA compilation dominates setup.  /tmp does
    NOT survive into the driver's bench environment (r04 setup was 323 s with
    a warm /tmp cache on the build host), so the cache lives in the repo and
    its entries are committed; /tmp remains the fallback."""
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        os.makedirs(repo, exist_ok=True)
        probe = os.path.join(repo, ".w")
        with open(probe, "w"):
            pass
        os.remove(probe)
        return repo
    except OSError:
        return "/tmp/jax_cache"


def main():
    phases = {}
    t0 = time.time()

    def mark(name):
        nonlocal t0
        now = time.time()
        phases[name] = round(now - t0, 1)
        t0 = now

    import jax

    jax.config.update("jax_compilation_cache_dir", _cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lmat_tpu.apps.read_label_fast import FastClassifier
    from lmat_tpu.apps.read_label_score_device import DeviceScorer, DeviceScorerConfig

    mark("import")

    tax, leaves = build_taxonomy()
    idx, kmers, groups = build_index(tax, leaves)
    mark("build_db")

    cfg = DeviceScorerConfig(
        max_candidates=int(os.environ.get("BENCH_CAND", 32)), min_kmer=30
    )
    scorer = DeviceScorer(tax, cfg)
    remapped = scorer.remap_index_tids(idx)
    layout = os.environ.get("BENCH_LAYOUT", "auto")
    fast = FastClassifier(remapped.to_device(layout=layout), scorer, k=K,
                          dedup_frac=DEDUP or None)
    mark("init_upload")

    rng = np.random.default_rng(99)
    N_PASSES = int(os.environ.get("BENCH_PASSES", 3))
    n_gen = N_PASSES * N_BATCHES + 1  # warm-up + N disjoint timed passes
    if WORKLOAD == "coverage":
        genomes = make_genomes(kmers, groups, rng, n_org=N_ORGS)
        batches = [make_reads_coverage(genomes, rng, B) for _ in range(n_gen)]
    else:
        batches = [make_reads(kmers, groups, rng, B) for _ in range(n_gen)]
    mark("gen_reads")

    from lmat_tpu.io.native_writer import native_available

    def timed_run(bs):
        t0 = time.time()
        if native_available():
            import io as _io

            sink = _io.BytesIO()
            n = fast.classify_stream_native(bs, sink)
            assert sink.getvalue()
        else:
            n = len(fast.classify_stream(bs))
        return n, time.time() - t0

    timed_run(batches[:1])  # warm: compile + thread pools + caches
    mark("compile_warm")

    # N timed passes over DISJOINT batch sets: all honest (execution
    # memoization cannot hit — no argument values repeat), best-of only
    # absorbs run-to-run tunnel variance (the shared link swings 2-3x
    # between congestion windows; see NOTES.md round 5)
    warm = 1
    dts = []
    n_reads = None
    for p in range(N_PASSES):
        lo = warm + p * N_BATCHES
        n, dtp = timed_run(batches[lo : lo + N_BATCHES])
        assert n_reads is None or n == n_reads
        n_reads = n
        dts.append(dtp)
    dt = min(dts)
    rps = n_reads / dt

    replay = {}
    if os.environ.get("BENCH_REPLAY"):
        # diagnostic only: replay pass 1's exact batches — if the runtime
        # memoizes, this runs impossibly fast (the round-2/3 inflation mode)
        _, dt3 = timed_run(batches[warm : warm + N_BATCHES])
        replay = {"replay_s": round(dt3, 3),
                  "replay_reads_per_sec": round(n_reads / dt3, 1)}

    metric = "reads_per_sec_e2e"
    if WORKLOAD != "mixed":
        metric += f"_{WORKLOAD}"  # non-default workloads are a separate series
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(rps, 1),
                "unit": "reads/s",
                "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 2),
                "setup_s": round(sum(phases.values()), 1),
                "setup_phases": phases,
                "pass_reads_per_sec": [round(n_reads / d, 1) for d in dts],
                **replay,
            }
        )
    )
    print(
        f"# setup {sum(phases.values()):.1f}s {phases}; {n_reads} reads in "
        f"{dt:.2f}s (passes {'/'.join(f'{d:.2f}' for d in dts)}); "
        f"db {idx.n_kmers} kmers; "
        f"{len(tax.parent)} taxa",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
