#!/usr/bin/env python3
"""Second-pass throughput bench (VERDICT r3 #10): gene_label and content_summ
have headline rates too — the reference prints its own kmers/s for these
(tax_histo.cpp:314).  One JSON line per pipeline:

  {"metric": "gene_label_reads_per_sec", ...}
  {"metric": "content_summ_mkmers_per_sec", "mode": "host"|"device", ...}

Workload: bench.py's coverage regime (reads over N_ORGS genomes) — the
shape both second passes see in production (classified reads in, per-gene /
per-taxid k-mer stats out).

Run on the attached TPU:  python tools/bench_second_pass.py
Host-only paths:          JAX_PLATFORMS='' SECOND_DEVICE=0 ...
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

N_READS = int(os.environ.get("SECOND_READS", 40960))
USE_DEVICE = os.environ.get("SECOND_DEVICE", "1") != "0"


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", bench._cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lmat_tpu.apps.content_summ import ContentSummarizer, ContentSummOptions
    from lmat_tpu.apps.gene_label import GeneLabeler, GeneLabelOptions

    t0 = time.time()
    tax, leaves = bench.build_taxonomy()
    idx, kmers, groups = bench.build_index(tax, leaves)
    rng = np.random.default_rng(31)
    genomes = bench.make_genomes(kmers, groups, rng, n_org=10)
    reads = bench.make_reads_coverage(genomes, rng, N_READS)
    tids = rng.integers(2, 1000, size=N_READS)
    out_path = "/tmp/second_pass.out"
    with open(out_path, "w") as f:
        for (hdr, seq), tid in zip(reads, tids):
            f.write(f"{hdr}\t{seq}\t1.0 0.5 {len(seq)-bench.K+1}\t \t{tid} 1.0 DirectMatch\n")
    print(f"# setup {time.time()-t0:.1f}s: {N_READS} reads", file=sys.stderr)

    # ---- gene_label over the device probe --------------------------------
    if USE_DEVICE:
        t0 = time.time()
        lab = GeneLabeler(idx, GeneLabelOptions(k=bench.K))
        lab.run_files([out_path], "/tmp/second_gl", device=True)
        dt = time.time() - t0
        print(json.dumps({
            "metric": "gene_label_reads_per_sec",
            "value": round(N_READS / dt, 1), "unit": "reads/s",
            "note": "device probe, cold incl. compile" ,
        }))
        # warm second pass
        t0 = time.time()
        lab.run_files([out_path], "/tmp/second_gl", device=True)
        dt = time.time() - t0
        print(json.dumps({
            "metric": "gene_label_reads_per_sec_warm",
            "value": round(N_READS / dt, 1), "unit": "reads/s",
        }))

    # ---- content_summ: host vs device data plane -------------------------
    k_list = (8, 10, 12, 14, 17)
    n_pos = sum(len(s) - k + 1 for _, s in reads for k in k_list)

    class _Tax:
        rank = {}

    for mode, dev in (("host", False), ("device", True)):
        if dev and not USE_DEVICE:
            continue
        cs = ContentSummarizer(_Tax(), ContentSummOptions(k_list=k_list, device=dev))
        for (hdr, seq), tid in zip(reads, tids):
            cs._store_kmers(seq, int(tid) % 50)
        t0 = time.time()
        cs._flush()
        dt = time.time() - t0
        rate = n_pos / dt / 1e6
        print(json.dumps({
            "metric": "content_summ_mkmers_per_sec", "mode": mode,
            "value": round(rate, 2), "unit": "M kmer-positions/s",
            "reads_per_sec": round(N_READS / dt, 1),
        }))
        if dev:
            # warm (jit cached) second run
            cs2 = ContentSummarizer(_Tax(), ContentSummOptions(k_list=k_list, device=True))
            for (hdr, seq), tid in zip(reads, tids):
                cs2._store_kmers(seq, int(tid) % 50)
            t0 = time.time()
            cs2._flush()
            dt = time.time() - t0
            print(json.dumps({
                "metric": "content_summ_mkmers_per_sec", "mode": "device_warm",
                "value": round(n_pos / dt / 1e6, 2), "unit": "M kmer-positions/s",
                "reads_per_sec": round(N_READS / dt, 1),
            }))


if __name__ == "__main__":
    main()
