#!/usr/bin/env python3
"""Round-3 on-chip profiling: where does the fast-path batch time go, and
what do row gathers cost as rows get wider?

Measures, at the bench shapes (B=2048, L=200, 4M-kmer DB, C=32):
  1. full jitted step wall time (dispatch->block_until_ready)
  2. device_get fetch time of the step output tuple (+ its byte size)
  3. sub-stage times: prepare_reads / probe / scorer (separate jits)
  4. row-gather microbenchmark: [1M, w] u32 tables, 370k random row ids,
     w in {2, 8, 16, 64, 160, 320, 640} — tests whether the gather engine is
     issue-bound (rows/s flat in w => wider fused rows are free) or
     bandwidth-bound (GB/s flat => fused layouts lose)

Usage: python tools/profile_r3.py   (needs the real TPU; ~10-30 min compile)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses the bench DB/taxonomy builders)


def timeit(fn, n=8, warm=2):
    for _ in range(warm):
        fn()
    t0 = time.time()
    for _ in range(n):
        fn()
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lmat_tpu.apps.read_label_device import pad_batch, prepare_reads, probe
    from lmat_tpu.apps.read_label_fast import FastClassifier
    from lmat_tpu.apps.read_label_score_device import (
        DeviceScorer,
        DeviceScorerConfig,
    )
    from lmat_tpu.core.encoding import host_gc_bins

    t0 = time.time()
    tax, leaves = bench.build_taxonomy()
    idx, kmers, groups = bench.build_index(tax, leaves)
    cfg = DeviceScorerConfig(max_candidates=32, min_kmer=30)
    scorer = DeviceScorer(tax, cfg)
    remapped = scorer.remap_index_tids(idx)
    dev = remapped.to_device()
    fast = FastClassifier(dev, scorer, k=bench.K)
    rng = np.random.default_rng(99)
    reads = bench.make_reads(kmers, groups, rng, bench.B)
    batch = pad_batch([s for _, s in reads])
    gcb = host_gc_bins(batch, bench.K)
    print(f"# setup {time.time()-t0:.1f}s", flush=True)

    # --- 1. full step -------------------------------------------------------
    t0 = time.time()
    out = fast.step(batch)
    jax.block_until_ready(out)
    print(f"# step compile+first {time.time()-t0:.1f}s", flush=True)
    dt_step = timeit(lambda: jax.block_until_ready(fast.step(batch)))
    print(json.dumps({"stage": "full_step_ms", "ms": round(dt_step * 1e3, 2),
                      "reads_per_s_device": round(bench.B / dt_step)}), flush=True)

    # --- 2. fetch ----------------------------------------------------------
    out = fast.step(batch)
    jax.block_until_ready(out)
    nbytes = sum(np.asarray(o).nbytes for o in out)
    dt_fetch = timeit(lambda: jax.device_get(out), n=6)
    print(json.dumps({"stage": "fetch_ms", "ms": round(dt_fetch * 1e3, 2),
                      "bytes": int(nbytes),
                      "MBps": round(nbytes / dt_fetch / 1e6, 1)}), flush=True)

    # --- 3. sub-stages ------------------------------------------------------
    prep_jit = jax.jit(lambda b: prepare_reads(b, bench.K))
    prep = prep_jit(batch)
    jax.block_until_ready(prep)
    dt_prep = timeit(lambda: jax.block_until_ready(prep_jit(batch)))
    print(json.dumps({"stage": "prepare_ms", "ms": round(dt_prep * 1e3, 2)}),
          flush=True)

    probe_jit = jax.jit(lambda d, p: d.lookup(p["hi"], p["lo"], p["qvalid"]))
    pr = probe_jit(dev, prep)
    jax.block_until_ready(pr)
    dt_probe = timeit(lambda: jax.block_until_ready(probe_jit(dev, prep)))
    nq = int(np.asarray(prep["qvalid"]).sum())
    print(json.dumps({"stage": "probe_ms", "ms": round(dt_probe * 1e3, 2),
                      "queries": nq,
                      "mlookups_per_s": round(bench.B * (batch.shape[1] - bench.K + 1) / dt_probe / 1e6, 2)}),
          flush=True)

    def score_only(d, b, g):
        p = prepare_reads(b, bench.K)
        o = probe(d, p)
        o["bin_sel"] = g
        return scorer.score_batch(o)

    score_jit = jax.jit(score_only)
    so = score_jit(dev, batch, gcb)
    jax.block_until_ready(so)
    dt_ps = timeit(lambda: jax.block_until_ready(score_jit(dev, batch, gcb)))
    print(json.dumps({"stage": "prep_probe_score_ms", "ms": round(dt_ps * 1e3, 2),
                      "scorer_ms_approx": round((dt_ps - dt_probe - dt_prep) * 1e3, 2)}),
          flush=True)

    # --- 4. gather-width microbench ----------------------------------------
    NROWS = 1_000_000
    NIDX = 370_000
    ids = jnp.asarray(np.random.default_rng(0).integers(0, NROWS, NIDX, dtype=np.int32))

    for w in (2, 8, 16, 64, 160, 320, 640):
        tab = jnp.asarray(np.arange(NROWS * w, dtype=np.uint32).reshape(NROWS, w))
        g = jax.jit(lambda t, i: jnp.take(t, i, axis=0, mode="clip").sum(dtype=jnp.uint32))
        r = g(tab, ids)
        jax.block_until_ready(r)
        dt = timeit(lambda: jax.block_until_ready(g(tab, ids)), n=5, warm=1)
        print(json.dumps({
            "stage": f"gather_w{w}", "ms": round(dt * 1e3, 2),
            "mrows_per_s": round(NIDX / dt / 1e6, 1),
            "GBps_touched": round(NIDX * w * 4 / dt / 1e9, 2),
        }), flush=True)
        del tab

    # --- 5. element-gather (bsearch step cost) ------------------------------
    tab1 = jnp.asarray(np.arange(NROWS * 4, dtype=np.uint32))
    ids1 = jnp.asarray(np.random.default_rng(1).integers(0, NROWS * 4, NIDX, dtype=np.int32))
    g1 = jax.jit(lambda t, i: jnp.take(t, i, mode="clip").sum(dtype=jnp.uint32))
    jax.block_until_ready(g1(tab1, ids1))
    dt = timeit(lambda: jax.block_until_ready(g1(tab1, ids1)), n=5, warm=1)
    print(json.dumps({"stage": "gather_elem", "ms": round(dt * 1e3, 2),
                      "melems_per_s": round(NIDX / dt / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
