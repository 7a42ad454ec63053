#!/usr/bin/env python3
"""Round-3 profiling, take 2: amortize the host<->device RPC latency away by
looping INSIDE one jit (lax.scan / fori_loop), so one dispatch covers many
iterations and the wall clock divides into true device time.

Stages measured at bench shapes (B=2048, L=224 padded, 4M-kmer DB, C=32):
  scan_step      8 full fast-path steps in one jit        -> ms/step
  scan_prep      16 prepare_reads in one jit              -> ms/prep
  scan_probe     16 (prepare+probe) in one jit            -> ms/(prep+probe)
  host_gc        host_gc_bins pure-host cost
  fetch_cold     device_get of a FRESH step output (no host cache)
  gather_wN      16 independent row gathers per jit call, widths 8..640
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def timeit(fn, n=5, warm=1):
    for _ in range(warm):
        fn()
    t0 = time.time()
    for _ in range(n):
        fn()
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"# devices: {jax.devices()}", flush=True)

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
    NB = 8
    batches = np.stack([
        pad_batch([s for _, s in bench.make_reads(kmers, groups, rng, bench.B)],
                  pad_to=224)
        for _ in range(NB)
    ])
    gcs = np.stack([host_gc_bins(b, bench.K) for b in batches])
    print(f"# setup {time.time()-t0:.1f}s", flush=True)

    # host GC cost (overlappable, but counts against the 2-core host budget)
    dt = timeit(lambda: host_gc_bins(batches[0], bench.K), n=5)
    print(json.dumps({"stage": "host_gc_ms", "ms": round(dt * 1e3, 2)}), flush=True)

    # --- full step, scan-amortized ------------------------------------------
    # reuse the exact step fn the classifier built (ints/flts/cs/ss/ovf/rtr)
    import lmat_tpu.apps.read_label_fast as rlf

    def step_fn(d, b, g):
        # replicate FastClassifier.step's body via a fresh classifier jit:
        # call the underlying jitted step's wrapped python fn is not exposed,
        # so re-derive: probe+score with packed outputs equals scorer cost;
        # here we call the public pieces (same ops, same shapes).
        prep = prepare_reads(b, bench.K)
        pr = probe(d, prep)
        pr["bin_sel"] = g
        out = scorer.score_batch(pr)
        ints = jnp.stack(
            [out["call_tid"], out["match"], out["n_cand"],
             out["cand_kmer_cnt"], out["cnt_fnd"], out["valid_kmers"],
             out["fnd_phix"].astype(jnp.int32)], axis=1)
        flts = jnp.stack(
            [out["call_score"], out["log_avg"], out["stdev"],
             out["top_score"], out["phix_score"]], axis=1)
        return ints, flts, out["cand_sorted"].astype(jnp.uint16), \
            out["score_sorted"], out["overflow"]

    def scan_step(d, bs, gs):
        def body(c, xg):
            o = step_fn(d, *xg)
            # fold a scalar from the output into the carry so no iteration
            # can be elided
            return c + o[0][0, 0], None
        c, _ = lax.scan(body, jnp.int32(0), (bs, gs))
        return c

    f = jax.jit(scan_step)
    t0 = time.time()
    jax.block_until_ready(f(dev, batches, gcs))
    print(f"# scan_step compile+first {time.time()-t0:.1f}s", flush=True)
    dt = timeit(lambda: jax.block_until_ready(f(dev, batches, gcs)), n=4)
    print(json.dumps({"stage": "scan_step_ms_per_batch", "ms": round(dt / NB * 1e3, 2),
                      "reads_per_s_device": round(bench.B * NB / dt)}), flush=True)

    # --- prepare only --------------------------------------------------------
    def scan_prep(bs):
        def body(c, b):
            p = prepare_reads(b, bench.K)
            return c + p["hi"][0, 0], None
        c, _ = lax.scan(body, jnp.uint32(0), bs)
        return c

    f2 = jax.jit(scan_prep)
    jax.block_until_ready(f2(batches))
    dt2 = timeit(lambda: jax.block_until_ready(f2(batches)), n=4)
    print(json.dumps({"stage": "scan_prep_ms", "ms": round(dt2 / NB * 1e3, 2)}),
          flush=True)

    # --- prepare + probe ------------------------------------------------------
    def scan_probe(d, bs):
        def body(c, b):
            p = prepare_reads(b, bench.K)
            found, ng, tids, tmask = d.lookup(p["hi"], p["lo"], p["qvalid"])
            return c + ng[0, 0] + tids[0, 0, 0].astype(jnp.int32), None
        c, _ = lax.scan(body, jnp.int32(0), bs)
        return c

    f3 = jax.jit(scan_probe)
    jax.block_until_ready(f3(dev, batches))
    dt3 = timeit(lambda: jax.block_until_ready(f3(dev, batches)), n=4)
    print(json.dumps({"stage": "scan_prep_probe_ms", "ms": round(dt3 / NB * 1e3, 2),
                      "probe_ms": round((dt3 - dt2) / NB * 1e3, 2),
                      "scorer_ms": round((dt - dt3) / NB * 1e3, 2)}), flush=True)

    # --- fetch cold ----------------------------------------------------------
    outs = [fast.step(b) for b in batches[:4]]
    jax.block_until_ready(outs)
    nbytes = sum(np.asarray(o).nbytes for o in fast.step(batches[0]))
    ts = []
    for o in outs:
        t0 = time.time()
        jax.device_get(o)
        ts.append(time.time() - t0)
    dtf = sorted(ts)[len(ts) // 2]
    print(json.dumps({"stage": "fetch_cold_ms", "ms": round(dtf * 1e3, 2),
                      "bytes": int(nbytes),
                      "MBps": round(nbytes / dtf / 1e6, 1)}), flush=True)

    # --- gather widths, fori-amortized ---------------------------------------
    NROWS = 1_000_000
    NIDX = 370_688  # ~bench query count, multiple of 128
    REP = 16
    ids0 = np.random.default_rng(0).integers(0, NROWS, NIDX, dtype=np.int32)

    for w in (8, 16, 64, 160, 320, 640):
        tab = jnp.asarray(
            np.random.default_rng(w).integers(0, 2**31, (NROWS, w), dtype=np.int32)
        )

        def many(t, i):
            def body(s, it):
                ii = (i + it * 977) % NROWS  # new ids each rep, still random
                return s + jnp.take(t, ii, axis=0, mode="clip")[:, 0], it

            s, _ = lax.scan(body, jnp.zeros(NIDX, jnp.int32),
                            jnp.arange(REP, dtype=jnp.int32))
            return s.sum()

        g = jax.jit(many)
        r = g(tab, jnp.asarray(ids0))
        jax.block_until_ready(r)
        dtg = timeit(lambda: jax.block_until_ready(g(tab, jnp.asarray(ids0))), n=3)
        per = dtg / REP
        print(json.dumps({
            "stage": f"gather_w{w}", "ms": round(per * 1e3, 2),
            "mrows_per_s": round(NIDX / per / 1e6, 1),
            "GBps_touched": round(NIDX * w * 4 / per / 1e9, 2),
        }), flush=True)
        del tab


if __name__ == "__main__":
    main()
