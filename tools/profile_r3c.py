#!/usr/bin/env python3
"""Round-3 profiling, take 3: bisect prepare_reads and the scorer, and
emulate the candidate fused probe layouts with random tables of the right
shapes (cheap to compile, measures the gather+select cost exactly).

All loops amortized inside one jit (see profile_r3b.py).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def timeit(fn, n=4, warm=1):
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

    from lmat_tpu.apps.read_label_device import pad_batch, prepare_reads, probe
    from lmat_tpu.apps.read_label_score_device import (
        DeviceScorer,
        DeviceScorerConfig,
    )
    from lmat_tpu.core.encoding import (
        device_ascii_to_codes,
        device_canonical_kmers,
        host_gc_bins,
    )

    t0 = time.time()
    tax, leaves = bench.build_taxonomy()
    idx, kmers, groups = bench.build_index(tax, leaves)
    cfg = DeviceScorerConfig(max_candidates=32, min_kmer=30)
    scorer = DeviceScorer(tax, cfg)
    remapped = scorer.remap_index_tids(idx)
    dev = remapped.to_device()
    rng = np.random.default_rng(99)
    NB = 8
    batches = np.stack([
        pad_batch([s for _, s in bench.make_reads(kmers, groups, rng, bench.B)],
                  pad_to=224)
        for _ in range(NB)
    ])
    gcs = np.stack([host_gc_bins(b, bench.K) for b in batches])
    print(f"# setup {time.time()-t0:.1f}s", flush=True)

    def scan_over(fn, *xs):
        def run(*args):
            def body(c, x):
                r = fn(*x)
                return c + r, None
            c, _ = lax.scan(body, jnp.float32(0), args)
            return c
        return jax.jit(run), xs

    def bench_stage(name, fn, *xs, extra=None):
        f, args = scan_over(fn, *xs)
        jax.block_until_ready(f(*args))
        dt = timeit(lambda: jax.block_until_ready(f(*args)))
        rec = {"stage": name, "ms": round(dt / NB * 1e3, 2)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        return dt / NB

    # --- prepare bisect ------------------------------------------------------
    bench_stage("codes", lambda b: device_ascii_to_codes(b)[0].sum(dtype=jnp.float32) * 0 + 1, batches)

    def canon(b):
        codes, bvalid = device_ascii_to_codes(b)
        hi, lo, wv = device_canonical_kmers(codes, bvalid, bench.K)
        return (hi[0, 0] + lo[0, 0]).astype(jnp.float32)

    bench_stage("codes_canon", canon, batches)

    def with_dedup(b):
        p = prepare_reads(b, bench.K)
        return p["hi"][0, 0].astype(jnp.float32) + p["qvalid"][0, 0]

    bench_stage("full_prepare", with_dedup, batches)

    # --- scorer bisect: presence/candidate-table vs the rest -----------------
    def prep_probe_presence(d, b):
        p = prepare_reads(b, bench.K)
        pr = probe(d, p)
        res = scorer._presence(pr)
        leaf = res[0] if isinstance(res, tuple) else list(res.values())[0]
        return jnp.asarray(leaf).astype(jnp.float32).ravel()[0]

    try:
        bench_stage("prep_probe_presence", prep_probe_presence,
                    jnp.asarray([0] * NB), batches,
                    extra={"note": "subtract scan_prep_probe for presence"})
    except Exception as e:  # signature may differ; report and move on
        print(json.dumps({"stage": "prep_probe_presence", "error": str(e)[:200]}),
              flush=True)

    # --- fused probe emulations ----------------------------------------------
    Q = 370_688
    ids_b = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 20, Q, dtype=np.int32))
    lo_q = jnp.asarray(np.random.default_rng(1).integers(0, 1 << 20, Q, dtype=np.uint32))
    REP = 8

    # (a) 1-gather direct-fused: [2^20 buckets, R*(2+MT)] with R=32, MT=8
    R, MT = 32, 8
    Wrow = R * (2 + MT)
    tabA = jnp.asarray(
        np.random.default_rng(2).integers(0, 2**31, ((1 << 20), Wrow), dtype=np.int32)
    ).astype(jnp.uint32)

    def fusedA(t, ids, lo):
        def body(c, it):
            ii = (ids + it * 977) & ((1 << 20) - 1)
            row = jnp.take(t, ii, axis=0, mode="clip")  # [Q, Wrow]
            rr = row.reshape(Q, R, 2 + MT)
            suf = rr[:, :, 0]
            hit = suf == lo[:, None]
            recsel = jnp.where(hit[:, :, None], rr[:, :, 1:], jnp.uint32(0)).sum(axis=1)
            return c + recsel[:, 0].astype(jnp.float32)[0], it
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(REP, dtype=jnp.int32))
        return c

    fA = jax.jit(fusedA)
    jax.block_until_ready(fA(tabA, ids_b, lo_q))
    dt = timeit(lambda: jax.block_until_ready(fA(tabA, ids_b, lo_q)), n=3)
    print(json.dumps({"stage": "fusedA_1gather_R32", "ms": round(dt / REP * 1e3, 2),
                      "table_MB": int(tabA.nbytes / 1e6)}), flush=True)
    del tabA

    # (b) current 3-gather emulation at the same shapes, for apples-to-apples
    bt = jnp.asarray(np.random.default_rng(3).integers(0, 2**22, ((1 << 20), 2), dtype=np.int32))
    so = jnp.asarray(np.random.default_rng(4).integers(0, 2**31, (131072, 64), dtype=np.int32)).astype(jnp.uint32)
    ar = jnp.asarray(np.random.default_rng(5).integers(0, 2**31, (4_000_000, 1 + MT), dtype=np.int32)).astype(jnp.uint32)

    def threeg(bt, so, ar, ids, lo):
        def body(c, it):
            ii = (ids + it * 977) & ((1 << 20) - 1)
            p = jnp.take(bt, ii, axis=0, mode="clip")
            r = (p[:, 0] >> 5) & (131071)
            win = jnp.take(so, r, axis=0, mode="clip")
            hit = win == lo[:, None]
            pos = (r << 5) + jnp.argmax(hit, axis=-1)
            pos = pos & (4_000_000 - 1)
            row = jnp.take(ar, pos, axis=0, mode="clip")
            return c + row[:, 0].astype(jnp.float32)[0], it
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(REP, dtype=jnp.int32))
        return c

    f3 = jax.jit(threeg)
    jax.block_until_ready(f3(bt, so, ar, ids_b, lo_q))
    dt = timeit(lambda: jax.block_until_ready(f3(bt, so, ar, ids_b, lo_q)), n=3)
    print(json.dumps({"stage": "emu_3gather", "ms": round(dt / REP * 1e3, 2)}), flush=True)

    # (c) 2-gather: bucket pair + fused window row [131072, 64*(1+1+MT)]
    Wrow2 = 64 * (2 + MT)
    tabC = jnp.asarray(
        np.random.default_rng(6).integers(0, 2**31, (131072, Wrow2), dtype=np.int32)
    ).astype(jnp.uint32)

    def fusedC(bt, t, ids, lo):
        def body(c, it):
            ii = (ids + it * 977) & ((1 << 20) - 1)
            p = jnp.take(bt, ii, axis=0, mode="clip")
            r = (p[:, 0] >> 5) & (131071)
            row = jnp.take(t, r, axis=0, mode="clip").reshape(Q, 64, 2 + MT)
            suf = row[:, :, 0]
            hit = suf == lo[:, None]
            recsel = jnp.where(hit[:, :, None], row[:, :, 1:], jnp.uint32(0)).sum(axis=1)
            return c + recsel[:, 0].astype(jnp.float32)[0], it
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(REP, dtype=jnp.int32))
        return c

    fC = jax.jit(fusedC)
    jax.block_until_ready(fC(bt, tabC, ids_b, lo_q))
    dt = timeit(lambda: jax.block_until_ready(fC(bt, tabC, ids_b, lo_q)), n=3)
    print(json.dumps({"stage": "fusedC_2gather_win", "ms": round(dt / REP * 1e3, 2),
                      "table_MB": int(tabC.nbytes / 1e6)}), flush=True)


if __name__ == "__main__":
    main()
