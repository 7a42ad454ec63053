#!/usr/bin/env python3
"""Round-3 profiling, take 4: like r3c but DCE-proof — every scan carry is a
full reduction over ALL outputs, so XLA cannot slice the work away.
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

    def fsum(x):
        return jnp.sum(x.astype(jnp.float32))

    def stage(name, fn, use_dev=False, extra=None):
        # scan over batches; dev passed OUTSIDE the scan xs (pytree arg)
        def run(d, bs, gs):
            def body(c, xg):
                return c + fn(d, xg[0], xg[1]), None
            c, _ = lax.scan(body, jnp.float32(0), (bs, gs))
            return c

        f = jax.jit(run)
        jax.block_until_ready(f(dev, batches, gcs))
        dt = timeit(lambda: jax.block_until_ready(f(dev, batches, gcs)))
        rec = {"stage": name, "ms": round(dt / NB * 1e3, 2)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        return dt / NB

    # --- prepare bisect (full-sum carries) -----------------------------------
    stage("codes", lambda d, b, g: fsum(device_ascii_to_codes(b)[0]) + fsum(device_ascii_to_codes(b)[1]))

    def canon(d, b, g):
        codes, bvalid = device_ascii_to_codes(b)
        hi, lo, wv = device_canonical_kmers(codes, bvalid, bench.K)
        return fsum(hi) + fsum(lo) + fsum(wv)

    t_canon = stage("codes_canon", canon)

    def full_prep(d, b, g):
        p = prepare_reads(b, bench.K)
        return sum(fsum(v) for v in p.values())

    t_prep = stage("full_prepare", full_prep,
                   extra={"note": "dedup+gc = this minus codes_canon"})

    # --- probe ----------------------------------------------------------------
    def prep_probe(d, b, g):
        p = prepare_reads(b, bench.K)
        found, ng, tids, tmask = d.lookup(p["hi"], p["lo"], p["qvalid"])
        return fsum(found) + fsum(ng) + fsum(tids) + fsum(tmask)

    t_pp = stage("prep_probe", prep_probe,
                 extra={"probe_only_est": None})
    print(json.dumps({"stage": "probe_est_ms",
                      "ms": round((t_pp - t_prep) * 1e3, 2)}), flush=True)

    # --- presence --------------------------------------------------------------
    def prep_probe_pres(d, b, g):
        p = prepare_reads(b, bench.K)
        pr = probe(d, p)
        pr["bin_sel"] = g
        res = scorer._presence(pr)
        return sum(fsum(v) for v in res.values())

    t_pres = stage("prep_probe_presence", prep_probe_pres)
    print(json.dumps({"stage": "presence_est_ms",
                      "ms": round((t_pres - t_pp) * 1e3, 2)}), flush=True)

    # --- full step -------------------------------------------------------------
    def full(d, b, g):
        p = prepare_reads(b, bench.K)
        pr = probe(d, p)
        pr["bin_sel"] = g
        out = scorer.score_batch(pr)
        return sum(fsum(v) for v in out.values())

    t_full = stage("full_step", full)
    print(json.dumps({"stage": "lineage_tail_est_ms",
                      "ms": round((t_full - t_pres) * 1e3, 2)}), flush=True)

    # --- fused probe emulations (full-sum carries) ------------------------------
    Q = 370_688
    ids_np = np.random.default_rng(0).integers(0, 1 << 20, Q, dtype=np.int32)
    lo_np = np.random.default_rng(1).integers(0, 1 << 20, Q, dtype=np.uint32)
    ids_b = jnp.asarray(ids_np)
    lo_q = jnp.asarray(lo_np)
    REP = 8
    R, MT = 32, 8

    tabA = jnp.asarray(
        np.random.default_rng(2).integers(0, 2**31, ((1 << 20), R * (2 + MT)), dtype=np.int32)
    ).astype(jnp.uint32)

    def fusedA(t, ids, lo):
        def body(c, it):
            ii = (ids + it * 977) & ((1 << 20) - 1)
            row = jnp.take(t, ii, axis=0, mode="clip")
            rr = row.reshape(Q, R, 2 + MT)
            hit = rr[:, :, 0] == lo[:, None]
            recsel = jnp.where(hit[:, :, None], rr[:, :, 1:], jnp.uint32(0)).sum(axis=1)
            return c + fsum(recsel), it
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(REP, dtype=jnp.int32))
        return c

    fA = jax.jit(fusedA)
    jax.block_until_ready(fA(tabA, ids_b, lo_q))
    dt = timeit(lambda: jax.block_until_ready(fA(tabA, ids_b, lo_q)), n=3)
    print(json.dumps({"stage": "fusedA_1gather_R32", "ms": round(dt / REP * 1e3, 2),
                      "table_MB": int(tabA.nbytes / 1e6)}), flush=True)
    del tabA

    bt = jnp.asarray(np.random.default_rng(3).integers(0, 2**22, ((1 << 20), 2), dtype=np.int32))
    so = jnp.asarray(np.random.default_rng(4).integers(0, 2**31, (131072, 64), dtype=np.int32)).astype(jnp.uint32)
    ar = jnp.asarray(np.random.default_rng(5).integers(0, 2**31, (4_194_304, 1 + MT), dtype=np.int32)).astype(jnp.uint32)

    def threeg(bt, so, ar, ids, lo):
        def body(c, it):
            ii = (ids + it * 977) & ((1 << 20) - 1)
            p = jnp.take(bt, ii, axis=0, mode="clip")
            r = (p[:, 0] >> 5) & 131071
            win = jnp.take(so, r, axis=0, mode="clip")
            hit = win == lo[:, None]
            pos = ((r << 5) + jnp.argmax(hit, axis=-1)) & (4_194_304 - 1)
            row = jnp.take(ar, pos, axis=0, mode="clip")
            return c + fsum(row) + fsum(hit), it
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(REP, dtype=jnp.int32))
        return c

    f3 = jax.jit(threeg)
    jax.block_until_ready(f3(bt, so, ar, ids_b, lo_q))
    dt = timeit(lambda: jax.block_until_ready(f3(bt, so, ar, ids_b, lo_q)), n=3)
    print(json.dumps({"stage": "emu_3gather", "ms": round(dt / REP * 1e3, 2)}), flush=True)

    tabC = jnp.asarray(
        np.random.default_rng(6).integers(0, 2**31, (131072, 64 * (2 + MT)), dtype=np.int32)
    ).astype(jnp.uint32)

    def fusedC(bt, t, ids, lo):
        def body(c, it):
            ii = (ids + it * 977) & ((1 << 20) - 1)
            p = jnp.take(bt, ii, axis=0, mode="clip")
            r = (p[:, 0] >> 5) & 131071
            row = jnp.take(t, r, axis=0, mode="clip").reshape(Q, 64, 2 + MT)
            hit = row[:, :, 0] == lo[:, None]
            recsel = jnp.where(hit[:, :, None], row[:, :, 1:], jnp.uint32(0)).sum(axis=1)
            return c + fsum(recsel), it
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(REP, dtype=jnp.int32))
        return c

    fC = jax.jit(fusedC)
    jax.block_until_ready(fC(bt, tabC, ids_b, lo_q))
    dt = timeit(lambda: jax.block_until_ready(fC(bt, tabC, ids_b, lo_q)), n=3)
    print(json.dumps({"stage": "fusedC_2gather_win", "ms": round(dt / REP * 1e3, 2),
                      "table_MB": int(tabC.nbytes / 1e6)}), flush=True)


if __name__ == "__main__":
    main()
