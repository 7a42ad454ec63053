#!/usr/bin/env python3
"""Round-4 prep/probe bisection: the r4s run showed the device step is
~24.4ms with only ~4.7ms in the scorer — prep+probe own ~19.7ms.  Bisect
those, and test cheap probe-epilogue/padding variants at bench shapes:

  s0  scan + fsum overhead (uint8 batch reduce only)
  s1  prep only (codes, canonical k-mers, dedup sort, GC)
  s1n prep without the within-read dedup sort (counts its cost)
  s2  prep + fused probe (the shipped path)
  s2e prep + probe with an f32-einsum record select instead of where+sum
  s2g prep + probe with G=1 (no split gathers) — r4 found G-splits hurt
      on the capacity layouts; the fused probe still uses G=4
  s3  full step (probe + scorer): the end-to-end anchor

Run on the attached TPU:  python tools/profile_r4p.py
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
    from lmat_tpu.core.encoding import host_gc_bins, device_ascii_to_codes, device_canonical_kmers

    t0 = time.time()
    tax, leaves = bench.build_taxonomy()
    idx, kmers, groups = bench.build_index(tax, leaves)
    cfg = DeviceScorerConfig(max_candidates=32, min_kmer=30)
    scorer = DeviceScorer(tax, cfg)
    remapped = scorer.remap_index_tids(idx)
    dev = remapped.to_device()
    assert dev.fused_rows is not None, "bench DB should take the fused layout"
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

    results = {}
    batches = jax.device_put(batches)
    gcs = jax.device_put(gcs)

    def stage(name, fn):
        # seed arg per call: the axon runtime MEMOIZES executions with
        # identical arguments (returns the prior result in ~0.1ms), so every
        # timed call must differ in at least one input (NOTES.md r4)
        def run(d, bs, gs, seed):
            def body(c, xg):
                return c + fn(d, xg[0], xg[1]), None
            c, _ = lax.scan(body, seed.astype(jnp.float32), (bs, gs))
            return c

        f = jax.jit(run)
        jax.block_until_ready(f(dev, batches, gcs, jnp.float32(0)))
        reps = 4
        t0 = time.time()
        outs = [f(dev, batches, gcs, jnp.float32(i + 1)) for i in range(reps)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / reps / NB
        results[name] = round(dt * 1e3, 2)
        print(json.dumps({"stage": name, "ms": results[name]}), flush=True)
        return dt

    K = bench.K

    stage("s0_overhead", lambda d, b, g: fsum(b))

    def prep_sum(d, b, g):
        p = prepare_reads(b, K)
        return sum(fsum(p[k]) for k in ("hi", "lo", "qvalid", "valid_kmers",
                                        "bin_sel"))

    stage("s1_prep", prep_sum)

    def prep_nodedup(d, b, g):
        codes, bvalid = device_ascii_to_codes(b)
        hi, lo, wvalid = device_canonical_kmers(codes, bvalid, K)
        return fsum(hi) + fsum(lo) + fsum(wvalid)

    stage("s1n_prep_nodedup", prep_nodedup)

    def probe_sum(d, b, g):
        pr = probe(d, prepare_reads(b, K))
        return (fsum(pr["found"]) + fsum(pr["ng"]) + fsum(pr["tids"])
                + fsum(pr["tmask"]))

    stage("s2_probe", probe_sum)

    # --- probe variants on the same fused table ------------------------
    R = dev.fused_r
    MT = dev.max_tids
    W = 2 + MT

    def probe_var(d, p, G, einsum_sel):
        hi = p["hi"].astype(jnp.int32)
        lo = p["lo"]
        valid = p["qvalid"]
        B, P = hi.shape
        Q = B * P
        bf = hi.reshape(Q)
        if G > 1:
            parts = [jnp.take(d.fused_rows, gq, axis=0, mode="clip")
                     for gq in bf.reshape(G, Q // G)]
            row = jnp.concatenate(parts, axis=0)
        else:
            row = jnp.take(d.fused_rows, bf, axis=0, mode="clip")
        rr = row.reshape(B, P, R, W)
        hit = (rr[..., 0] == lo.astype(jnp.uint32)[..., None]) & valid[..., None]
        if einsum_sel:
            rec = jnp.einsum(
                "bprw,bpr->bpw", rr[..., 1:].astype(jnp.float32),
                hit.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(jnp.uint32)
        else:
            rec = jnp.sum(jnp.where(hit[..., None], rr[..., 1:],
                                    jnp.uint32(0)), axis=-2)
        found = jnp.any(hit, axis=-1)
        meta = rec[..., 0].astype(jnp.int32)
        count = meta >> 16
        ngv = meta & 0xFFFF
        tmask = (jnp.arange(MT, dtype=jnp.int32) < count[..., None]) & found[..., None]
        tids = jnp.where(tmask, rec[..., 1:], jnp.uint32(0))
        return fsum(found) + fsum(ngv) + fsum(tids) + fsum(tmask)

    stage("s2g_probe_g1", lambda d, b, g: probe_var(d, prepare_reads(b, K), 1, False))
    stage("s2e_probe_einsum", lambda d, b, g: probe_var(d, prepare_reads(b, K), 4, True))
    stage("s2ge_probe_g1_einsum", lambda d, b, g: probe_var(d, prepare_reads(b, K), 1, True))

    def full(d, b, g):
        p = prepare_reads(b, K)
        pr = probe(d, p)
        pr["bin_sel"] = g
        out = scorer.score_batch(pr)
        return sum(fsum(v) for v in out.values())

    stage("s3_full", full)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
