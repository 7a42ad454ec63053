#!/usr/bin/env python3
"""Round-4 scorer-tail bisection (VERDICT r3 weak #2): where do the ~12 ms
of DeviceScorer go, and which reformulations win?

Part 1 bisects the device step by progressively extending the computation
(prep -> probe -> flat1 sort -> unique_cap -> stage1 logic -> stage2 ->
presence einsums -> full _presence -> full score_batch); stage cost =
difference of consecutive full-reduction scan timings (NOTES.md method).

Part 2 micro-benchmarks the candidate-construction alternatives at bench
shapes: i32 vs i16 sort keys, one-hot-matmul compaction vs resort
compaction, and the [B,P,C]xC einsum suite.
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
    from lmat_tpu.core.encoding import host_gc_bins

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

    C = cfg.max_candidates
    SENT = jnp.int32(scorer.n_nodes + 7)

    def get_obs(d, b):
        p = prepare_reads(b, bench.K)
        pr = probe(d, p)
        raw = pr["tids"].astype(jnp.uint32)
        tids = (raw & jnp.uint32(scorer.IDX_MASK)).astype(jnp.int32)
        tmask = pr["tmask"] & ((raw & jnp.uint32(scorer.SKIP_BIT)) == 0)
        B = tids.shape[0]
        flat1 = jnp.where(tmask, tids, SENT).reshape(B, -1)
        return p, pr, flat1

    # --- part 1: progressive bisection ---------------------------------
    stage("a_prep_probe", lambda d, b, g: (
        (lambda p, pr, f1: fsum(pr["tids"]) + fsum(pr["tmask"]) + fsum(f1))(
            *get_obs(d, b))
    ))

    stage("b_plus_sort1", lambda d, b, g: (
        (lambda p, pr, f1: fsum(jnp.sort(f1, axis=1)))(*get_obs(d, b))
    ))

    def uniq_cap_matmul(s):
        B = s.shape[0]
        uniq = jnp.concatenate(
            [jnp.ones((B, 1), bool), s[:, 1:] != s[:, :-1]], axis=1
        ) & (s < SENT)
        pos = jnp.cumsum(uniq.astype(jnp.int32), axis=1) - 1
        oh = uniq[:, :, None] & (
            pos[:, :, None] == jnp.arange(C, dtype=jnp.int32)[None, None, :]
        )
        out = jnp.einsum(
            "bj,bjc->bc", s.astype(jnp.float32), oh.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        out = jnp.where(jnp.any(oh, axis=1), out, SENT)
        return out, jnp.minimum(jnp.max(pos, axis=1) + 1, C)

    def uniq_cap_resort(s):
        B = s.shape[0]
        uniq = jnp.concatenate(
            [jnp.ones((B, 1), bool), s[:, 1:] != s[:, :-1]], axis=1
        ) & (s < SENT)
        pos = jnp.cumsum(uniq.astype(jnp.int32), axis=1) - 1
        # second sort moves uniques (key 0) to the front in value order
        key = jnp.where(uniq, s, jnp.int32(2**30))
        out = jax.lax.sort(key, dimension=1)[:, :C]
        out = jnp.where(out < 2**30, out, SENT)
        return out, jnp.minimum(jnp.max(pos, axis=1) + 1, C)

    stage("c_plus_uniqcap_matmul", lambda d, b, g: (
        (lambda p, pr, f1: sum(fsum(x) for x in
                               uniq_cap_matmul(jnp.sort(f1, axis=1))))(
            *get_obs(d, b))
    ))

    stage("c2_plus_uniqcap_resort", lambda d, b, g: (
        (lambda p, pr, f1: sum(fsum(x) for x in
                               uniq_cap_resort(jnp.sort(f1, axis=1))))(
            *get_obs(d, b))
    ))

    def presence_full(d, b, g):
        p, pr, _ = get_obs(d, b)
        pr["bin_sel"] = g
        res = scorer._presence(pr)
        return sum(fsum(v) for v in res.values())

    stage("d_full_presence", presence_full)

    def full(d, b, g):
        p = prepare_reads(b, bench.K)
        pr = probe(d, p)
        pr["bin_sel"] = g
        out = scorer.score_batch(pr)
        return sum(fsum(v) for v in out.values())

    stage("e_full_step", full)

    # --- part 2: micro-benchmarks at bench shapes -----------------------
    B, J = 2048, int(batches.shape[2]) * 8
    rngj = np.random.default_rng(5)
    vals = rngj.integers(0, 21000, (B, J), dtype=np.int32)
    vals16 = vals.astype(np.int16)
    v32 = jax.device_put(vals)
    v16 = jax.device_put(vals16)
    REP = 8

    def tsort(v):
        @jax.jit
        def f(x):
            def body(c, i):
                return c + fsum(jnp.sort(x ^ i.astype(x.dtype), axis=1)), None
            c, _ = lax.scan(body, jnp.float32(0), jnp.arange(REP, dtype=jnp.int32))
            return c
        jax.block_until_ready(f(v))
        return timeit(lambda: jax.block_until_ready(f(v)), n=3) / REP

    results["micro_sort_i32_ms"] = round(tsort(v32) * 1e3, 2)
    results["micro_sort_i16_ms"] = round(tsort(v16) * 1e3, 2)
    print(json.dumps({k: results[k] for k in list(results)[-2:]}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
