#!/usr/bin/env python3
"""Stage-by-stage profiler for the fast-mode pipeline on the attached device.

Reuses bench.py's synthetic DB/taxonomy/read generator and times each jitted
stage (prepare/probe/score) separately plus transfer and host formatting, so
optimization work targets the real hot spots rather than guesses.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def timeit(f, n=5):
    f()  # warm
    t0 = time.time()
    for _ in range(n):
        r = f()
    return (time.time() - t0) / n, r


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lmat_tpu.apps.read_label_device import pad_batch, prepare_reads, probe
    from lmat_tpu.apps.read_label_fast import FastClassifier
    from lmat_tpu.apps.read_label_score_device import DeviceScorer, DeviceScorerConfig

    tax, leaves = bench.build_taxonomy()
    idx, kmers, groups = bench.build_index(tax, leaves)
    cfg = DeviceScorerConfig(max_candidates=int(os.environ.get("BENCH_CAND", 48)),
                             min_kmer=30)
    scorer = DeviceScorer(tax, cfg)
    remapped = scorer.remap_index_tids(idx)
    dev_index = remapped.to_device()
    fast = FastClassifier(dev_index, scorer, k=bench.K,
                          dedup_frac=bench.DEDUP or None)

    rng = np.random.default_rng(99)
    if bench.WORKLOAD == "coverage":
        genomes = bench.make_genomes(kmers, groups, rng, n_org=bench.N_ORGS)
        reads = bench.make_reads_coverage(genomes, rng, bench.B)
    else:
        reads = bench.make_reads(kmers, groups, rng, bench.B)
    seqs = [s for _, s in reads]

    t_pad, batch_np = timeit(lambda: pad_batch(seqs))
    print(f"pad_batch (host)        {t_pad*1e3:8.1f} ms")

    t_put, batch_dev = timeit(
        lambda: jax.block_until_ready(jax.device_put(batch_np)))
    print(f"device_put [B,L]u8      {t_put*1e3:8.1f} ms")

    prep_j = jax.jit(lambda b: prepare_reads(b, bench.K))
    t_prep, prep = timeit(lambda: jax.block_until_ready(prep_j(batch_dev)))
    print(f"prepare_reads           {t_prep*1e3:8.1f} ms")

    probe_j = jax.jit(lambda p: probe(dev_index, p))
    t_probe, pr = timeit(lambda: jax.block_until_ready(probe_j(prep)))
    print(f"probe                   {t_probe*1e3:8.1f} ms")

    if bench.DEDUP:
        from lmat_tpu.apps.read_label_device import probe_dedup

        B_, P_ = np.asarray(prep["hi"]).shape
        u_cap = min(max(128, -(-int(B_ * P_ * bench.DEDUP) // 128) * 128), B_ * P_)
        dd_j = jax.jit(lambda p: probe_dedup(dev_index, p, u_cap))
        t_dd, prd = timeit(lambda: jax.block_until_ready(dd_j(prep)))
        nu = int(np.asarray(prd["n_unique"]))
        print(f"probe_dedup cap={u_cap:7d} {t_dd*1e3:6.1f} ms "
              f"(n_unique={nu} = {nu/(B_*P_):.2f}Q)")

    score_j = jax.jit(scorer.score_batch)
    t_score, out = timeit(lambda: jax.block_until_ready(score_j(pr)))
    print(f"score_batch             {t_score*1e3:8.1f} ms")

    t_full, dev_out = timeit(
        lambda: jax.block_until_ready(fast.step(batch_np)))
    print(f"full step (incl put)    {t_full*1e3:8.1f} ms")

    def fetch():
        ints, flts, cand, score, order, overflow = dev_out
        return (np.asarray(ints), np.asarray(flts), np.asarray(cand),
                np.asarray(score), np.asarray(order), int(overflow))

    t_fetch, _ = timeit(fetch)
    print(f"fetch results           {t_fetch*1e3:8.1f} ms")

    t_fmt, _ = timeit(lambda: fast._format(reads, dev_out))
    print(f"host format             {t_fmt*1e3:8.1f} ms")

    B = bench.B
    print(f"-- B={B} C={cfg.max_candidates} L={bench.L} "
          f"steady ~{B/t_full:.0f} dev-only r/s, "
          f"{B/max(t_full, t_fetch + t_fmt):.0f} pipelined r/s")

    # per-stage breakdown inside score_batch via sub-jits is intrusive;
    # use jax.profiler for that when needed.


if __name__ == "__main__":
    main()
