#!/usr/bin/env python3
"""On-chip router rehearsal (VERDICT r3 #4): routed lookup throughput at
>=10M k-mers per shard, measured against the direct (unrouted) probe of the
same windowed tables on the same chip.

One real chip = the S=1 degenerate mesh: lax.all_to_all is an identity but
the ENTIRE routing machinery (owner sort, gather-based send packing,
overflow count, inverse permutation) still executes, so

    route_overhead = routed_time - direct_time

is exactly the per-batch cost the multi-chip path adds on top of the probe
(collective hop time rides ICI and is not measurable here; its payload =
2*Q rows of (hi,lo,valid) out + (found,ng,tids,tmask) back is reported as
bytes for the ICI budget).

Also reports the cap-headroom concentration for S=8 under the worst skew we
can synthesize host-side (all queries drawn from DB k-mers, i.e. the real
bucket distribution), to justify the 2x-mean cap sizing rule.

Run on the attached TPU:  python tools/scale_router.py
Smoke:  SCALE_KMERS=2e6 SCALE_PLATFORM=cpu python tools/scale_router.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 20
N = int(float(os.environ.get("SCALE_KMERS", 2e7)))
MAX_TIDS = 8
Q = int(os.environ.get("SCALE_QUERIES", 1 << 19))
ITER = int(os.environ.get("SCALE_ITERS", 8))
# shard layout under the router: "window" (minimum memory) or "paged" (the
# capacity-scale speed tier a marker-DB deployment would run)
LAYOUT = os.environ.get("SCALE_LAYOUT", "window")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    if os.environ.get("SCALE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SCALE_PLATFORM"])
    import jax.numpy as jnp
    from jax import lax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as _bench

    jax.config.update("jax_compilation_cache_dir", _bench._cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lmat_tpu.core.encoding import split64
    from lmat_tpu.core.index import KmerIndex, probe_packed, probe_paged
    from lmat_tpu.parallel.mesh import make_mesh
    from lmat_tpu.parallel.router import ShardedIndex, make_sharded_lookup

    rng = np.random.default_rng(777)
    t0 = time.time()
    kmers = np.unique(
        rng.integers(0, 1 << (2 * K), size=int(N * 1.05), dtype=np.uint64)
    )[:N]
    lens = np.minimum(rng.geometric(0.6, size=kmers.shape[0]), MAX_TIDS).astype(
        np.int64
    )
    tid_flat = rng.integers(2, 1 << 20, size=int(lens.sum()), dtype=np.int64).astype(
        np.uint32
    )
    idx = KmerIndex.build_flat(kmers, tid_flat, lens, k=K, max_tids=MAX_TIDS)
    log(f"build: {idx.n_kmers:,} kmers in {time.time()-t0:.1f}s")

    mesh = make_mesh(data=1, db=1)
    sidx = ShardedIndex.from_index(idx, 1, dense_lists=False, layout=LAYOUT)
    assert sidx.arena_mode[0] in ("window", "paged"), sidx.arena_mode
    routed = make_sharded_lookup(mesh, sidx, q_per_device=Q, cap=Q)
    raw_fn = routed.sharded_fn

    # query pool: half DB hits, half random, ITER shifted windows
    qk = np.concatenate([
        kmers[rng.integers(0, idx.n_kmers, (Q + ITER) // 2)],
        rng.integers(0, 1 << (2 * K), (Q + ITER) - (Q + ITER) // 2,
                     dtype=np.uint64),
    ])
    rng.shuffle(qk)
    hi_p, lo_p = split64(qk)
    # reuse the lookup's placed tables (device-placing a second copy would
    # double the multi-GB HBM footprint and OOM the chip at 100M k-mers)
    bt_d, so_d, rec_d, arena_d = routed.tables
    tables = {"bucket_tab": bt_d, "suffix_over": so_d, "rec": rec_d,
              "arena": arena_d}
    hi_p, lo_p = jax.device_put(hi_p), jax.device_put(lo_p)
    jax.block_until_ready(tables["arena"])

    def reduce_out(found, ng, tids, tmask):
        return (found.sum().astype(jnp.int32) + ng.sum()
                + tids.astype(jnp.uint32).sum().astype(jnp.int32) + tmask.sum())

    @jax.jit
    def g_routed(T, h, l, seed):
        def body(c, i):
            hh = lax.dynamic_slice(h, (i,), (Q,))
            ll = lax.dynamic_slice(l, (i,), (Q,))
            f, ng, t, m, ovf = raw_fn(
                T["bucket_tab"], T["suffix_over"], T["rec"], T["arena"],
                hh, ll, jnp.ones(Q, bool),
            )
            return c + reduce_out(f, ng, t, m) + ovf, 0
        c, _ = lax.scan(body, seed, jnp.arange(ITER))
        return c

    def direct_probe(T, hh, ll):
        if sidx.arena_mode[0] == "paged":
            return probe_paged(
                T["bucket_tab"][0], T["suffix_over"][0], sidx.arena_mode[1],
                sidx.arena_mode[2], MAX_TIDS, hh.astype(jnp.int32), ll,
                jnp.ones(hh.shape[0], bool),
            )
        return probe_packed(
            T["bucket_tab"][0], T["suffix_over"][0], T["rec"][0],
            T["arena"][0], sidx.arena_mode, sidx.search_depth, MAX_TIDS,
            hh.astype(jnp.int32), ll, jnp.ones(hh.shape[0], bool),
        )

    @jax.jit
    def g_direct(T, h, l, seed):
        def body(c, i):
            hh = lax.dynamic_slice(h, (i,), (Q,))
            ll = lax.dynamic_slice(l, (i,), (Q,))
            f, ng, t, m = direct_probe(T, hh, ll)
            return c + reduce_out(f, ng, t, m), 0
        c, _ = lax.scan(body, seed, jnp.arange(ITER))
        return c

    def timed(g):
        # distinct seed per call: the runtime memoizes identical executions
        # and would serve cached results (NOTES.md r4 pitfall); VALUE fetch
        # as the barrier — block_until_ready can resolve before remote
        # execution completes (round-5 pitfall)
        int(g(tables, hi_p, lo_p, jnp.int32(0)))
        t0 = time.time()
        outs = [g(tables, hi_p, lo_p, jnp.int32(r + 1)) for r in range(3)]
        _ = [int(o) for o in outs]
        return (time.time() - t0) / 3 / ITER

    # correctness: routed and direct must agree on the fixed query window
    f1, ng1, t1, m1, ovf = routed(hi_p[:Q], lo_p[:Q], np.ones(Q, bool))
    f2, ng2, t2, m2 = jax.jit(
        lambda T, h, l: direct_probe(T, h, l)
    )(tables, hi_p[:Q], lo_p[:Q])
    assert int(ovf) == 0
    for a, b in ((f1, f2), (ng1, ng2), (t1, t2), (m1, m2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    log("routed == direct on the check window")

    t_direct = timed(g_direct)
    t_routed = timed(g_routed)

    # cap-headroom under the DB's own bucket distribution, S=8
    S = 8
    n_buckets = idx.bucket_start.shape[0] - 1
    per = n_buckets // S
    worst = 0
    for _ in range(50):
        qs = kmers[rng.integers(0, idx.n_kmers, 4096)]
        owner = ((qs >> np.uint64(2 * K - 20)).astype(np.int64)) // per
        worst = max(worst, int(np.bincount(owner, minlength=S).max()))

    payload = Q * (4 + 4 + 1) + Q * (1 + 4 + 4 * MAX_TIDS + MAX_TIDS)
    res = {
        "metric": "router_rehearsal",
        "layout": LAYOUT,
        "n_kmers": idx.n_kmers,
        "Q": Q,
        "direct_Mlps": round(Q / t_direct / 1e6, 2),
        "routed_Mlps": round(Q / t_routed / 1e6, 2),
        "route_overhead_ms": round((t_routed - t_direct) * 1e3, 2),
        "route_overhead_pct": round(100 * (t_routed - t_direct) / t_direct, 1),
        "a2a_payload_mb_per_batch": round(payload / 1e6, 2),
        "s8_worst_group_of_mean": round(worst / (4096 / S), 2),
    }
    log(f"direct {Q/t_direct/1e6:.2f}M lps, routed {Q/t_routed/1e6:.2f}M lps "
        f"(+{(t_routed-t_direct)*1e3:.2f} ms)")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
