#!/usr/bin/env python3
"""Round-4 capacity-probe experiments: windowed layout at >=100M k-mers.

Round 3 measured the capacity (windowed) layout at 8.84M lookups/s at 100M
k-mers vs ~25M/s on the 4M bench DB (SCALE_r03.json).  Suspected causes and
the variant that isolates each:

  v0  baseline probe_packed (coarse 2k-20-bit buckets, depth-8 bsearch)
  v1  v0 on bucket-sorted queries         -> locality across the 1.6GB span
  v2  fine buckets (+e prefix bits)       -> bsearch depth collapses to 0
  v3  v2 on sorted queries                -> both
  v4  v2 + pow2-slot-aligned arena        -> record fetch = 1 gather (vs 2)
  v5  v4 + G=4 split gathers              -> gather-issue overlap
  v6  v5 on sorted queries (+ the sort/unsort cost measured separately)

All variants loop inside one jit (lax.scan over shifted query slices so XLA
cannot hoist the probe out of the loop) and reduce over every output
(NOTES.md methodology).  Correctness: every variant's checksum tuple must
equal v0's on the same fixed query set.

Run:  python tools/profile_r4.py                      (real chip, 100M)
      SCALE_KMERS=2e6 SCALE_PLATFORM=cpu python tools/profile_r4.py  (smoke)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 20
SUF_BITS = 20
N = int(float(os.environ.get("SCALE_KMERS", 1e8)))
MAX_TIDS = int(os.environ.get("SCALE_MAX_TIDS", 8))
Q = int(os.environ.get("SCALE_QUERIES", 1 << 19))
ITER = int(os.environ.get("SCALE_ITERS", 8))
VARIANTS = os.environ.get("PROFILE_VARIANTS", "v0,v1,v2,v3,v4,v5,v6").split(",")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def next_pow2(x):
    p = 1
    while p < x:
        p *= 2
    return p


def build_synthetic(n):
    from lmat_tpu.core.index import KmerIndex

    rng = np.random.default_rng(4242)
    t0 = time.time()
    kmers = np.unique(
        rng.integers(0, 1 << (2 * K), size=int(n * 1.05), dtype=np.uint64)
    )[:n]
    lens = np.minimum(rng.geometric(0.6, size=kmers.shape[0]), MAX_TIDS).astype(
        np.int64
    )
    total = int(lens.sum())
    tid_flat = rng.integers(2, 1 << 20, size=total, dtype=np.int64).astype(np.uint32)
    idx = KmerIndex.build_flat(kmers, tid_flat, lens, k=K, max_tids=MAX_TIDS)
    log(f"build: {idx.n_kmers:,} kmers / {total:,} tids in {time.time()-t0:.1f}s")
    return idx, kmers


def fine_bucket_tab(kmers, e):
    """(start,count) table at 2^(2K-SUF_BITS+e) buckets + its search depth."""
    nb = 1 << (2 * K - SUF_BITS + e)
    b = (kmers >> np.uint64(SUF_BITS - e)).astype(np.int64)
    start = np.zeros(nb + 1, np.int64)
    np.add.at(start, b + 1, 1)
    start = np.cumsum(start)
    counts = np.diff(start)
    max_b = int(counts.max()) if counts.size else 0
    depth = max(1, int(np.ceil(np.log2(max_b + 1)))) if max_b else 1
    tab = np.stack([start[:-1], counts], axis=1).astype(np.int32)
    log(f"fine buckets e={e}: nb={nb:,}, max_bucket={max_b}, depth={depth}, "
        f"tab={tab.nbytes/1e6:.0f} MB")
    return tab, depth


def aligned_arena(idx):
    """Repack tid lists so each occupies one pow2 slot, slot-aligned, so no
    list straddles an A-row boundary: the record fetch becomes ONE row
    gather + an in-row shift select.  Returns (arena2 [rows,A], rec2 [N,2])."""
    ts = idx.tid_start.astype(np.int64)
    count = np.diff(ts)
    n = len(count)
    A = next_pow2(max(idx.max_tids, 1))
    slot = np.ones(n, np.int64)
    m = count > 1
    slot[m] = 2 ** np.ceil(np.log2(count[m])).astype(np.int64)
    order = np.argsort(-slot, kind="stable")
    sizes = slot[order]
    offs = np.zeros(n, np.int64)
    np.cumsum(sizes[:-1], out=offs[1:])
    new_ts = np.empty(n, np.int64)
    new_ts[order] = offs
    total2 = int(sizes.sum())
    rows = (total2 + A - 1) // A + 1
    arena2 = np.zeros(rows * A, np.uint32)
    dst = np.repeat(new_ts, count) + (
        np.arange(len(idx.tid_flat)) - np.repeat(ts[:-1], count)
    )
    arena2[dst] = idx.tid_flat
    meta = (count.astype(np.uint32) << 16) | idx.ng.astype(np.uint32)
    rec2 = np.stack([new_ts.astype(np.uint32), meta], axis=1)
    log(f"aligned arena: {total2:,} slots vs {len(idx.tid_flat):,} entries "
        f"({total2/max(len(idx.tid_flat),1):.2f}x), A={A}")
    return arena2.reshape(rows, A), rec2


def main():
    import jax

    if os.environ.get("SCALE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SCALE_PLATFORM"])
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lmat_tpu.core.encoding import split64
    from lmat_tpu.core.index import KmerIndex, probe_packed

    idx, kmers = build_synthetic(N)
    tables, arena_mode = idx.packed_tables(dense_lists=False)
    A = arena_mode[1]
    e = max(0, int(np.ceil(np.log2(max(N, 1) / 6))) - (2 * K - SUF_BITS))
    e = min(e, SUF_BITS - 6)
    ftab, fdepth = fine_bucket_tab(kmers, e)
    arena2_np, rec2_np = aligned_arena(idx)

    put = jax.device_put
    t0 = time.time()
    bucket_tab = put(tables["bucket_tab"])
    suffix_over = put(tables["suffix_over"])
    rec = put(tables["rec"])
    arena = put(tables["arena"])
    ftab_d = put(ftab)
    arena2 = put(arena2_np)
    rec2 = put(rec2_np)
    jax.block_until_ready(arena2)
    log(f"upload {(sum(x.nbytes for x in (bucket_tab,suffix_over,rec,arena,ftab_d,arena2,rec2)))/1e9:.2f} GB in {time.time()-t0:.1f}s")

    # query pool: ITER+1 shifted windows over Q+ITER entries
    rng = np.random.default_rng(77)
    qk = np.concatenate([
        kmers[rng.integers(0, idx.n_kmers, size=(Q + ITER) // 2)],
        rng.integers(0, 1 << (2 * K), size=(Q + ITER) - (Q + ITER) // 2,
                     dtype=np.uint64),
    ])
    rng.shuffle(qk)
    qk_sorted = np.sort(qk)
    hi_p, lo_p = split64(qk)
    shi_p, slo_p = split64(qk_sorted)
    hi_p, lo_p, shi_p, slo_p = map(put, (hi_p, lo_p, shi_p, slo_p))

    MT = idx.max_tids
    lga = A.bit_length() - 1

    def take_split(table, ix, G):
        if G == 1:
            return jnp.take(table, ix, axis=0, mode="clip")
        q = ix.shape[0]
        parts = [
            jnp.take(table, g, axis=0, mode="clip")
            for g in ix.reshape(G, q // G)
        ]
        return jnp.concatenate(parts, axis=0)

    def probe_v4(b, lo, valid, depth, btab, G=1):
        """probe_packed's front half + single-gather aligned-arena fetch."""
        W = KmerIndex._WIN
        bt = take_split(btab, b, G)
        left = bt[..., 0]
        n = bt[..., 1]
        end = left + n
        lo_u = lo.astype(jnp.uint32)
        lgw = W.bit_length() - 1
        if depth > lgw:
            suffix_flat = suffix_over.reshape(-1)
            for _ in range(depth - lgw):
                half = n >> 1
                mid = left + half
                fidx = ((mid >> lgw) << (lgw + 1)) | (mid & (W - 1))
                mv = jnp.take(suffix_flat, fidx, mode="clip")
                go_right = mv < lo_u
                left = jnp.where(go_right, mid + 1, left)
                n = jnp.where(go_right, n - half - 1, half)
        r = left >> lgw
        win = take_split(suffix_over, r, G)
        j = jnp.arange(2 * W, dtype=jnp.int32)
        pos_j = (r << lgw)[..., None] + j
        hit = (
            (pos_j >= left[..., None])
            & (pos_j <= (left + n)[..., None])
            & (pos_j < end[..., None])
            & (win == lo_u[..., None])
        )
        found = valid & jnp.any(hit, axis=-1)
        pos = (r << lgw) + jnp.argmax(hit, axis=-1).astype(jnp.int32)
        rc = take_split(rec2, pos, G)
        ts = rc[..., 0].astype(jnp.uint32)
        meta = jnp.where(found, rc[..., 1].astype(jnp.uint32), jnp.uint32(0)).astype(jnp.int32)
        ra = (ts >> lga).astype(jnp.int32)
        w = take_split(arena2, ra, G)
        w2 = jnp.concatenate([w, w], axis=-1)
        sh = (ts & (A - 1)).astype(jnp.int32)
        rows = jnp.zeros(w.shape[:-1] + (MT,), w.dtype)
        for s in range(A):
            rows = jnp.where((sh == s)[..., None], w2[..., s : s + MT], rows)
        count = meta >> 16
        ngv = meta & 0xFFFF
        tmask = (jnp.arange(MT, dtype=jnp.int32) < count[..., None]) & found[..., None]
        tids = jnp.where(tmask, rows, jnp.uint32(0))
        return found, ngv, tids, tmask

    def mk_coarse(depth):
        def f(h, l, v):
            return probe_packed(bucket_tab, suffix_over, rec, arena,
                                arena_mode, depth, MT, h.astype(jnp.int32), l, v)
        return f

    def mk_fine(use_packed=True, G=1):
        def f(h, l, v):
            b = (h.astype(jnp.int32) << e) | (l >> (SUF_BITS - e)).astype(jnp.int32)
            if use_packed:
                return probe_packed(ftab_d, suffix_over, rec, arena,
                                    arena_mode, fdepth, MT, b, l, v)
            return probe_v4(b, l, v, fdepth, ftab_d, G=G)
        return f

    probes = {
        "v0": (mk_coarse(idx.search_depth), False),
        "v1": (mk_coarse(idx.search_depth), True),
        "v2": (mk_fine(True), False),
        "v3": (mk_fine(True), True),
        "v4": (mk_fine(False, G=1), False),
        "v5": (mk_fine(False, G=4), False),
        "v6": (mk_fine(False, G=4), True),
    }

    # correctness: fixed query window, checksum tuple must match v0
    def checksum(fn):
        @jax.jit
        def g(h, l):
            f, ng, t, m = fn(h, l, jnp.ones(Q, bool))
            return f.sum(), ng.sum(), t.astype(jnp.uint32).sum(), m.sum()
        return tuple(int(x) for x in g(hi_p[:Q], lo_p[:Q]))

    ref = checksum(probes["v0"][0])
    log(f"v0 checksum {ref}")
    for name in VARIANTS:
        if name in ("v0", "v1"):
            continue
        got = checksum(probes[name][0])
        assert got == ref, f"{name} checksum {got} != v0 {ref}"
    log("checksums agree")

    res = {"n_kmers": idx.n_kmers, "Q": Q, "e": e, "fine_depth": fdepth,
           "coarse_depth": idx.search_depth}

    def timed(fn, sorted_q):
        h_p, l_p = (shi_p, slo_p) if sorted_q else (hi_p, lo_p)

        @jax.jit
        def g(h, l):
            def body(c, i):
                hh = lax.dynamic_slice(h, (i,), (Q,))
                ll = lax.dynamic_slice(l, (i,), (Q,))
                f, ng, t, m = fn(hh, ll, jnp.ones(Q, bool))
                return (c + f.sum() + ng.sum() + m.sum()
                        + t.astype(jnp.uint32).sum().astype(jnp.int32), 0)
            c, _ = lax.scan(body, jnp.int32(0), jnp.arange(ITER))
            return c

        jax.block_until_ready(g(h_p, l_p))
        t0 = time.time()
        for _ in range(3):
            out = g(h_p, l_p)
        jax.block_until_ready(out)
        return (time.time() - t0) / 3 / ITER

    for name in VARIANTS:
        fn, sorted_q = probes[name]
        t = timed(fn, sorted_q)
        res[f"{name}_ms"] = round(t * 1e3, 2)
        res[f"{name}_Mlps"] = round(Q / t / 1e6, 2)
        log(f"{name}: {t*1e3:.2f} ms = {Q/t/1e6:.2f}M lookups/s")

    # cost of sort + unsort for the sorted variants, measured alone
    @jax.jit
    def sort_unsort(h, l):
        def body(c, i):
            hh = lax.dynamic_slice(h, (i,), (Q,))
            ll = lax.dynamic_slice(l, (i,), (Q,))
            key = (hh.astype(jnp.uint32) << jnp.uint32(12)) | (ll >> jnp.uint32(8))
            order = jnp.argsort(key)
            hs = jnp.take(hh, order)
            ls = jnp.take(ll, order)
            inv = jnp.zeros(Q, jnp.int32).at[order].set(jnp.arange(Q, dtype=jnp.int32))
            out = jnp.take(jnp.stack([hs, ls], axis=1), inv, axis=0)
            return c + out.astype(jnp.uint32).sum().astype(jnp.int32), 0
        c, _ = lax.scan(body, jnp.int32(0), jnp.arange(ITER))
        return c

    jax.block_until_ready(sort_unsort(hi_p, lo_p))
    t0 = time.time()
    for _ in range(3):
        out = sort_unsort(hi_p, lo_p)
    jax.block_until_ready(out)
    t = (time.time() - t0) / 3 / ITER
    res["sort_unsort_ms"] = round(t * 1e3, 2)
    log(f"sort+unsort: {t*1e3:.2f} ms")

    print(json.dumps(res))


if __name__ == "__main__":
    main()
