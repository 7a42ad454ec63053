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


def paged_records(idx, kmers, e, rec2):
    """v7 layout: (suffix, ts, meta) records packed into 32-slot pages such
    that no fine bucket straddles a page (count-class packing, ~8% waste).
    bucket_tab[b] = (global slot pos, count); probe = bucket_tab gather +
    ONE 384B page gather + in-row select, then the aligned-arena gather.

    Returns (bucket_tab2 [nb,2] int32, pages [n_pages, 96] uint32) with
    planar rows: [32 suffix | 32 ts | 32 meta]; ts/meta come from the
    aligned arena's rec2.  Requires max bucket <= 32.
    """
    P = 32
    nb = 1 << (2 * K - SUF_BITS + e)
    b = (kmers >> np.uint64(SUF_BITS - e)).astype(np.int64)
    counts = np.zeros(nb, np.int64)
    np.add.at(counts, b, 1)
    assert counts.max() <= P, "bucket deeper than a page: lower e"
    # count-class packing: buckets with count c go per_page=32//c per page
    pos = np.zeros(nb, np.int64)
    page_base = 0
    for c in range(1, P + 1):
        sel = np.nonzero(counts == c)[0]
        if not sel.size:
            continue
        per = P // c
        n_pages_c = (len(sel) + per - 1) // per
        i = np.arange(len(sel))
        pos[sel] = (page_base + i // per) * P + (i % per) * c
        page_base += n_pages_c
    pages = np.zeros((max(page_base, 1), 3, P), np.uint32)
    pages[:, 0, :] = 0xFFFFFFFF  # empty suffix slots never match
    # scatter each k-mer to its bucket's slot run
    bs = np.zeros(nb + 1, np.int64)
    np.cumsum(counts, out=bs[1:])
    rank = np.arange(idx.n_kmers) - np.repeat(bs[:-1], counts)
    slot = np.repeat(pos, counts) + rank
    pg, off = slot // P, slot % P
    pages[pg, 0, off] = idx.suffix
    pages[pg, 1, off] = rec2[:, 0]
    pages[pg, 2, off] = rec2[:, 1]
    log(f"paged records: {page_base:,} pages = "
        f"{page_base*P/max(idx.n_kmers,1):.2f} slots/kmer")
    return np.stack([pos, counts], axis=1).astype(np.int32), pages.reshape(
        max(page_base, 1), 3 * P
    )


def paged_records_wide(idx, kmers, e, P=32):
    """v9 layout: like v7 pages but each slot inlines its full taxid list
    (suffix, meta, tids[MT]) so the arena gather disappears entirely:
    bucket_tab + ONE page row = the whole lookup (2 gathers).
    Memory ~ (2+MT)*4 * slack bytes/kmer — the speed end of the
    speed/capacity dial.  P slots/page: v9=32 (1.28KB rows), v11=16 (640B),
    v12=8 (320B) — smaller rows stay under the gather-issue bound instead
    of the ~50GB/s wide-row bandwidth bound (measured r4)."""
    MT = idx.max_tids
    W = 2 + MT
    nb = 1 << (2 * K - SUF_BITS + e)
    b = (kmers >> np.uint64(SUF_BITS - e)).astype(np.int64)
    counts = np.zeros(nb, np.int64)
    np.add.at(counts, b, 1)
    assert counts.max() <= P
    pos = np.zeros(nb, np.int64)
    page_base = 0
    for c in range(1, P + 1):
        sel = np.nonzero(counts == c)[0]
        if not sel.size:
            continue
        per = P // c
        n_pages_c = (len(sel) + per - 1) // per
        i = np.arange(len(sel))
        pos[sel] = (page_base + i // per) * P + (i % per) * c
        page_base += n_pages_c
    pages = np.zeros((max(page_base, 1), P, W), np.uint32)
    pages[:, :, 0] = 0xFFFFFFFF
    bs = np.zeros(nb + 1, np.int64)
    np.cumsum(counts, out=bs[1:])
    rank = np.arange(idx.n_kmers) - np.repeat(bs[:-1], counts)
    slot = np.repeat(pos, counts) + rank
    pg, off = slot // P, slot % P
    pages[pg, off, 0] = idx.suffix
    ts = idx.tid_start.astype(np.int64)
    cnt_k = np.diff(ts)
    pages[pg, off, 1] = (cnt_k.astype(np.uint32) << 16) | idx.ng.astype(np.uint32)
    cols = np.arange(MT)[None, :]
    msk = cols < cnt_k[:, None]
    src = np.minimum(ts[:-1, None] + cols, max(len(idx.tid_flat) - 1, 0))
    if len(idx.tid_flat):
        pages[pg[:, None], off[:, None], 2 + cols] = np.where(
            msk, idx.tid_flat[src], 0
        )
    log(f"paged-wide: {page_base:,} pages, "
        f"{page_base*P*W*4/max(idx.n_kmers,1):.1f} B/kmer")
    return np.stack([pos, counts], axis=1).astype(np.int32), pages.reshape(
        max(page_base, 1), P * W
    )


def onehop_pages(idx, kmers, e, s):
    """v10 layout: ONE gather per lookup.  Groups of 2^s consecutive fine
    buckets share a direct-indexed page row holding every member's full
    record inline: slot = (lo u32, meta, tids[MT]).  No bucket table at all:
    page id = kmer prefix bits; the row IS the whole lookup.  P = measured
    max group occupancy (padded to a multiple of 8), so the layout adapts to
    skew at build time; memory ~ (2+MT)*4 * P/mean B/kmer — the speed end of
    the dial (group mean ~ 6*2^s)."""
    MT = idx.max_tids
    W = 2 + MT
    gb = 2 * K - SUF_BITS + e - s
    g = (kmers >> np.uint64(2 * K - gb)).astype(np.int64)
    ng_groups = 1 << gb
    counts = np.zeros(ng_groups, np.int64)
    np.add.at(counts, g, 1)
    P = int(-(-int(counts.max()) // 8) * 8)
    pages = np.zeros((ng_groups, P, W), np.uint32)
    pages[:, :, 0] = 0xFFFFFFFF
    bs = np.zeros(ng_groups + 1, np.int64)
    np.cumsum(counts, out=bs[1:])
    rank = np.arange(idx.n_kmers) - np.repeat(bs[:-1], counts)
    lo_all = (kmers & np.uint64((1 << SUF_BITS) - 1)).astype(np.uint32)
    pages[g, rank, 0] = lo_all
    ts = idx.tid_start.astype(np.int64)
    cnt_k = np.diff(ts)
    pages[g, rank, 1] = (cnt_k.astype(np.uint32) << 16) | idx.ng.astype(np.uint32)
    cols = np.arange(MT)[None, :]
    msk = cols < cnt_k[:, None]
    src = np.minimum(ts[:-1, None] + cols, max(len(idx.tid_flat) - 1, 0))
    if len(idx.tid_flat):
        pages[g[:, None], rank[:, None], 2 + cols] = np.where(
            msk, idx.tid_flat[src], 0
        )
    log(f"onehop: {ng_groups:,} pages x {P} slots x {W*4}B = "
        f"{ng_groups*P*W*4/1e9:.2f} GB = "
        f"{ng_groups*P*W*4/max(idx.n_kmers,1):.1f} B/kmer (max occ {int(counts.max())})")
    return pages.reshape(ng_groups, P * W), P, gb


def interleaved_windows(idx, rec2):
    """v8 layout: the overlapping suffix windows with (ts, meta) planes in
    the same rows, so the rec gather disappears: row r = [64 suffix | 64 ts
    | 64 meta] covering positions [32r, 32r+64)."""
    W = 32
    N = idx.n_kmers
    rows = (N + W - 1) // W + 1
    flat = np.zeros(((rows + 1) * W, 3), np.uint32)
    flat[:, 0] = 0xFFFFFFFF
    flat[:N, 0] = idx.suffix
    flat[:N, 1] = rec2[:, 0]
    flat[:N, 2] = rec2[:, 1]
    idx2 = np.arange(rows)[:, None] * W + np.arange(2 * W)[None, :]
    return flat[idx2].transpose(0, 2, 1).reshape(rows, 6 * W)  # planar


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
    ptab_np = pages_np = iw_np = ptab9_np = pages9_np = pages10_np = None
    if "v7" in VARIANTS:
        ptab_np, pages_np = paged_records(idx, kmers, e, rec2_np)
    if "v8" in VARIANTS:
        iw_np = interleaved_windows(idx, rec2_np)
    if {"v9", "v9s"} & set(VARIANTS):
        ptab9_np, pages9_np = paged_records_wide(idx, kmers, e)
    if "v10" in VARIANTS:
        s10 = int(os.environ.get("ONEHOP_S", 2))
        pages10_np, P10, gb10 = onehop_pages(idx, kmers, e, s10)
    def e_for_cap(P):
        """Smallest e whose max fine-bucket depth fits P slots."""
        for ee in range(e, SUF_BITS - 2):
            b = (kmers >> np.uint64(SUF_BITS - ee)).astype(np.int64)
            mx = int(np.bincount(b, minlength=1 << (2 * K - SUF_BITS + ee)).max())
            if mx <= P:
                return ee
        raise AssertionError("no e fits")

    ptab11_np = pages11_np = ptab12_np = pages12_np = None
    e11 = e12 = None
    if "v11" in VARIANTS:
        e11 = e_for_cap(16)
        ptab11_np, pages11_np = paged_records_wide(idx, kmers, e11, P=16)
    if "v12" in VARIANTS:
        e12 = e_for_cap(8)
        ptab12_np, pages12_np = paged_records_wide(idx, kmers, e12, P=8)

    put = jax.device_put
    t0 = time.time()
    # all tables live in one dict passed as a jit ARGUMENT: closure capture
    # would embed GBs as HLO constants (NOTES.md); only requested variants'
    # tables are uploaded (HBM budget)
    need_base = {"v0", "v1", "v2", "v3"} & set(VARIANTS)
    T = {"ftab": put(ftab)}
    if need_base:
        T["bucket_tab"] = put(tables["bucket_tab"])
        T["suffix_over"] = put(tables["suffix_over"])
        T["rec"] = put(tables["rec"])
        T["arena"] = put(tables["arena"])
    if {"v4", "v5", "v6", "v7", "v8"} & set(VARIANTS):
        T["arena2"] = put(arena2_np)
        T["rec2"] = put(rec2_np)
    if {"v4", "v5", "v6", "v8"} & set(VARIANTS):
        T.setdefault("suffix_over", put(tables["suffix_over"]))
    if ptab_np is not None:
        T["ptab"] = put(ptab_np)
        T["pages"] = put(pages_np)
    if iw_np is not None:
        T["iw"] = put(iw_np)
    if ptab9_np is not None:
        T["ptab9"] = put(ptab9_np)
        T["pages9"] = put(pages9_np)
    if pages10_np is not None:
        T["pages10"] = put(pages10_np)
    if pages11_np is not None:
        T["ptab11"] = put(ptab11_np)
        T["pages11"] = put(pages11_np)
    if pages12_np is not None:
        T["ptab12"] = put(ptab12_np)
        T["pages12"] = put(pages12_np)
    jax.block_until_ready(list(T.values())[-1])
    log(f"upload {(sum(x.nbytes for x in T.values()))/1e9:.2f} GB in {time.time()-t0:.1f}s")

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

    def probe_v4(T, b, lo, valid, depth, G=1):
        """probe_packed's front half + single-gather aligned-arena fetch."""
        W = KmerIndex._WIN
        bt = take_split(T["ftab"], b, G)
        left = bt[..., 0]
        n = bt[..., 1]
        end = left + n
        lo_u = lo.astype(jnp.uint32)
        lgw = W.bit_length() - 1
        if depth > lgw:
            suffix_flat = T["suffix_over"].reshape(-1)
            for _ in range(depth - lgw):
                half = n >> 1
                mid = left + half
                fidx = ((mid >> lgw) << (lgw + 1)) | (mid & (W - 1))
                mv = jnp.take(suffix_flat, fidx, mode="clip")
                go_right = mv < lo_u
                left = jnp.where(go_right, mid + 1, left)
                n = jnp.where(go_right, n - half - 1, half)
        r = left >> lgw
        win = take_split(T["suffix_over"], r, G)
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
        rc = take_split(T["rec2"], pos, G)
        ts = rc[..., 0].astype(jnp.uint32)
        meta = jnp.where(found, rc[..., 1].astype(jnp.uint32), jnp.uint32(0)).astype(jnp.int32)
        return fetch_aligned(T, ts, meta, found, G)

    def fetch_aligned(T, ts, meta, found, G=1):
        """Single-gather record fetch from the slot-aligned arena."""
        ra = (ts >> lga).astype(jnp.int32)
        w = take_split(T["arena2"], ra, G)
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

    def probe_v7(T, b, lo, valid):
        """paged-records probe: bucket_tab + ONE page row + aligned arena."""
        bt = jnp.take(T["ptab"], b, axis=0, mode="clip")
        pos = bt[..., 0]
        cnt = bt[..., 1]
        row = jnp.take(T["pages"], pos >> 5, axis=0, mode="clip")  # [..., 96]
        off = pos & 31
        j = jnp.arange(32, dtype=jnp.int32)
        inb = (j >= off[..., None]) & (j < (off + cnt)[..., None])
        hit = inb & (row[..., :32] == lo.astype(jnp.uint32)[..., None]) & valid[..., None]
        found = jnp.any(hit, axis=-1)
        ts = jnp.sum(jnp.where(hit, row[..., 32:64], jnp.uint32(0)), axis=-1)
        meta = jnp.sum(
            jnp.where(hit, row[..., 64:96], jnp.uint32(0)), axis=-1
        ).astype(jnp.int32)
        return fetch_aligned(T, ts, meta, found)

    def mk_paged_wide(ptab_key, pages_key, P):
        """paged-wide probe: bucket_tab + ONE page row with inline tids."""
        lgp = P.bit_length() - 1

        def f(T, b, lo, valid):
            W9 = 2 + MT
            bt = jnp.take(T[ptab_key], b, axis=0, mode="clip")
            pos = bt[..., 0]
            cnt = bt[..., 1]
            row = jnp.take(T[pages_key], pos >> lgp, axis=0, mode="clip")
            rr = row.reshape(row.shape[:-1] + (P, W9))
            off = pos & (P - 1)
            j = jnp.arange(P, dtype=jnp.int32)
            inb = (j >= off[..., None]) & (j < (off + cnt)[..., None])
            hit = inb & (rr[..., 0] == lo.astype(jnp.uint32)[..., None]) & valid[..., None]
            found = jnp.any(hit, axis=-1)
            rec = jnp.sum(jnp.where(hit[..., None], rr[..., 1:], jnp.uint32(0)), axis=-2)
            meta = rec[..., 0].astype(jnp.int32)
            count = meta >> 16
            ngv = meta & 0xFFFF
            tmask = (jnp.arange(MT, dtype=jnp.int32) < count[..., None]) & found[..., None]
            tids = jnp.where(tmask, rec[..., 1:], jnp.uint32(0))
            return found, ngv, tids, tmask

        return f

    probe_v9 = mk_paged_wide("ptab9", "pages9", 32)

    def probe_v10(T, h, lo, valid):
        """onehop probe: page id from the kmer prefix, ONE page-row gather."""
        W10 = 2 + MT
        d = gb10 - (2 * K - SUF_BITS)  # group bits borrowed from lo (may be <0)
        if d >= 0:
            g = (h.astype(jnp.int32) << d) | (
                lo >> (SUF_BITS - d)
            ).astype(jnp.int32)
        else:
            g = h.astype(jnp.int32) >> (-d)
        row = jnp.take(T["pages10"], g, axis=0, mode="clip")
        rr = row.reshape(row.shape[:-1] + (P10, W10))
        hit = (rr[..., 0] == lo.astype(jnp.uint32)[..., None]) & valid[..., None]
        found = jnp.any(hit, axis=-1)
        rec = jnp.sum(jnp.where(hit[..., None], rr[..., 1:], jnp.uint32(0)), axis=-2)
        meta = rec[..., 0].astype(jnp.int32)
        count = meta >> 16
        ngv = meta & 0xFFFF
        tmask = (jnp.arange(MT, dtype=jnp.int32) < count[..., None]) & found[..., None]
        tids = jnp.where(tmask, rec[..., 1:], jnp.uint32(0))
        return found, ngv, tids, tmask

    def probe_v8(T, b, lo, valid):
        """interleaved overlap-window probe: ftab + ONE 768B window row
        (suffix/ts/meta planes) + aligned arena."""
        W = KmerIndex._WIN
        lgw = W.bit_length() - 1
        bt = jnp.take(T["ftab"], b, axis=0, mode="clip")
        left = bt[..., 0]
        n = bt[..., 1]
        end = left + n
        lo_u = lo.astype(jnp.uint32)
        r = left >> lgw
        row = jnp.take(T["iw"], r, axis=0, mode="clip")  # [..., 6W]
        win = row[..., : 2 * W]
        j = jnp.arange(2 * W, dtype=jnp.int32)
        pos_j = (r << lgw)[..., None] + j
        hit = (
            (pos_j >= left[..., None])
            & (pos_j <= (left + n)[..., None])
            & (pos_j < end[..., None])
            & (win == lo_u[..., None])
            & valid[..., None]
        )
        found = jnp.any(hit, axis=-1)
        ts = jnp.sum(jnp.where(hit, row[..., 2 * W : 4 * W], jnp.uint32(0)), axis=-1)
        meta = jnp.sum(
            jnp.where(hit, row[..., 4 * W : 6 * W], jnp.uint32(0)), axis=-1
        ).astype(jnp.int32)
        return fetch_aligned(T, ts, meta, found)

    def mk_coarse(depth):
        def f(T, h, l, v):
            return probe_packed(T["bucket_tab"], T["suffix_over"], T["rec"],
                                T["arena"], arena_mode, depth, MT,
                                h.astype(jnp.int32), l, v)
        return f

    def mk_fine(use_packed=True, G=1):
        def f(T, h, l, v):
            b = (h.astype(jnp.int32) << e) | (l >> (SUF_BITS - e)).astype(jnp.int32)
            if use_packed:
                return probe_packed(T["ftab"], T["suffix_over"], T["rec"],
                                    T["arena"], arena_mode, fdepth, MT, b, l, v)
            return probe_v4(T, b, l, v, fdepth, G=G)
        return f

    def fine_b(h, l, ee=None):
        ee = e if ee is None else ee
        return (h.astype(jnp.int32) << ee) | (l >> (SUF_BITS - ee)).astype(jnp.int32)

    probes = {
        "v0": (mk_coarse(idx.search_depth), False),
        "v1": (mk_coarse(idx.search_depth), True),
        "v2": (mk_fine(True), False),
        "v3": (mk_fine(True), True),
        "v4": (mk_fine(False, G=1), False),
        "v5": (mk_fine(False, G=4), False),
        "v6": (mk_fine(False, G=4), True),
        "v7": (lambda T, h, l, v: probe_v7(T, fine_b(h, l), l, v), False),
        "v8": (lambda T, h, l, v: probe_v8(T, fine_b(h, l), l, v), False),
        "v9": (lambda T, h, l, v: probe_v9(T, fine_b(h, l), l, v), False),
        "v9s": (lambda T, h, l, v: probe_v9(T, fine_b(h, l), l, v), True),
        "v10": (probe_v10, False),
    }
    if pages11_np is not None:
        p11 = mk_paged_wide("ptab11", "pages11", 16)
        probes["v11"] = (
            lambda T, h, l, v: p11(T, fine_b(h, l, e11), l, v), False)
    if pages12_np is not None:
        p12 = mk_paged_wide("ptab12", "pages12", 8)
        probes["v12"] = (
            lambda T, h, l, v: p12(T, fine_b(h, l, e12), l, v), False)

    # correctness: fixed query window, checksum tuple must match v0
    def checksum(fn):
        @jax.jit
        def g(T, h, l):
            f, ng, t, m = fn(T, h, l, jnp.ones(Q, bool))
            return f.sum(), ng.sum(), t.astype(jnp.uint32).sum(), m.sum()
        return tuple(int(x) for x in g(T, hi_p[:Q], lo_p[:Q]))

    # cross-run check: pass the known-good tuple when v0 isn't in this run
    # (HBM cannot hold every layout at once)
    ref = ref_name = None
    if os.environ.get("EXPECT_CHECKSUM"):
        ref = tuple(int(x) for x in os.environ["EXPECT_CHECKSUM"].split(","))
        ref_name = "EXPECT_CHECKSUM"
    for name in VARIANTS:
        if probes[name][1]:  # sorted-input twins share the unsorted fn
            continue
        t0 = time.time()
        got = checksum(probes[name][0])
        log(f"{name} checksum {got} ({time.time()-t0:.0f}s)")
        if ref is None:
            ref, ref_name = got, name
        else:
            assert got == ref, f"{name} checksum {got} != {ref_name} {ref}"
    log("checksums agree")

    res = {"n_kmers": idx.n_kmers, "Q": Q, "e": e, "fine_depth": fdepth,
           "coarse_depth": idx.search_depth}

    def timed(fn, sorted_q):
        h_p, l_p = (shi_p, slo_p) if sorted_q else (hi_p, lo_p)

        @jax.jit
        def g(T, h, l):
            def body(c, i):
                hh = lax.dynamic_slice(h, (i,), (Q,))
                ll = lax.dynamic_slice(l, (i,), (Q,))
                f, ng, t, m = fn(T, hh, ll, jnp.ones(Q, bool))
                return (c + f.sum() + ng.sum() + m.sum()
                        + t.astype(jnp.uint32).sum().astype(jnp.int32), 0)
            c, _ = lax.scan(body, jnp.int32(0), jnp.arange(ITER))
            return c

        jax.block_until_ready(g(T, h_p, l_p))
        t0 = time.time()
        for _ in range(3):
            out = g(T, h_p, l_p)
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
