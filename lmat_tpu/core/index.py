"""Two-level sorted k-mer -> taxid-set index, TPU-resident.

This is the TPU-native replacement for the reference's SortedDb
(/root/reference/src/kmerdb/SortedDb.hpp:143-385): same *capability*
(prefix bucket -> sorted-suffix search -> taxid list) re-designed as dense
arrays so the probe is a handful of XLA gathers instead of pointer chasing:

  bucket_start int32 [n_buckets+1]  cumulative k-mer count per 2k-20-bit prefix
  suffix       uint32 [n_kmers]     low 20 bits of each k-mer, sorted per bucket
  tid_start    int32/int64 [n_kmers+1]  offsets into the taxid arena
  tid_flat     uint32 [total]       concatenated taxid lists (ascending per k-mer)
  ng           uint16 [n_kmers]     stored list length (the reference's
                                    "genome count" reported per k-mer)

Lookup: bucket = hi lane, then a fixed-depth branchless binary search over the
bucket's suffixes, then a masked gather of up to ``max_tids`` taxids.  All
shapes static; search depth = ceil(log2(max bucket size + 1)) fixed at build.

Pruning (the reference's tid_cutoff, SortedDb.cpp:296-408) happens at build:
lists longer than ``max_tids`` are reduced by rank-priority, or truncated to a
single root taxid, mirroring make_db_table semantics, so device lists are
dense with a static cap.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from .encoding import SUF_BITS, SUF_MASK


@dataclass
class KmerIndex:
    k: int
    bucket_start: np.ndarray
    suffix: np.ndarray
    tid_start: np.ndarray
    tid_flat: np.ndarray
    ng: np.ndarray
    max_tids: int
    search_depth: int
    conv_table: object = None  # uint32[65536] when the arena stores 16-bit ids

    @property
    def n_kmers(self) -> int:
        return int(self.suffix.shape[0])

    # ---------------- build -------------------------------------------------

    @classmethod
    def build(cls, kmers: np.ndarray, tid_lists, k: int, max_tids: int = 16) -> "KmerIndex":
        """Build from parallel (kmers uint64 [N], list-of-ascending-tid-lists).

        kmers need not be sorted; they must be unique.
        """
        kmers = np.asarray(kmers, dtype=np.uint64)
        order = np.argsort(kmers, kind="stable")
        kmers = kmers[order]
        n_buckets = 1 << (2 * k - SUF_BITS)
        bucket = (kmers >> np.uint64(SUF_BITS)).astype(np.int64)
        bucket_start = np.zeros(n_buckets + 1, np.int64)
        np.add.at(bucket_start, bucket + 1, 1)
        bucket_start = np.cumsum(bucket_start)
        suffix = (kmers & np.uint64(SUF_MASK)).astype(np.uint32)

        lists = [np.asarray(tid_lists[i], np.uint32) for i in order]
        ng = np.array([min(len(l), 0xFFFF) for l in lists], np.uint16)
        tid_start = np.zeros(len(lists) + 1, np.int64)
        tid_start[1:] = np.cumsum([len(l) for l in lists])
        tid_flat = (
            np.concatenate(lists) if lists else np.zeros(0, np.uint32)
        ).astype(np.uint32)

        max_bucket = int(np.max(np.diff(bucket_start))) if kmers.size else 0
        depth = max(1, int(np.ceil(np.log2(max_bucket + 1)))) if max_bucket else 1
        amax = int(ng.max()) if ng.size else 0
        if amax > max_tids:
            raise ValueError(
                f"a k-mer stores {amax} taxids > max_tids={max_tids}; "
                "prune at DB build"
            )
        dtype = np.int32 if tid_start[-1] < 2**31 else np.int64
        return cls(
            k=k,
            bucket_start=bucket_start.astype(
                np.int32 if kmers.size < 2**31 else np.int64
            ),
            suffix=suffix,
            tid_start=tid_start.astype(dtype),
            tid_flat=tid_flat,
            ng=ng,
            max_tids=max_tids,
            search_depth=depth,
        )

    @classmethod
    def build_flat(cls, kmers: np.ndarray, tid_flat: np.ndarray, counts,
                   k: int, max_tids: int = 16) -> "KmerIndex":
        """Build from flat arrays: kmers ASCENDING u64 [N], concatenated
        taxid lists u32, per-k-mer counts — the fully vectorized path (no
        per-k-mer Python objects)."""
        kmers = np.asarray(kmers, np.uint64)
        counts = np.asarray(counts, np.int64)
        assert kmers.ndim == 1 and counts.shape == kmers.shape
        if kmers.size > 1:
            assert (kmers[1:] > kmers[:-1]).all(), "kmers must be ascending/unique"
        amax = int(counts.max()) if counts.size else 0
        if amax > max_tids:
            raise ValueError(
                f"a k-mer stores {amax} taxids > max_tids={max_tids}; prune at DB build"
            )
        n_buckets = 1 << (2 * k - SUF_BITS)
        bucket = (kmers >> np.uint64(SUF_BITS)).astype(np.int64)
        bucket_start = np.zeros(n_buckets + 1, np.int64)
        np.add.at(bucket_start, bucket + 1, 1)
        bucket_start = np.cumsum(bucket_start)
        suffix = (kmers & np.uint64(SUF_MASK)).astype(np.uint32)
        tid_start = np.zeros(kmers.size + 1, np.int64)
        tid_start[1:] = np.cumsum(counts)
        max_bucket = int(np.max(np.diff(bucket_start))) if kmers.size else 0
        depth = max(1, int(np.ceil(np.log2(max_bucket + 1)))) if max_bucket else 1
        dtype = np.int32 if tid_start[-1] < 2**31 else np.int64
        return cls(
            k=k,
            bucket_start=bucket_start.astype(
                np.int32 if kmers.size < 2**31 else np.int64
            ),
            suffix=suffix,
            tid_start=tid_start.astype(dtype),
            tid_flat=np.asarray(tid_flat, np.uint32),
            ng=np.minimum(counts, 0xFFFF).astype(np.uint16),
            max_tids=max_tids,
            search_depth=depth,
        )

    # ---------------- host lookup (oracle/testing) --------------------------

    def lookup_host(self, kmer: int):
        """Return (ng, tids ndarray) or None. NumPy reference implementation."""
        b = int(kmer) >> SUF_BITS
        s, e = int(self.bucket_start[b]), int(self.bucket_start[b + 1])
        if s == e:
            return None
        lo = np.uint32(int(kmer) & SUF_MASK)
        pos = s + int(np.searchsorted(self.suffix[s:e], lo))
        if pos >= e or self.suffix[pos] != lo:
            return None
        ts, te = int(self.tid_start[pos]), int(self.tid_start[pos + 1])
        tids = self.tid_flat[ts:te]
        if self.conv_table is not None:
            tids = self.conv_table[tids]
        return int(self.ng[pos]), tids

    # ---------------- persistence ------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "bucket_start.npy"), self.bucket_start)
        np.save(os.path.join(path, "suffix.npy"), self.suffix)
        np.save(os.path.join(path, "tid_start.npy"), self.tid_start)
        np.save(os.path.join(path, "tid_flat.npy"), self.tid_flat)
        np.save(os.path.join(path, "ng.npy"), self.ng)
        if self.conv_table is not None:
            np.save(os.path.join(path, "conv_table.npy"), self.conv_table)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {
                    "k": self.k,
                    "max_tids": self.max_tids,
                    "search_depth": self.search_depth,
                    "format": "lmat_tpu.index.v1",
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "KmerIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(
            k=meta["k"],
            bucket_start=np.load(os.path.join(path, "bucket_start.npy")),
            suffix=np.load(os.path.join(path, "suffix.npy")),
            tid_start=np.load(os.path.join(path, "tid_start.npy")),
            tid_flat=np.load(os.path.join(path, "tid_flat.npy")),
            ng=np.load(os.path.join(path, "ng.npy")),
            max_tids=meta["max_tids"],
            search_depth=meta["search_depth"],
            conv_table=(
                np.load(os.path.join(path, "conv_table.npy"))
                if os.path.exists(os.path.join(path, "conv_table.npy"))
                else None
            ),
        )

    # ---------------- device ------------------------------------------------

    # suffix window width: TPU row gathers cost the same for widths 8..64,
    # so a 32-wide window replaces the last 5 binary-search steps for free
    _WIN = 32
    # dense per-k-mer taxid rows are one row gather instead of max_tids
    # element gathers; cap the padding blow-up at this many bytes
    _DENSE_LIMIT = 2 << 30

    def packed_tables(self, dense_lists: bool | None = None):
        """Repack into TPU-friendly row tables (host numpy).

        XLA-TPU gathers run ~8x faster when each gathered item is a small
        contiguous row of a 2D table than as independent element gathers, so
        the device layout differs from the host layout:

          bucket_tab  [n_buckets, 2] int32  (start, count) per prefix
          suffix_over [rows, 64]    uint32  sorted suffixes in OVERLAPPING
                                    windows (row r covers positions
                                    [32r, 32r+64)) so any <=32-wide range is
                                    one row gather; 0xFFFFFFFF pad
          arena       dense: [n_kmers, 1+max_tids] uint32 rows of
                      (count<<16|ng, tids...) — the whole per-k-mer record
                      in one gather
                      windowed: flat taxid arena in [rows, A] aligned rows +
                      rec [n_kmers, 2] int32 (tid_start, count<<16|ng)

        The windowed arena is used when dense rows would exceed
        ``_DENSE_LIMIT`` bytes.  Returns (tables dict, arena_mode tuple).
        """
        W = self._WIN
        N = self.n_kmers
        MT = self.max_tids
        bs = self.bucket_start.astype(np.int64)
        bucket_tab = np.stack(
            [bs[:-1], bs[1:] - bs[:-1]], axis=1
        ).astype(np.int32)

        rows = (N + W - 1) // W + 1
        flat = np.full(((rows + 1) * W,), 0xFFFFFFFF, np.uint32)
        flat[:N] = self.suffix
        idx2 = np.arange(rows)[:, None] * W + np.arange(2 * W)[None, :]
        suffix_over = flat[idx2]

        ts = self.tid_start.astype(np.int64)
        count = (ts[1:] - ts[:-1]).astype(np.int64)
        meta = (count.astype(np.uint32) << 16) | self.ng.astype(np.uint32)

        if dense_lists is None:
            dense_lists = N * (MT + 1) * 4 <= self._DENSE_LIMIT
        if dense_lists:
            arena = np.zeros((max(N, 1), 1 + MT), np.uint32)
            # col 0 = packed meta; cols 1.. = taxid list (padded with 0)
            cols = np.arange(MT)[None, :]
            msk = cols < count[:, None] if N else np.zeros((1, MT), bool)
            idx = np.minimum(ts[:-1, None] + cols, max(len(self.tid_flat) - 1, 0))
            if N:
                arena[:N, 0] = meta
                if len(self.tid_flat):  # all-empty lists: slots stay zero
                    arena[:N, 1:] = np.where(msk, self.tid_flat[idx], 0)
            rec = np.zeros((1, 2), np.int32)  # unused in dense mode
            arena_shape = ("dense", 0)
        else:
            A = 1
            while A < MT:
                A *= 2
            arows = (len(self.tid_flat) + A - 1) // A + 1
            arena = np.zeros((arows * A,), np.uint32)
            arena[: len(self.tid_flat)] = self.tid_flat
            arena = arena.reshape(arows, A)
            # uint32 offsets: arenas between 2^31 and 2^32 entries (the
            # 1.7B-kmer marker DB at ~2 tids/kmer) would wrap int32.  The
            # device also casts the row index (ts >> log2(A)) to int32, so
            # for A == 1 the offset itself must stay below 2^31.
            assert ts[-1] < min(2**32, 2**31 * A), (
                "arena too large for uint32/int32-row addressing: shard the index"
            )
            rec = np.stack(
                [ts[:-1].astype(np.uint32), meta], axis=1
            )
            if N == 0:
                rec = np.zeros((1, 2), np.uint32)
            arena_shape = ("window", A)

        tables = {
            "bucket_tab": bucket_tab, "suffix_over": suffix_over,
            "rec": rec, "arena": arena,
        }
        return tables, arena_shape

    # fully-fused bucket-row layout: ONE row gather per query fetches bucket
    # b's complete records — R slots of (suffix, meta, taxids...) — so the
    # bucket_tab gather, every binary-search step AND the arena gather all
    # disappear.  Round-4 refinement: like the paged layout, the fused
    # buckets borrow e extra suffix bits so R collapses to 8 (320B rows) —
    # narrower rows cut both gather bytes and the O(R) record select
    # (measured 9.4 vs 10.7 ms/2048-read batch at bench shapes).  The cost
    # is padding: ~R/lambda slots per k-mer, so this is the SMALL-DB speed
    # tier (the paged layout holds capacity DBs at ~1.1x padding).
    _FUSED_RMAX = 128
    _FUSED_RTARGET = 8
    _FUSED_FINE_LIMIT = 3 << 30
    _FUSED_AUTO_LIMIT = 3 << 30

    def fused_tables(self):
        """Repack into the fused bucket-row layout, or None when the geometry
        does not fit (deep buckets past _FUSED_RMAX at e=0 with the fine
        split over _FUSED_FINE_LIMIT bytes — the one-hot record select costs
        O(R) VPU work per query, so very deep buckets lose even when memory
        allows).

        Returns (fused_rows [nb, R*(2+MT)] uint32, R, e): fine bucket b's
        slot s holds (suffix, count<<16|ng, tids... zero-padded); empty
        slots have suffix 0xFFFFFFFF (real suffixes are < 2^SUF_BITS).
        Requires the dense-arena invariant (lists <= max_tids, enforced at
        build).  16-bit compacted arenas work unchanged: tids here are the
        same ids the conv_table translates.
        """
        bs = self.bucket_start.astype(np.int64)
        bcounts = np.diff(bs)
        n_coarse = len(bcounts)
        max_b = int(bcounts.max()) if bcounts.size else 0
        MT = self.max_tids
        W = 2 + MT

        N = self.n_kmers

        def fine_split():
            """Fine-bucket split to R=_FUSED_RTARGET (one histogram at ~0.5
            mean occupancy folded down, as in paged_tables); returns
            (counts, e) or None when no split fits _FUSED_FINE_LIMIT."""
            R = self._FUSED_RTARGET
            e = 0
            hi_all = np.repeat(np.arange(n_coarse, dtype=np.int64), bcounts)
            lo_all = self.suffix.astype(np.int64)
            while N / max(n_coarse << e, 1) > 0.5 and e < SUF_BITS - 2:
                e += 1
            # the byte-limit check must precede every bincount: the int64
            # histogram is (n_coarse<<e)*8 B and on skewed DBs a post-hoc
            # check would let a transient multi-GB allocation OOM the host
            if (n_coarse << e) * R * W * 4 > self._FUSED_FINE_LIMIT:
                return None
            fb = (hi_all << e) | (lo_all >> (SUF_BITS - e))
            counts = np.bincount(fb, minlength=n_coarse << e)
            while counts.size and counts.max() > R:
                if (
                    e >= SUF_BITS - 2
                    or (n_coarse << (e + 1)) > (1 << 31)
                    or (n_coarse << (e + 1)) * R * W * 4 > self._FUSED_FINE_LIMIT
                ):
                    return None
                e += 1
                fb = (hi_all << e) | (lo_all >> (SUF_BITS - e))
                counts = np.bincount(fb, minlength=n_coarse << e)
            while e > 0:
                folded = counts.reshape(-1, 2).sum(axis=1)
                if folded.size and folded.max() > R:
                    break
                counts, e = folded, e - 1
            if (n_coarse << e) * R * W * 4 > self._FUSED_FINE_LIMIT:
                return None
            return counts, e

        # fine-R8 split first (round-5 revision): a CONTROLLED interleaved
        # step timing (value-fetch forced) measures the fine-R8 step at
        # 14.8 ms/batch vs classic R16's 16.4 at the 4M bench DB — the r4
        # e2e comparison that said otherwise mixed tunnel-congestion
        # windows.  Narrower rows win ~10% at ~4x the table bytes (2.7 GB
        # vs 0.7 GB at 4M k-mers, still inside _FUSED_FINE_LIMIT); the
        # classic coarse layout stays as the fallback when the fine split
        # exceeds the limit but the classic one fits.
        fine = fine_split()
        if fine is not None:
            counts, e = fine
            R = self._FUSED_RTARGET
        else:
            e = 0
            counts = bcounts
            R = 8
            while R < max_b:
                R *= 2
            if max_b > self._FUSED_RMAX or n_coarse * R * W * 4 > self._FUSED_FINE_LIMIT:
                return None
        nb = n_coarse << e
        rows = np.zeros((nb, R, W), np.uint32)
        rows[:, :, 0] = 0xFFFFFFFF
        # scatter each k-mer's record into (its fine bucket, rank-in-bucket)
        fbs = np.zeros(nb + 1, np.int64)
        np.cumsum(counts, out=fbs[1:])
        bi = np.repeat(np.arange(nb), counts)
        col = np.arange(self.n_kmers) - np.repeat(fbs[:-1], counts)
        rows[bi, col, 0] = self.suffix
        ts = self.tid_start.astype(np.int64)
        count = (ts[1:] - ts[:-1]).astype(np.int64)
        rows[bi, col, 1] = (count.astype(np.uint32) << 16) | self.ng.astype(np.uint32)
        cols = np.arange(MT)[None, :]
        msk = cols < count[:, None]
        idx = np.minimum(ts[:-1, None] + cols, max(len(self.tid_flat) - 1, 0))
        if len(self.tid_flat):  # all-empty lists: slots stay zero
            rows[bi[:, None], col[:, None], 2 + cols] = np.where(
                msk, self.tid_flat[idx], 0
            )
        return rows.reshape(nb, R * W), R, e

    # paged layout: the capacity-scale probe (measured round 4,
    # tools/profile_r4.py at 100M k-mers on v5e).  Two row gathers per
    # query — a fine-bucket (pos,count) pair and ONE page row holding the
    # bucket's complete inline records — replace the windowed layout's
    # 3-gather + binary-search chain.  Why the page is SMALL (P slots):
    # gather stages cost max(Q * ~15ns issue, bytes / ~50GB/s bandwidth)
    # (measured: 32-slot 1.28KB pages ran 21.4M lookups/s bandwidth-bound;
    # 2.56KB one-gather rows 18.4M; 4-gather chains ~20M issue-bound), so
    # the optimum is the fewest stages whose rows stay under the issue
    # break-even width.  Fine buckets use e extra suffix bits so the
    # deepest bucket fits one page; count-class packing keeps padding
    # ~1.1-1.3x (vs the fused layout's next-pow2-per-bucket blow-up).
    # Memory ~ (2+max_tids)*4*slack B/kmer: the capacity-DB speed tier
    # (windowed remains the minimum-memory tier).  P=8 measured fastest at
    # 100M k-mers (32.0M lookups/s vs 26.8M at P=16 vs 21.4M at P=32,
    # tools/profile_r4.py v12/v11/v9) at equal total memory.
    _PAGED_SLOTS = 8
    # fine-bucket cap for the paged layout: bounds the transient build-time
    # host histogram at nb*8 = 4 GB and the ptab at nb*4 = 2 GB; DBs that
    # need more fine buckets than this should be sharded first
    _PAGED_NB_LIMIT = 1 << 29
    _PAGED_AUTO_LIMIT = 12 << 30

    def paged_tables(self, P: int | None = None, e: int | None = None):
        """Repack into the paged capacity layout (host numpy).

        Returns (ptab [nb] uint32, pages [n_pages, P*(2+MT)] uint32, e, P)
        or None when no e <= SUF_BITS-2 makes every fine bucket fit P slots
        (pathological: >P identical (hi, lo-prefix) k-mers at max e).
        A forced ``e`` pins the fine-bucket split (the sharded router needs
        one uniform split across shards); it must satisfy the depth bound.

          ptab[b]  = slot_pos << 4 | (count-1) packed in one u32 (count <=
                     P <= 16 by construction; empty bucket = 0xFFFFFFFF);
                     halves the fine-bucket table, which dominates paged
                     memory at P=8 (e grows to keep max depth <= P).
                     Caps slot_pos < 2^28 — shard the index above ~250M
                     k-mers per device (the router does).
          page row = P slots of (lo u32, count<<16|ng, tids[MT] zero-padded);
                     empty slots hold lo = 0xFFFFFFFF (real lo < 2^SUF_BITS)

        Buckets are packed whole into pages by count class (a bucket never
        straddles a page), so the probe is ptab gather -> page-row gather ->
        in-row one-hot select.  Reference capability match: SortedDb's
        two-level search (/root/reference/src/kmerdb/SortedDb.hpp:279-385)
        collapsed to a fixed 2-gather chain.
        """
        if P is None:
            P = self._PAGED_SLOTS
        assert P <= 16, "packed ptab stores count-1 in 4 bits"
        assert P & (P - 1) == 0, (
            "probe_paged decodes page/offset with shift/mask: P must be a "
            "power of two"
        )
        N = self.n_kmers
        MT = self.max_tids
        W = 2 + MT
        # recover sorted k-mer keys from the index's own arrays; the coarse
        # bucket count comes from the table itself so shard sub-indexes
        # (bucket ranges) page correctly too
        bs = self.bucket_start.astype(np.int64)
        bcounts = np.diff(bs)
        n_coarse = len(bcounts)
        hi_all = np.repeat(np.arange(n_coarse, dtype=np.int64), bcounts)
        lo_all = self.suffix.astype(np.int64)

        def split_at(ee):
            nb = n_coarse << ee
            # bound the transient int64 histogram (nb*8 B) and the dense
            # nb-sized pos/ptab arrays, not just the entry count: a skewed
            # DB driving e up would otherwise OOM the host inside bincount
            if nb > self._PAGED_NB_LIMIT:
                return None, None
            fb = (hi_all << ee) | (lo_all >> (SUF_BITS - ee))
            return fb, np.bincount(fb, minlength=nb)

        if e is not None:
            fb, counts = split_at(e)
            if counts is None or (counts.max() if counts.size else 0) > P:
                return None
        else:
            # one fine histogram (mean occupancy ~0.5) + cheap pairwise
            # folds down to the smallest e whose deepest bucket fits P —
            # O(N) once instead of one full rescan per candidate e
            e = 0
            while N / max(n_coarse << e, 1) > 0.5 and e < SUF_BITS - 2:
                e += 1
            fb, counts = split_at(e)
            while counts is not None and counts.size and counts.max() > P:
                # skewed tail: keep splitting (rescan, rare)
                if e >= SUF_BITS - 2:
                    return None
                e += 1
                fb, counts = split_at(e)
            if counts is None:
                return None
            e_fine = e
            while e > 0:
                folded = counts.reshape(-1, 2).sum(axis=1)
                if folded.size and folded.max() > P:
                    break
                counts, e = folded, e - 1
            if e != e_fine:
                fb = fb >> (e_fine - e)
        nb = n_coarse << e

        # count-class packing: buckets with count c go P//c per page
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
        fbs = np.zeros(nb + 1, np.int64)
        np.cumsum(counts, out=fbs[1:])
        rank = np.arange(N) - np.repeat(fbs[:-1], counts)
        slot = np.repeat(pos, counts) + rank
        pg, off = slot // P, slot % P
        pages[pg, off, 0] = self.suffix
        ts = self.tid_start.astype(np.int64)
        cnt_k = np.diff(ts)
        pages[pg, off, 1] = (cnt_k.astype(np.uint32) << 16) | self.ng.astype(
            np.uint32
        )
        cols = np.arange(MT)[None, :]
        msk = cols < cnt_k[:, None]
        src = np.minimum(ts[:-1, None] + cols, max(len(self.tid_flat) - 1, 0))
        if len(self.tid_flat):  # all-empty lists: slots stay zero
            pages[pg[:, None], off[:, None], 2 + cols] = np.where(
                msk, self.tid_flat[src], 0
            )
        if pos.size and int(pos.max()) >= (1 << 28):
            return None  # packed-pos overflow: shard the index first
        packed = (pos.astype(np.uint32) << 4) | (
            np.maximum(counts, 1).astype(np.uint32) - 1
        )
        if bool(np.any((counts > 0) & (packed == np.uint32(0xFFFFFFFF)))):
            # a full P=16 bucket at slot_pos 2^28-1 would alias the
            # empty-bucket sentinel and make its k-mers unfindable
            return None
        ptab = np.where(counts > 0, packed, np.uint32(0xFFFFFFFF)).astype(
            np.uint32
        )
        return ptab, pages.reshape(max(page_base, 1), P * W), e, P

    def to_device(self, device=None, dense_lists: bool | None = None,
                  layout: str = "auto"):
        """Upload the index to the device in one of two probe layouts.

        layout:
          "auto"   — "fused" when the fused table fits _FUSED_AUTO_LIMIT
                     bytes and the geometry allows it; else "paged" when its
                     table fits _PAGED_AUTO_LIMIT; else "window"
          "fused"  — single-gather bucket-row probe (fast, padded: see
                     fused_tables); raises if the geometry does not fit
          "paged"  — 2-gather capacity probe with inline records (see
                     paged_tables); the >=100M-k-mer speed tier
          "window" — lean 3-gather layout (bucket pair + overlapping suffix
                     window + record row); the minimum-memory layout
        """
        import jax

        if layout not in ("auto", "fused", "paged", "window"):
            raise ValueError(
                f"unknown layout {layout!r}: use auto|fused|paged|window"
            )
        put = (lambda x: jax.device_put(x, device)) if device else jax.device_put
        fused = None
        paged = None
        if layout == "fused":
            fused = self.fused_tables()
            if fused is None:
                raise ValueError("index geometry does not fit the fused layout")
        elif layout == "paged":
            paged = self.paged_tables()
            if paged is None:
                raise ValueError("index geometry does not fit the paged layout")
        elif layout == "auto" and dense_lists is None:
            # an explicit dense_lists choice pins the packed layout (callers
            # asking for a specific arena mode want that mode exercised).
            # auto order: fused first at small scale, then paged, then the
            # minimum-memory windowed fallback.  Round-5 note: an e2e A/B
            # briefly suggested paged wins at bench scale too, but a
            # CONTROLLED in-process interleaved step timing (value-fetch
            # forced; block_until_ready does not block on the remote
            # backend) settles it — fused 16.5 ms vs paged 18.4 ms per
            # 2048-read batch at the 4M-k-mer DB; the e2e split was tunnel
            # -window variance.  At capacity the order flips (paged 29.6M
            # vs windowed 10.3M lookups/s at 100M k-mers, SCALE_r05) and
            # fused no longer fits, which is exactly what the limits encode.
            n_coarse = self.bucket_start.shape[0] - 1
            counts_est = np.diff(self.bucket_start.astype(np.int64))
            max_b = int(counts_est.max()) if counts_est.size else 0
            W_est = 2 + self.max_tids
            # fused_tables prefers the fine-R8 split (round 5), so the
            # gate models BOTH variants: attempt fused when either the
            # fine-R8 estimate (nb at ~0.5 occupancy) or the classic
            # fallback fits — the builder enforces the real limits
            nb_est = n_coarse
            while self.n_kmers / max(nb_est, 1) > 0.5 and nb_est < (1 << 31):
                nb_est *= 2
            fine_bytes = nb_est * self._FUSED_RTARGET * W_est * 4
            R_est = 8
            while R_est < max_b:
                R_est *= 2
            classic_ok = (
                max_b <= self._FUSED_RMAX
                and n_coarse * R_est * W_est * 4 <= self._FUSED_AUTO_LIMIT
            )
            if fine_bytes <= self._FUSED_AUTO_LIMIT or classic_ok:
                fused = self.fused_tables()
            if fused is None:
                # paged slack is ~1.1-1.3x; 1.5x bounds the pre-build
                # estimate, and the ACTUAL table bytes (ptab can grow when
                # one deep bucket forces a fine split) gate the decision
                est = self.n_kmers * (2 + self.max_tids) * 4 * 1.5
                if est <= self._PAGED_AUTO_LIMIT:
                    paged = self.paged_tables()
                    if paged is not None:
                        total = paged[0].nbytes + paged[1].nbytes
                        if total > self._PAGED_AUTO_LIMIT:
                            paged = None
        if paged is not None:
            ptab, pages, pe, pp = paged
            return DeviceIndex(
                k=self.k,
                bucket_tab=None,
                suffix_over=None,
                rec=None,
                arena=None,
                max_tids=self.max_tids,
                search_depth=self.search_depth,
                arena_mode=("paged", pp, pe),
                conv_table=put(self.conv_table) if self.conv_table is not None else None,
                paged_tab=put(ptab),
                paged_pages=put(pages),
            )
        if fused is not None:
            fused_rows, R, fe = fused
            return DeviceIndex(
                k=self.k,
                bucket_tab=None,
                suffix_over=None,
                rec=None,
                arena=None,
                max_tids=self.max_tids,
                search_depth=self.search_depth,
                arena_mode=("fused", R, fe),
                conv_table=put(self.conv_table) if self.conv_table is not None else None,
                fused_rows=put(fused_rows),
                fused_r=R,
                fused_e=fe,
            )
        tables, arena_shape = self.packed_tables(dense_lists)
        return DeviceIndex(
            k=self.k,
            bucket_tab=put(tables["bucket_tab"]),
            suffix_over=put(tables["suffix_over"]),
            rec=put(tables["rec"]),
            arena=put(tables["arena"]),
            max_tids=self.max_tids,
            search_depth=self.search_depth,
            arena_mode=arena_shape,
            conv_table=put(self.conv_table) if self.conv_table is not None else None,
        )


@dataclass
class DeviceIndex:
    """Device-resident row tables + the XLA probe (see KmerIndex.to_device).

    Registered as a jax pytree so it can be passed as a jit ARGUMENT:
    closure-capturing multi-hundred-MB tables embeds them as HLO constants,
    which bloats programs and breaks remote-compile size limits."""

    k: int
    bucket_tab: object
    suffix_over: object
    rec: object
    arena: object
    max_tids: int
    search_depth: int
    arena_mode: tuple = ("dense", 0)
    conv_table: object = None
    fused_rows: object = None  # fused layout (see KmerIndex.fused_tables)
    fused_r: int = 0
    fused_e: int = 0           # fine-bucket bits of the fused layout
    paged_tab: object = None   # paged layout (see KmerIndex.paged_tables)
    paged_pages: object = None

    def lookup(self, hi, lo, valid):
        """Probe a batch of k-mers.

        hi, lo: uint32 [...]; valid: bool [...].
        Returns (found bool, ng int32, tids uint32 [..., max_tids],
                 tmask bool [..., max_tids]).
        """
        import jax.numpy as jnp

        if self.paged_tab is not None:
            found, ngv, tids, tmask = probe_paged(
                self.paged_tab, self.paged_pages, self.arena_mode[1],
                self.arena_mode[2], self.max_tids,
                hi.astype(jnp.int32), lo, valid,
            )
        elif self.fused_rows is not None:
            found, ngv, tids, tmask = probe_fused(
                self.fused_rows, self.fused_r, self.fused_e, self.max_tids,
                hi.astype(jnp.int32), lo, valid,
            )
        else:
            found, ngv, tids, tmask = probe_packed(
                self.bucket_tab, self.suffix_over, self.rec, self.arena,
                self.arena_mode, self.search_depth, self.max_tids,
                hi.astype(jnp.int32), lo, valid,
            )
        if self.conv_table is not None:
            # 16-bit compacted arena: convert back through the id table
            tids = jnp.take(self.conv_table, tids.astype(jnp.int32), mode="clip")
            tids = jnp.where(tmask, tids, jnp.uint32(0))
        return found, ngv, tids, tmask


def _di_flatten(d):
    children = (d.bucket_tab, d.suffix_over, d.rec, d.arena, d.conv_table,
                d.fused_rows, d.paged_tab, d.paged_pages)
    aux = (d.k, d.max_tids, d.search_depth, d.arena_mode, d.fused_r, d.fused_e)
    return children, aux


def _di_unflatten(aux, children):
    k, max_tids, search_depth, arena_mode, fused_r, fused_e = aux
    (bucket_tab, suffix_over, rec, arena, conv_table, fused_rows,
     paged_tab, paged_pages) = children
    return DeviceIndex(
        k=k, bucket_tab=bucket_tab, suffix_over=suffix_over, rec=rec,
        arena=arena, max_tids=max_tids, search_depth=search_depth,
        arena_mode=arena_mode, conv_table=conv_table,
        fused_rows=fused_rows, fused_r=fused_r, fused_e=fused_e,
        paged_tab=paged_tab, paged_pages=paged_pages,
    )


def _register_device_index():
    import jax

    jax.tree_util.register_pytree_node(DeviceIndex, _di_flatten, _di_unflatten)


try:  # jax is always present in this environment; guard for doc tooling
    _register_device_index()
except ImportError:  # pragma: no cover
    pass


def probe_packed(bucket_tab, suffix_over, rec, arena, arena_mode, search_depth,
                 max_tids, b, lo, valid):
    """Row-table probe shared by the single-chip DeviceIndex and the
    shard-local half of the all-to-all router: three row gathers per query
    in the dense layout (bucket pair, suffix window, k-mer record row).

    b: int32 bucket id [...] (already shard-local for sharded tables);
    lo: uint32 suffix; valid: bool.  See KmerIndex.packed_tables for layout.
    """
    import jax.numpy as jnp

    W = KmerIndex._WIN
    bt = jnp.take(bucket_tab, b, axis=0, mode="clip")  # [..., 2]
    left = bt[..., 0]
    n = bt[..., 1]
    end = left + n  # bucket end: matches never live at/past it

    # branchless lower-bound steps until the range fits one window; element
    # positions map into the overlapping-row layout as (p>>lgw)*2W + p%W
    lo_u = lo.astype(jnp.uint32)
    lgw = W.bit_length() - 1
    if search_depth > lgw:
        suffix_flat = suffix_over.reshape(-1)
        for _ in range(search_depth - lgw):
            half = n >> 1
            mid = left + half
            fidx = ((mid >> lgw) << (lgw + 1)) | (mid & (W - 1))
            mv = jnp.take(suffix_flat, fidx, mode="clip")
            go_right = mv < lo_u
            left = jnp.where(go_right, mid + 1, left)
            n = jnp.where(go_right, n - half - 1, half)

    # lower-bound invariant: the answer lies in [left, left+n] INCLUSIVE
    # (n <= W after the steps above), clamped to the bucket; one overlapping
    # row covers [32r, 32r+63] ⊇ [left, left+W]
    r = left >> lgw
    win = jnp.take(suffix_over, r, axis=0, mode="clip")  # [..., 2W]
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

    return _fetch_record(rec, arena, arena_mode, max_tids, pos, found)


def _fetch_record(rec, arena, arena_mode, max_tids, pos, found):
    """Fetch the (meta | taxid list) record for k-mer id ``pos`` (one row
    gather in the dense layout); shared by both probe variants."""
    import jax.numpy as jnp

    MT = max_tids
    if arena_mode[0] == "dense":
        row = jnp.take(arena, pos, axis=0, mode="clip")  # [..., 1+MT]
        meta = jnp.where(found, row[..., 0], jnp.uint32(0)).astype(jnp.int32)
        rows = row[..., 1:]
    else:
        rc = jnp.take(rec, pos, axis=0, mode="clip")  # [..., 2]
        # uint32 offsets (arenas up to 4.3B entries); the row index ts>>lga
        # fits int32 for take
        ts = rc[..., 0].astype(jnp.uint32)
        meta = jnp.where(found, rc[..., 1].astype(jnp.uint32), jnp.uint32(0)).astype(jnp.int32)
        A = arena_mode[1]
        lga = A.bit_length() - 1
        ra = (ts >> lga).astype(jnp.int32)
        w = jnp.concatenate(
            [jnp.take(arena, ra, axis=0, mode="clip"),
             jnp.take(arena, ra + 1, axis=0, mode="clip")],
            axis=-1,
        )  # [..., 2A]
        sh = (ts & (A - 1)).astype(jnp.int32)
        rows = jnp.zeros(w.shape[:-1] + (MT,), w.dtype)
        for s in range(A):
            rows = jnp.where((sh == s)[..., None], w[..., s : s + MT], rows)
    count = meta >> 16
    ngv = meta & 0xFFFF
    tmask = (jnp.arange(MT, dtype=jnp.int32) < count[..., None]) & found[..., None]
    tids = jnp.where(tmask, rows, jnp.uint32(0))
    return found, ngv, tids, tmask


def probe_paged(ptab, pages, P, e, max_tids, b, lo, valid):
    """Paged capacity probe: fine-bucket (pos,count) gather + ONE small page
    row with inline records (see KmerIndex.paged_tables).  2 gather stages —
    the measured optimum at >=100M k-mers where the windowed chain is
    issue-bound and wide one-gather rows are bandwidth-bound
    (tools/profile_r4.py).

    b: int32 coarse bucket id (hi lane) [...]; lo: uint32 suffix; valid: bool.
    """
    import jax.numpy as jnp

    MT = max_tids
    W = 2 + MT
    lgp = P.bit_length() - 1
    fb = (b << e) | (lo >> (SUF_BITS - e)).astype(jnp.int32)
    bt = jnp.take(ptab, fb, mode="clip")  # [...] packed u32
    empty = bt == jnp.uint32(0xFFFFFFFF)
    pos = jnp.where(empty, jnp.uint32(0), bt >> 4).astype(jnp.int32)
    cnt = jnp.where(
        empty, jnp.int32(0), (bt & jnp.uint32(0xF)).astype(jnp.int32) + 1
    )
    row = jnp.take(pages, pos >> lgp, axis=0, mode="clip")  # [..., P*W]
    rr = row.reshape(row.shape[:-1] + (P, W))
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


def probe_fused(fused_rows, R, e, max_tids, b, lo, valid):
    """Fused bucket-row probe: ONE row gather per query fetches fine bucket
    b's complete records — R slots of (suffix, meta, taxids...) — so no
    bucket_tab gather, no binary-search steps and no arena gather remain
    (vs probe_packed's three gathers).  Fine buckets (e extra suffix bits)
    keep R at 8 = 320B rows, under the gather-issue break-even width
    (NOTES.md r4 cost model).

    b: int32 coarse bucket id [...]; lo: uint32 suffix; valid: bool.
    """
    import jax.numpy as jnp

    MT = max_tids
    W = 2 + MT
    # issue the gather as 4 independent slices on the classic coarse layout:
    # the gather engine overlaps independent gathers ~1.5x there (64M vs 44M
    # rows/s, tools/profile_r3i.py).  The fine-split R=8 layout measured
    # FASTER unsplit (9.4 ms vs 10.7 for split R16 at bench shapes) — narrow
    # rows are already under the issue break-even width, so splitting only
    # fragments the stream.
    G = 1 if e else 4
    if e:
        b = (b << e) | (lo >> (SUF_BITS - e)).astype(jnp.int32)
    shape = b.shape
    Q = 1
    for s in shape:
        Q *= s
    bf = b.reshape(Q)
    pad = (-Q) % G
    if pad:
        bf = jnp.concatenate([bf, jnp.zeros(pad, bf.dtype)])
    parts = [
        jnp.take(fused_rows, g, axis=0, mode="clip")
        for g in bf.reshape(G, (Q + pad) // G)
    ]
    row = jnp.concatenate(parts, axis=0)
    if pad:
        row = row[:Q]
    rr = row.reshape(shape + (R, W))
    # suffixes are unique within a bucket and empty slots hold 0xFFFFFFFF
    # (real suffixes are < 2^SUF_BITS), so `hit` is one-hot
    hit = (rr[..., 0] == lo.astype(jnp.uint32)[..., None]) & valid[..., None]
    found = jnp.any(hit, axis=-1)
    rec = jnp.sum(
        jnp.where(hit[..., None], rr[..., 1:], jnp.uint32(0)), axis=-2
    )  # [..., 1+MT] = (meta, tids)
    meta = rec[..., 0].astype(jnp.int32)
    count = meta >> 16
    ngv = meta & 0xFFFF
    tmask = (jnp.arange(MT, dtype=jnp.int32) < count[..., None]) & found[..., None]
    tids = jnp.where(tmask, rec[..., 1:], jnp.uint32(0))
    return found, ngv, tids, tmask
