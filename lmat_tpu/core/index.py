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

    def to_device(self, device=None):
        import jax

        put = (lambda x: jax.device_put(x, device)) if device else jax.device_put
        return DeviceIndex(
            k=self.k,
            bucket_start=put(self.bucket_start),
            suffix=put(self.suffix),
            tid_start=put(self.tid_start.astype(np.int32)),
            tid_flat=put(self.tid_flat),
            ng=put(self.ng),
            max_tids=self.max_tids,
            search_depth=self.search_depth,
            conv_table=put(self.conv_table) if self.conv_table is not None else None,
        )


@dataclass
class DeviceIndex:
    """Device-resident arrays + the XLA probe."""

    k: int
    bucket_start: object
    suffix: object
    tid_start: object
    tid_flat: object
    ng: object
    max_tids: int
    search_depth: int
    conv_table: object = None

    def tree_flatten(self):
        return (
            (self.bucket_start, self.suffix, self.tid_start, self.tid_flat, self.ng),
            (self.k, self.max_tids, self.search_depth),
        )

    def lookup(self, hi, lo, valid):
        """Probe a batch of k-mers.

        hi, lo: uint32 [...]; valid: bool [...].
        Returns (found bool, ng int32, tids uint32 [..., max_tids],
                 tmask bool [..., max_tids]).
        """
        import jax.numpy as jnp

        bs = self.bucket_start
        b = hi.astype(jnp.int32)
        start = jnp.take(bs, b, mode="clip").astype(jnp.int32)
        end = jnp.take(bs, b + 1, mode="clip").astype(jnp.int32)

        # branchless lower-bound search for `lo` in suffix[start:end)
        lo_u = lo.astype(jnp.uint32)
        left = start
        n = end - start
        for _ in range(self.search_depth):
            half = n >> 1
            mid = left + half
            mv = jnp.take(self.suffix, mid, mode="clip")
            go_right = mv < lo_u
            left = jnp.where(go_right, mid + 1, left)
            n = jnp.where(go_right, n - half - 1, half)
        pos = left
        found = valid & (pos < end) & (jnp.take(self.suffix, pos, mode="clip") == lo_u)

        ngv = jnp.where(found, jnp.take(self.ng, pos, mode="clip").astype(jnp.int32), 0)
        ts = jnp.take(self.tid_start, pos, mode="clip")
        te = jnp.take(self.tid_start, jnp.where(found, pos + 1, pos), mode="clip")
        count = te - ts
        offs = ts[..., None] + jnp.arange(self.max_tids, dtype=jnp.int32)
        tmask = (jnp.arange(self.max_tids, dtype=jnp.int32) < count[..., None]) & found[..., None]
        tids = jnp.where(
            tmask, jnp.take(self.tid_flat, offs, mode="clip"), jnp.uint32(0)
        )
        if self.conv_table is not None:
            # 16-bit compacted arena: convert back through the id table
            tids = jnp.take(self.conv_table, tids.astype(jnp.int32), mode="clip")
            tids = jnp.where(tmask, tids, jnp.uint32(0))
        return found, ngv, tids, tmask
