"""Sharded k-mer table + all-to-all query router.

The DB is sharded over the "db" mesh axis by contiguous prefix-bucket ranges;
reads are data-parallel over ("data", "db").  Each device routes its queries
to the bucket-owning shard in its mesh row with jax.lax.all_to_all, probes its
local shard for the queries it receives, and routes results back — the
TPU-native replacement for the reference's whole-DB-per-node mmap
(SURVEY.md §2.3: "DB (model) parallelism" + "all-to-all query routing").

Overflow handling: each device sends at most `cap` queries to any one shard.
The router returns the worst-case overflow count; callers size `cap` with
slack (prefix buckets are hash-uniform, so group sizes concentrate tightly
around Q/S) and can re-run with a larger cap on a nonzero overflow.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.encoding import SUF_BITS
from ..core.index import KmerIndex


@dataclass
class ShardedIndex:
    """Stacked per-shard device tables; leading dim = shard, padded to the
    max shard size.  Two shard layouts (uniform across shards so the traced
    probe is one program):

      "window" — KmerIndex.packed_tables (minimum memory)
      "paged"  — KmerIndex.paged_tables (the round-4 2-gather speed tier);
                 bucket_tab/suffix_over/rec hold the (ptab, pages) pair
                 instead (rec/arena unused)
    """

    k: int
    n_shards: int
    buckets_per_shard: int
    bucket_tab: np.ndarray   # [S, per, 2] | paged: ptab [S, per<<e, 2]
    suffix_over: np.ndarray  # [S, rows, 2W] | paged: pages [S, rows, P*W]
    rec: np.ndarray          # [S, max_kmers, 2] | paged: [S, 1, 1] unused
    arena: np.ndarray        # [S, ...] windowed arena | paged: [S, 1] unused
    arena_mode: tuple
    max_tids: int
    search_depth: int

    @classmethod
    def from_index(cls, idx: KmerIndex, n_shards: int,
                   dense_lists: bool | None = None,
                   layout: str = "window") -> "ShardedIndex":
        if layout not in ("window", "paged"):
            raise ValueError(f"unknown shard layout {layout!r}")
        n_buckets = idx.bucket_start.shape[0] - 1
        assert n_buckets % n_shards == 0, "bucket count must divide by shards"
        per = n_buckets // n_shards
        if dense_lists is None:
            # one decision for all shards so the traced probe is uniform
            dense_lists = idx.n_kmers * idx.max_tids * 4 <= KmerIndex._DENSE_LIMIT
        subs = []
        for s in range(n_shards):
            b0, b1 = s * per, (s + 1) * per
            k0, k1 = int(idx.bucket_start[b0]), int(idx.bucket_start[b1])
            a0, a1 = int(idx.tid_start[k0]), int(idx.tid_start[k1])
            subs.append(KmerIndex(
                k=idx.k,
                bucket_start=(idx.bucket_start[b0 : b1 + 1].astype(np.int64) - k0),
                suffix=idx.suffix[k0:k1],
                tid_start=(idx.tid_start[k0 : k1 + 1].astype(np.int64) - a0),
                tid_flat=idx.tid_flat[a0:a1],
                ng=idx.ng[k0:k1],
                max_tids=idx.max_tids,
                search_depth=idx.search_depth,
            ))

        def stack(arrs):
            m = max(a.shape[0] for a in arrs)
            out = np.zeros((n_shards, m) + arrs[0].shape[1:], arrs[0].dtype)
            for i, a in enumerate(arrs):
                out[i, : a.shape[0]] = a
            return out

        if layout == "paged":
            P = KmerIndex._PAGED_SLOTS
            # one uniform e across shards: the deepest shard decides; a
            # shard whose own split already landed on e_all reuses its
            # tables instead of a second full repack (halves the build for
            # the common balanced case — ~5 min/pass at 100M k-mers)
            firsts = []
            for sub in subs:
                pt = sub.paged_tables(P=P)
                if pt is None:
                    raise ValueError("a shard does not fit the paged layout")
                firsts.append(pt)
            e_all = max(pt[2] for pt in firsts)
            packs = [
                pt if pt[2] == e_all else sub.paged_tables(P=P, e=e_all)
                for sub, pt in zip(subs, firsts)
            ]
            assert all(p is not None for p in packs)
            return cls(
                k=idx.k,
                n_shards=n_shards,
                buckets_per_shard=per,
                bucket_tab=stack([p[0] for p in packs]),
                suffix_over=stack([p[1] for p in packs]),
                rec=np.zeros((n_shards, 1, 1), np.int32),
                arena=np.zeros((n_shards, 1), np.uint32),
                arena_mode=("paged", P, e_all),
                max_tids=idx.max_tids,
                search_depth=idx.search_depth,
            )

        packs = [sub.packed_tables(dense_lists=dense_lists) for sub in subs]
        arena_mode = packs[0][1]
        return cls(
            k=idx.k,
            n_shards=n_shards,
            buckets_per_shard=per,
            bucket_tab=stack([p[0]["bucket_tab"] for p in packs]),
            suffix_over=stack([p[0]["suffix_over"] for p in packs]),
            rec=stack([p[0]["rec"] for p in packs]),
            arena=stack([p[0]["arena"] for p in packs]),
            arena_mode=arena_mode,
            max_tids=idx.max_tids,
            search_depth=idx.search_depth,
        )


def _local_probe(shard_arrays, per_buckets, shard_id, search_depth, max_tids,
                 arena_mode, hi, lo, valid):
    """Probe shard-local tables; hi is the global bucket id."""
    import jax.numpy as jnp

    from ..core.index import probe_packed, probe_paged

    bucket_tab, suffix_over, rec, arena = shard_arrays
    b = hi.astype(jnp.int32) - shard_id * per_buckets
    in_range = (b >= 0) & (b < per_buckets)
    b = jnp.clip(b, 0, per_buckets - 1)
    if arena_mode[0] == "paged":
        return probe_paged(
            bucket_tab, suffix_over, arena_mode[1], arena_mode[2], max_tids,
            b, lo, valid & in_range,
        )
    return probe_packed(
        bucket_tab, suffix_over, rec, arena, arena_mode, search_depth, max_tids,
        b, lo, valid & in_range,
    )


def place_tables(mesh, sidx: ShardedIndex):
    """Device-place the stacked shard tables with the "db" sharding, to be
    passed as jit ARGUMENTS.

    Closure capture is NOT an option at scale: a numpy table captured by a
    traced function is embedded into the MLIR as a literal (GBs of
    constants wedge the remote compiler — NOTES.md r3), and a captured
    device array is fetched BACK to the host during lowering (the r5
    cold-start root cause).  make_array_from_callback works in single- and
    multi-process runs alike (every process holds the full host arrays and
    contributes its addressable shards)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("db"))

    def put(x):
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return (put(sidx.bucket_tab), put(sidx.suffix_over), put(sidx.rec),
            put(sidx.arena))


def make_sharded_lookup(mesh, sidx: ShardedIndex, q_per_device: int,
                        cap: int | None = None, tables=None):
    """Build a pjit-able sharded lookup fn.

    Returns fn(shard_arrays_stacked, hi, lo, valid) -> (found, ng, tids,
    tmask, overflow) where hi/lo/valid are flat [Q_total] arrays sharded over
    ("data","db") and shard arrays are sharded over "db".

    tables: pre-placed device tables from place_tables() (shared across
    router caps); placed here when absent.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    S = sidx.n_shards
    per = sidx.buckets_per_shard
    depth = sidx.search_depth
    T = sidx.max_tids
    assert T <= 32, "packed return row stores the tmask as one u32 bitmask"
    if cap is None:
        cap = q_per_device  # safe upper bound

    def body(bucket_tab, suffix_over, rec, arena, hi, lo, valid):
        shard_id = jax.lax.axis_index("db")
        arrays = (bucket_tab[0], suffix_over[0], rec[0], arena[0])
        Q = hi.shape[0]

        owner = jnp.clip(hi.astype(jnp.int32) // per, 0, S - 1)
        order = jnp.argsort(owner, stable=True)
        s_owner = owner[order]
        bounds = jnp.searchsorted(s_owner, jnp.arange(S + 1, dtype=jnp.int32))
        group_start = bounds[:-1]
        counts = bounds[1:] - group_start
        pos_in_group = jnp.arange(Q, dtype=jnp.int32) - group_start[s_owner]
        overflow = jax.lax.pmax(
            jnp.max(jnp.maximum(counts - cap, 0)), ("data", "db")
        )

        # send-buffer packing as a GATHER from the owner-sorted order (row
        # scatters run ~7x slower than gathers on TPU — NOTES.md op costs):
        # slot (s, c) pulls sorted query group_start[s]+c when c < counts[s]
        slot_src = group_start[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
        slot_ok = jnp.arange(cap, dtype=jnp.int32)[None, :] < counts[:, None]
        src_q = jnp.take(order, jnp.clip(slot_src, 0, Q - 1), mode="clip")

        def pack(vals, fill):
            picked = jnp.take(vals, src_q.reshape(-1), axis=0).reshape(
                (S, cap) + vals.shape[1:]
            )
            ok = slot_ok.reshape((S, cap) + (1,) * (vals.ndim - 1))
            return jnp.where(ok, picked, fill)

        # ONE packed query row per slot: row width is nearly free on TPU
        # gathers while every per-stream gather/a2a pays full issue cost
        # (52 ms of routing overhead at Q=524k measured with the unpacked
        # 3-send/4-return form; see SCALE_r05)
        a2a = lambda x: jax.lax.all_to_all(x, "db", split_axis=0, concat_axis=0)
        q3 = jnp.stack(
            [hi.astype(jnp.uint32), lo.astype(jnp.uint32),
             valid.astype(jnp.uint32)], axis=-1,
        )
        recv = a2a(pack(q3, 0))  # [S, cap, 3]

        found, ngv, tids, tmask = _local_probe(
            arrays, per, shard_id, depth, T, sidx.arena_mode,
            recv[..., 0].reshape(-1), recv[..., 1].reshape(-1),
            recv[..., 2].reshape(-1).astype(bool),
        )
        # pack the return streams into one [.., 2+T] u32 row:
        # word0 = found | ng<<1, word1 = tmask bitmask, words 2.. = tids
        tmask_bits = jnp.sum(
            tmask.astype(jnp.uint32) << jnp.arange(T, dtype=jnp.uint32),
            axis=-1,
        )
        word0 = found.astype(jnp.uint32) | (ngv.astype(jnp.uint32) << 1)
        ret = jnp.concatenate(
            [word0[..., None], tmask_bits[..., None], tids], axis=-1
        )
        r = a2a(ret.reshape(S, cap, 2 + T))

        # gather back to original query order: one row gather + one inverse
        # permutation over the packed rows
        ok = pos_in_group < cap
        pg = jnp.where(ok, pos_in_group, 0)
        g = jnp.where(ok[:, None], r[s_owner, pg], jnp.uint32(0))
        inv = jnp.argsort(order, stable=True)
        g = g[inv]
        w0 = g[..., 0]
        g_found = (w0 & 1).astype(bool)
        g_ng = (w0 >> 1).astype(jnp.int32)
        g_tmask = (
            (g[..., 1:2] >> jnp.arange(T, dtype=jnp.uint32)[None, :]) & 1
        ).astype(bool)
        g_tids = g[..., 2:]
        return g_found, g_ng, g_tids, g_tmask, overflow

    specs_db = P("db")
    spec_q = P(("data", "db"))
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(specs_db, specs_db, specs_db, specs_db,
                  spec_q, spec_q, spec_q),
        out_specs=(spec_q, spec_q, spec_q, spec_q, P()),
        check_vma=False,
    )

    if tables is None:
        tables = place_tables(mesh, sidx)
    jfn = jax.jit(fn)

    def wrapped(hi, lo, valid):
        # tables ride as jit ARGUMENTS — never closure constants (see
        # place_tables)
        return jfn(*tables, hi, lo, valid)

    wrapped.sharded_fn = fn  # raw shard_map callable (tables passed
    # explicitly); composable under an outer jit/scan — thread the tables
    # through the outer jit's arguments there too
    wrapped.tables = tables
    return wrapped
