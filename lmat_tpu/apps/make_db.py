"""Database construction — the TPU-native make_db pipeline.

Replaces the reference's three-stage build (kmerPrefixCounter -> tax_histo ->
make_db_table, doc/lmat-doc.txt:536-551) with:

  extract_kmers()     canonical k-mers per genome, vectorized NumPy
                      (kmerPrefixCounter.cpp:138-146 semantics)
  lca_collapse()      per-k-mer LCA closure set (tax_histo.cpp:217-239 —
                      the *closure* keys of getLcaMap, not just the LCA)
  build()             pack into the two-level KmerIndex

plus an ingest path for reference-produced tax_histo binaries that preserves
their on-disk taxid order, enabling bit-identical cross-validation.

Pruning to a static per-k-mer taxid cap replicates make_db_table's tid_cutoff
semantics (SortedDb.cpp:296-408): with a rank-priority map, keep the deepest
priority classes that fit under the cap (stored in descending (priority, tid)
order); without one, over-long lists collapse to the single root taxid.
"""

from __future__ import annotations

import heapq

import numpy as np

from ..core.encoding import genome_canonical_kmers
from ..core.index import KmerIndex
from ..io import formats
from ..io.fasta import iter_reads


def extract_kmers(fasta_path: str, k: int, prefix_bits: int = 0, prefix: int = 0):
    """Scan an .int fasta (headers are taxids) -> dict kmer -> set(tids).

    prefix_bits/prefix shard the k-mer space the way kmerPrefixCounter's
    -l/-f options do (doc/lmat-doc.txt:655-686): only k-mers whose top
    2*prefix_bases bits equal `prefix` are collected, so 4^l independent
    shard builds cover the space (the reference fans these out with MPI;
    here any process pool or job array works — shards share nothing).
    """
    table: dict[int, set] = {}
    shift = np.uint64(2 * k - prefix_bits) if prefix_bits else None
    for hdr, seq in iter_reads(fasta_path):
        tid = int(hdr.split()[0].split("|")[0]) if hdr else 0
        kmers = genome_canonical_kmers(seq.encode(), k)
        if prefix_bits:
            kmers = kmers[(kmers >> shift) == np.uint64(prefix)]
        for km in np.unique(kmers):
            table.setdefault(int(km), set()).add(tid)
    return table


def build_sharded(fasta_path: str, taxonomy, k: int, n_shards_log4: int,
                  out_dir: str, max_tids: int = 16, processes: int = 0):
    """Sharded DB build: 4^n_shards_log4 independent prefix shards, each
    extracted + LCA-collapsed + written as a tax_histo file, then merged into
    one index.  With `processes` > 0 the shards build in a process pool."""
    import functools
    import os

    os.makedirs(out_dir, exist_ok=True)
    bits = 2 * n_shards_log4
    n_shards = 1 << bits
    paths = []

    def one(p):
        path = os.path.join(out_dir, f"shard.{p}.tax_histo")
        K, T = extract_kmer_pairs(fasta_path, k, prefix_bits=bits, prefix=p)

        def records():
            for uk, closures in lca_closure_batch(taxonomy, K, T):
                for km, cl in zip(uk, closures):
                    if cl.shape[0]:
                        yield int(km), cl

        formats.write_tax_histo(path, records(), k)
        return path

    if processes > 1:
        import multiprocessing as mp

        with mp.Pool(processes) as pool:
            paths = pool.map(one, range(n_shards))
    else:
        paths = [one(p) for p in range(n_shards)]
    return build_from_tax_histo(paths, k=k, max_tids=max_tids)


def lca_closure(taxonomy, tids) -> list[int]:
    """The set tax_histo stores: input tids (present in the tree) plus all
    ancestors up to and including the LCA, sorted ascending (canonical order;
    the reference emits unordered_map order)."""
    good = [t for t in tids if t in taxonomy]
    if not good:
        return []
    if len(good) == 1 and len(tids) == 1:
        return list(good)
    full = set(good)
    children: dict[int, set] = {}
    for tid in good:
        p = taxonomy.path_to_root(tid)
        if p:
            children.setdefault(p[0], set()).add(tid)
        for j in range(1, len(p)):
            children.setdefault(p[j], set()).add(p[j - 1])
        full.update(p)
    if len(good) == 1:
        return list(good)
    tidset = set(tids)
    lca = 1
    while True:
        ch = children.get(lca, ())
        if len(ch) == 1 and lca not in tidset:
            full.discard(lca)
            lca = next(iter(ch))
        else:
            break
    return sorted(full)


def prune_list(tids, cutoff: int, priority_map=None):
    """make_db_table tid_cutoff pruning for one k-mer list."""
    if cutoff <= 0 or len(tids) <= cutoff:
        return list(tids)
    if not priority_map:
        return [1]
    # max-heap on (priority, tid); pop equal-priority batches until <= cutoff
    heap = [(-priority_map.get(t, 0), -t) for t in tids]
    heapq.heapify(heap)
    while heap:
        cur = heap[0][0]
        while heap and heap[0][0] == cur:
            heapq.heappop(heap)
        if len(heap) <= cutoff:
            break
    if not heap:
        return [1]
    out = []
    while heap:
        pr, nt = heapq.heappop(heap)
        out.append(-nt)
    return out


def extract_kmer_pairs(fasta_path: str, k: int, prefix_bits: int = 0,
                       prefix: int = 0):
    """Vectorized extract_kmers: returns parallel (kmer u64, tid u32) pair
    arrays (per-sequence deduplicated, like the reference's per-genome
    hash insert)."""
    kcols, tcols = [], []
    shift = np.uint64(2 * k - prefix_bits) if prefix_bits else None
    for hdr, seq in iter_reads(fasta_path):
        tid = int(hdr.split()[0].split("|")[0]) if hdr else 0
        kmers = genome_canonical_kmers(seq.encode(), k)
        if prefix_bits:
            kmers = kmers[(kmers >> shift) == np.uint64(prefix)]
        u = np.unique(kmers)
        kcols.append(u)
        tcols.append(np.full(u.shape[0], tid, np.uint32))
    if not kcols:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
    return np.concatenate(kcols), np.concatenate(tcols)


def lca_closure_batch(taxonomy, K, T, chunk_pairs: int = 4_000_000,
                      flat: bool = False):
    """Vectorized lca_closure over (kmer, tid) pair arrays.

    Yields (kmers u64 [G], node_lists: list of uint32 taxid arrays) per
    chunk, kmers ascending, each list ascending — identical sets to
    lca_closure() per k-mer, computed with numpy segment ops instead of
    per-k-mer Python (the reference's getLcaMap loop, tax_histo.cpp:217-239).
    """
    tids_sorted, index, parent_idx, _d, path_mat = taxonomy.dense()
    n = len(tids_sorted)
    assert n < (1 << 25), "node-id packing assumes < 2^25 taxonomy nodes"
    tree_depth = (path_mat >= 0).sum(axis=1).astype(np.int32)
    # Euler intervals (anc_or_self(a,d): in[a] <= in[d] and out[d] <= out[a])
    children: dict[int, list] = {}
    root = 0
    for i in range(n):
        p = int(parent_idx[i])
        if p == i:
            root = i
        else:
            children.setdefault(p, []).append(i)
    euler_in = np.zeros(n, np.int32)
    euler_out = np.zeros(n, np.int32)
    clock = 0
    stack = [(root, False)]
    while stack:
        node, done = stack.pop()
        if done:
            euler_out[node] = clock
            continue
        euler_in[node] = clock
        clock += 1
        stack.append((node, True))
        for ch in reversed(children.get(node, [])):
            stack.append((ch, False))

    def anc_or_self(a, d):
        return (euler_in[a] <= euler_in[d]) & (euler_out[d] <= euler_out[a])

    # map tids -> node idx, dropping unknown tids (lca_closure's `good`)
    pos = np.searchsorted(tids_sorted, T.astype(np.int64))
    pos = np.clip(pos, 0, n - 1)
    ok = tids_sorted[pos] == T
    K = np.asarray(K, np.uint64)[ok]
    tidx = pos[ok].astype(np.int32)
    # sort + dedupe (kmer, tid) pairs
    order = np.lexsort((tidx, K))
    K, tidx = K[order], tidx[order]
    keep = np.ones(K.shape[0], bool)
    keep[1:] = (K[1:] != K[:-1]) | (tidx[1:] != tidx[:-1])
    K, tidx = K[keep], tidx[keep]

    D = path_mat.shape[1]
    total = K.shape[0]
    lo = 0
    while lo < total:
        hi = min(lo + chunk_pairs, total)
        # extend to the group (kmer) boundary
        while hi < total and K[hi] == K[hi - 1]:
            hi += 1
        Kc, tc = K[lo:hi], tidx[lo:hi]
        lo = hi
        uk, start = np.unique(Kc, return_index=True)
        G = uk.shape[0]
        gid = np.searchsorted(start, np.arange(Kc.shape[0]), side="right") - 1

        # tree LCA of each group = LCA(min-euler node, max-euler node)
        key = euler_in[tc].astype(np.int64) << 25 | tc
        a = (np.minimum.reduceat(key, start) & 0x1FFFFFF).astype(np.int32)
        b = (np.maximum.reduceat(key, start) & 0x1FFFFFF).astype(np.int32)
        cands = np.concatenate([a[:, None], path_mat[a]], axis=1)  # [G, D+1]
        cval = cands >= 0
        csafe = np.where(cval, cands, 0)
        okc = cval & anc_or_self(csafe, b[:, None])
        cd = np.where(okc, tree_depth[csafe], -1)
        lca_tree = csafe[np.arange(G), np.argmax(cd, axis=1)]

        # walk stop point: shallowest group tid that is anc-or-self of the
        # tree LCA, else the tree LCA itself (lca_closure's root walk)
        on_chain = anc_or_self(tc, lca_tree[gid])
        BIG = np.int32(1 << 30)
        dmin = np.minimum.reduceat(
            np.where(on_chain, tree_depth[tc], BIG), start
        )
        lca_depth = np.where(dmin < BIG, dmin, tree_depth[lca_tree])

        # closure entries: each pair contributes its path nodes at depth >=
        # the group's stop depth (plus itself)
        ent = np.concatenate([tc[:, None], path_mat[tc]], axis=1)  # [P, D+1]
        evalid = ent >= 0
        esafe = np.where(evalid, ent, 0)
        keepe = evalid & (tree_depth[esafe] >= lca_depth[gid][:, None])
        packed = (gid.astype(np.int64)[:, None] << 25 | esafe)[keepe]
        u = np.unique(packed)
        g_u = (u >> 25).astype(np.int64)
        n_u = (u & 0x1FFFFFF).astype(np.int64)
        bounds = np.searchsorted(g_u, np.arange(G + 1))
        node_tids = tids_sorted[n_u].astype(np.uint32)
        if flat:
            yield uk, node_tids, bounds
        else:
            lists = [node_tids[bounds[g] : bounds[g + 1]] for g in range(G)]
            yield uk, lists


def build_native(fasta_path: str, taxonomy, k: int, max_tids: int = 16,
                 tid_cutoff: int = 0, priority_map=None) -> KmerIndex:
    """Full native build: genomes -> LCA-collapsed sorted-order index.
    Fully vectorized: pair extraction, batched closure, flat assembly; only
    k-mers needing rank-priority pruning drop to per-k-mer Python."""
    K, T = extract_kmer_pairs(fasta_path, k)
    kchunks, fchunks, cchunks = [], [], []
    cut = tid_cutoff if tid_cutoff > 0 else max_tids
    for uk, node_tids, bounds in lca_closure_batch(taxonomy, K, T, flat=True):
        counts = np.diff(bounds)
        long = counts > cut
        if priority_map is not None and long.any():
            # rare path: exact heap-order pruning per long k-mer
            pruned = []
            for g in np.nonzero(long)[0]:
                cl = node_tids[bounds[g] : bounds[g + 1]].tolist()
                cl = prune_list(cl, tid_cutoff, priority_map)
                if len(cl) > max_tids:
                    cl = prune_list(cl, max_tids, priority_map)
                pruned.append(np.asarray(cl, np.uint32))
            new_counts = counts.copy()
            new_counts[long] = [len(x) for x in pruned]
            gi = np.repeat(np.arange(len(counts)), counts)
            flat_parts = [node_tids[~long[gi]]]
            # interleave: rebuild in group order
            out = np.empty(int(new_counts.sum()), np.uint32)
            ns = np.zeros(len(counts) + 1, np.int64)
            ns[1:] = np.cumsum(new_counts)
            it = iter(pruned)
            for g in range(len(counts)):
                if long[g]:
                    out[ns[g] : ns[g + 1]] = next(it)
                else:
                    out[ns[g] : ns[g + 1]] = node_tids[bounds[g] : bounds[g + 1]]
            node_tids, counts = out, new_counts
        elif long.any():
            # no priority map: over-long lists collapse to the root taxid
            # (make_db_table semantics with no -m map)
            G = len(counts)
            gi = np.repeat(np.arange(G), counts)
            ent_off = np.arange(gi.shape[0]) - np.repeat(bounds[:-1], counts)
            new_counts = np.where(long, 1, counts).astype(np.int64)
            ns = np.zeros(G + 1, np.int64)
            ns[1:] = np.cumsum(new_counts)
            out = np.empty(int(ns[-1]), np.uint32)
            out[ns[:-1][long]] = 1
            keep_entries = ~long[gi]
            out[(ns[gi] + ent_off)[keep_entries]] = node_tids[keep_entries]
            node_tids, counts = out, new_counts
        nonempty = counts > 0
        kchunks.append(np.asarray(uk, np.uint64)[nonempty])
        if not nonempty.all():
            gi = np.repeat(nonempty, counts)
            node_tids = node_tids[gi]
            counts = counts[nonempty]
        fchunks.append(node_tids)
        cchunks.append(counts)
    kmers = np.concatenate(kchunks) if kchunks else np.zeros(0, np.uint64)
    tid_flat = np.concatenate(fchunks) if fchunks else np.zeros(0, np.uint32)
    counts = np.concatenate(cchunks) if cchunks else np.zeros(0, np.int64)
    return KmerIndex.build_flat(kmers, tid_flat, counts, k, max_tids=max_tids)


def build_from_tax_histo(paths, k: int, max_tids: int = 16,
                         tid_cutoff: int = 0, priority_map=None,
                         human_kmers=None, adaptor_kmers=None) -> KmerIndex:
    """Ingest reference tax_histo binaries, preserving stored taxid order.
    Optional human/adaptor k-mer feeds replicate make_db_table -j/-u."""
    from ..core.encoding import SMALL_K_MESSAGE, SUF_BITS

    if not 2 * k > SUF_BITS:
        raise ValueError(SMALL_K_MESSAGE.format(k=k))
    if isinstance(paths, str):
        paths = [paths]

    def records():
        for path in paths:
            yield from formats.read_tax_histo(path)

    rec = records()
    if human_kmers is not None or adaptor_kmers is not None:
        rec = merge_human_adaptor(rec, human_kmers, adaptor_kmers)
    kmers = []
    lists = []
    for kmer, tids in rec:
        lst = prune_list(list(tids), tid_cutoff, priority_map)
        if len(lst) > max_tids:
            lst = prune_list(lst, max_tids, priority_map)
        kmers.append(kmer)
        lists.append(np.asarray(lst, np.uint32))
    return KmerIndex.build(np.asarray(kmers, np.uint64), lists, k, max_tids=max_tids)


def merge_human_adaptor(records, human_kmers=None, adaptor_kmers=None,
                        human_tid: int = 9606, adaptor_tid: int = 32630):
    """Merge the human/adaptor k-mer feeds into a sorted record stream
    (make_db_table -j/-u semantics, SortedDb.cpp:168-292 and :602-707):

      * feed k-mers absent from the input appear as single-taxid entries
        (adaptor taxid if also in the adaptor set, else human);
      * input k-mers present in the human feed get the human taxid appended
        to their list unless already present;
      * input k-mers in the adaptor set have their lists REPLACED by the
        adaptor taxid.

    records: sorted (kmer, tids) iterable.  human_kmers: sorted iterable.
    adaptor_kmers: set.
    """
    adaptor_kmers = adaptor_kmers or frozenset()
    hit = iter(human_kmers) if human_kmers is not None else iter(())

    def next_h():
        return next(hit, None)

    h = next_h()
    for kmer, tids in records:
        while h is not None and h < kmer:
            yield h, np.asarray(
                [adaptor_tid if h in adaptor_kmers else human_tid], np.uint32
            )
            h = next_h()
        add_human = False
        if h is not None and h == kmer:
            add_human = True
            h = next_h()
        if kmer in adaptor_kmers:
            yield kmer, np.asarray([adaptor_tid], np.uint32)
            continue
        tids = np.asarray(tids, np.uint32)
        if add_human and human_tid not in tids:
            tids = np.concatenate([tids, np.asarray([human_tid], np.uint32)])
        yield kmer, tids
    while h is not None:
        yield h, np.asarray(
            [adaptor_tid if h in adaptor_kmers else human_tid], np.uint32
        )
        h = next_h()


def compact_16bit(idx: KmerIndex, mapping: dict[int, int]) -> KmerIndex:
    """16-bit taxid compaction (make_db_table -f, the reference's br_map):
    store uint16 ids in the arena plus a conversion table back to 32-bit.
    Halves arena HBM; lookups convert via a 65536-entry table."""
    import copy

    out = copy.copy(idx)
    flat16 = np.zeros(idx.tid_flat.shape, np.uint16)
    conv = np.zeros(65536, np.uint32)
    for i, t in enumerate(idx.tid_flat):
        t = int(t)
        m = mapping.get(t)
        if m is None or m == 0:
            raise ValueError(f"taxid {t} missing from 16-bit map")
        flat16[i] = m
        conv[m] = t
    out.tid_flat = flat16
    out.conv_table = conv
    return out


def build_from_kpc(paths, k: int, max_tids: int = 64) -> KmerIndex:
    """Ingest kmerPrefixCounter binaries (e.g. gene DB inputs, the reference's
    make_db_table -h path) preserving stored id order."""
    if isinstance(paths, str):
        paths = [paths]
    kmers = []
    lists = []
    for path in paths:
        for kmer, tids in formats.read_kpc_file(path):
            kmers.append(kmer)
            lists.append(np.asarray(tids, np.uint32))
    return KmerIndex.build(np.asarray(kmers, np.uint64), lists, k, max_tids=max_tids)


def write_tax_histo_native(fasta_path: str, taxonomy, k: int, out_path: str) -> int:
    """Native equivalent of kmerPrefixCounter+tax_histo emitting the reference
    v999 binary format (sorted k-mers, ascending tid order)."""
    table = extract_kmers(fasta_path, k)
    def records():
        for km in sorted(table):
            closure = lca_closure(taxonomy, table[km])
            if closure:
                yield km, closure
    return formats.write_tax_histo(out_path, records(), k)
