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
        table = extract_kmers(fasta_path, k, prefix_bits=bits, prefix=p)

        def records():
            for km in sorted(table):
                closure = lca_closure(taxonomy, table[km])
                if closure:
                    yield km, closure

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


def build_native(fasta_path: str, taxonomy, k: int, max_tids: int = 16,
                 tid_cutoff: int = 0, priority_map=None) -> KmerIndex:
    """Full native build: genomes -> LCA-collapsed sorted-order index."""
    table = extract_kmers(fasta_path, k)
    kmers = []
    lists = []
    for km in sorted(table):
        closure = lca_closure(taxonomy, table[km])
        if not closure:
            continue
        closure = prune_list(closure, tid_cutoff, priority_map)
        if len(closure) > max_tids:
            closure = prune_list(closure, max_tids, priority_map)
        kmers.append(km)
        lists.append(np.asarray(closure, np.uint32))
    return KmerIndex.build(np.asarray(kmers, np.uint64), lists, k, max_tids=max_tids)


def build_from_tax_histo(paths, k: int, max_tids: int = 16,
                         tid_cutoff: int = 0, priority_map=None,
                         human_kmers=None, adaptor_kmers=None) -> KmerIndex:
    """Ingest reference tax_histo binaries, preserving stored taxid order.
    Optional human/adaptor k-mer feeds replicate make_db_table -j/-u."""
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
