"""Small DB-prep utilities (parity with the reference's bin/ helpers).

  combine_counts          merge per-taxid k-mer count files (combine_counts.py)
  species_level_map       tid -> species-ancestor map (build_species_level_map.py)
  merge_paired_reads      join read pairs with an N separator
                          (merge_fastq_reads_with_N_separator.pl)
  build_taxid_lst         taxids present in a DB/tax_histo set (build_taxid_lst)
  tid16_get_32bit_taxids  taxid headers of an .int FASTA (Tid16_get32BitTaxIDs.py)
  tid16_mapping           32->16-bit taxid map over the subtree closure
                          (Tid16_getMapping.py)
  build_numeric_rank_table  rank-priority prune table
                          (build_tid_numeric_rank_table.py)
  get_gi_numbers          GI numbers per header (get_gi_numbers.py)
  build_header_table      GI headers -> taxid .int FASTA (build_header_table.py)
  combine_fast            merge ';'-keyed summaries (combine_fast.pl)
"""

from __future__ import annotations

import os

from ..io.fasta import iter_reads


def combine_counts(paths, out_path: str):
    """Sum 'tid count' rows across files."""
    totals: dict[int, int] = {}
    for p in paths:
        with open(p) as f:
            for line in f:
                t = line.split()
                if len(t) >= 2:
                    totals[int(t[0])] = totals.get(int(t[0]), 0) + int(t[1])
    with open(out_path, "w") as f:
        for tid in sorted(totals):
            f.write(f"{tid} {totals[tid]}\n")
    return totals


def species_level_map(taxonomy, tids=None) -> dict[int, int]:
    """Map every tid to its species-level ancestor (itself if species; the
    first 'species'-ranked node on the path otherwise; absent -> unmapped)."""
    out = {}
    for tid in tids if tids is not None else taxonomy.parent:
        tid = int(tid)
        if taxonomy.rank.get(tid) == "species":
            out[tid] = tid
            continue
        for ptid in taxonomy.path_to_root(tid):
            if taxonomy.rank.get(ptid) == "species":
                out[tid] = ptid
                break
    return out


def write_map(mapping: dict[int, int], out_path: str):
    with open(out_path, "w") as f:
        for k in sorted(mapping):
            f.write(f"{k} {mapping[k]}\n")
    return out_path


def merge_paired_reads(r1_path: str, r2_path: str, out_path: str,
                       separator: str = "N"):
    """Join mate pairs into single reads with an N separator so paired data
    flows through the single-read classifier."""
    n = 0
    with open(out_path, "w") as out:
        for (h1, s1), (h2, s2) in zip(iter_reads(r1_path), iter_reads(r2_path)):
            base = h1.split("/")[0].split()[0]
            out.write(f">{base}\n{s1}{separator}{s2}\n")
            n += 1
    return n


def build_taxid_lst(tax_histo_paths, out_path: str):
    """All distinct taxids referenced by the given tax_histo files."""
    from ..io import formats

    tids = set()
    if isinstance(tax_histo_paths, str):
        tax_histo_paths = [tax_histo_paths]
    for p in tax_histo_paths:
        for _k, lst in formats.read_tax_histo(p):
            tids.update(int(t) for t in lst)
    with open(out_path, "w") as f:
        for t in sorted(tids):
            f.write(f"{t}\n")
    return tids


def tid16_get_32bit_taxids(fasta_path: str, out_path: str) -> int:
    """Collect the taxid headers of a single-line-sequence ``.int`` FASTA
    (bin/Tid16_get32BitTaxIDs.py): one unique header per line, first-seen
    order."""
    seen = {}
    with open(fasta_path) as f:
        while True:
            header = f.readline()
            if len(header) < 2:
                break
            assert header[0] == ">", "sequence spans multiple lines?"
            seq = f.readline()
            assert seq
            seen[header[1:].rstrip("\n")] = 0
    with open(out_path, "w") as out:
        for tid in seen:
            out.write(tid + "\n")
    return len(seen)


def tid16_mapping(tid_list_path: str, taxonomy, out_path: str) -> dict[int, int]:
    """Build the 32->16-bit taxid map (bin/Tid16_getMapping.py): the leaves'
    subtree-to-root closure gets ids 2..N (root keeps 1), written as
    ``tid32 tid16`` rows."""
    leaves = []
    with open(tid_list_path) as f:
        for line in f:
            line = line.strip()
            if line:
                leaves.append(int(line))
    needed = {}
    for tid in leaves:
        node = tid
        while True:
            if node > 1:
                needed[node] = 0
            nxt = taxonomy.parent[node]
            if nxt == node:
                break
            node = nxt
    mp = {1: 1}
    nid = 2
    for tid in needed:
        if tid != 1:
            mp[tid] = nid
            nid += 1
    assert nid <= 0x10000, f"{nid} ids do not fit in 16 bits"
    with open(out_path, "w") as out:
        for t32, t16 in mp.items():
            out.write(f"{t32} {t16}\n")
    return mp


# rank priorities of bin/build_tid_numeric_rank_table.py:21-23
_RANK_ITEMS = ["species", "genus", "family", "order", "class", "phylum",
               "kingdom", "superkingdom"]
_RANK_NUMS = [15, 14, 12, 10, 8, 6, 4, 2]


def build_numeric_rank_table(rank_ids_path: str, out_path: str) -> None:
    """Numeric rank-priority table for query-time pruning
    (bin/build_tid_numeric_rank_table.py): walk each lineage row from the
    leaf up, emit the first named rank's priority (+1 when unranked nodes
    intervene), ``taxid priority`` rows."""
    with open(rank_ids_path) as f, open(out_path, "w") as out:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) <= 1:
                continue
            match = -1
            inter_node = False
            for it in reversed(parts[1:]):
                rank = it.split(",")[0]
                if rank in _RANK_ITEMS:
                    match = _RANK_NUMS[_RANK_ITEMS.index(rank)]
                    if inter_node:
                        match += 1
                    break
                inter_node = True
            if inter_node and match == -1:
                match = 1  # MAX_RANK
            tid = parts[0].split(",")[1].split("=")[1]
            out.write(f"{tid} {match}\n")


def get_gi_numbers(fasta_path: str, outdir: str) -> str:
    """Extract the GI number of every header (bin/get_gi_numbers.py):
    ``>gi|12345|...`` -> one GI per line in <basename>.gi."""
    base = os.path.basename(fasta_path)
    out_path = os.path.join(outdir, base + ".gi")
    with open(fasta_path) as f, open(out_path, "w") as out:
        for line in f:
            if line.startswith(">"):
                toks = line[1:].split("|")
                assert toks[0] == "gi", f"header without GI: {line[:40]}"
                out.write(toks[1] + "\n")
    return out_path


def build_header_table(fasta_path: str, gi_map_path: str, outdir: str):
    """Rewrite reference-genome headers to taxids (bin/build_header_table.py):
    produces <base>.int (taxid headers), <base>.gi.table and <base>.tid.table
    (two-line entries: id, original header).  gi_map rows are tab-separated
    with the taxid in column 0 and the GI in column 4 (NCBI gi_taxid format).
    """
    gi_to_tid = {}
    with open(gi_map_path) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            if len(t) > 4:
                gi_to_tid[t[4]] = t[0]
    base = os.path.basename(fasta_path)
    int_path = os.path.join(outdir, base + ".int")
    gi_tab = os.path.join(outdir, base + ".gi.table")
    tid_tab = os.path.join(outdir, base + ".tid.table")
    n_missing = 0
    with open(fasta_path) as f, open(int_path, "w") as out_seq, open(
        gi_tab, "w"
    ) as out_gi, open(tid_tab, "w") as out_tid:
        for line in f:
            if not line.startswith(">"):
                out_seq.write(line)
                continue
            hdr = line[1:].rstrip("\n")
            toks = hdr.split("|")
            gi = toks[1] if len(toks) > 1 and toks[0] == "gi" else hdr.split()[0]
            tid = gi_to_tid.get(gi)
            out_gi.write(f"{gi}\n{hdr}\n")
            if tid is None:
                n_missing += 1
                continue
            out_seq.write(f">{tid}\n")
            out_tid.write(f"{tid}\n{hdr}\n")
    return int_path, gi_tab, tid_tab, n_missing


def combine_fast(paths, out_path: str) -> None:
    """Merge ';'-keyed summary rows across files (bin/combine_fast.pl):
    per id, sum field 1 and field 2; emit ``sum2<TAB>sum1<TAB>id`` with the
    id's first whitespace collapsed to a tab."""
    import re

    d1: dict[str, float] = {}
    d2: dict[str, float] = {}
    for path in paths:
        with open(path) as f:
            for line in f:
                parts = line.rstrip("\n").split(";")
                if len(parts) < 3:
                    continue
                key = parts[0]
                d1[key] = d1.get(key, 0) + float(parts[1])
                d2[key] = d2.get(key, 0) + float(parts[2])

    def fnum(x: float) -> str:
        return str(int(x)) if x == int(x) else repr(x)

    with open(out_path, "w") as out:
        for k in d2:
            pval = re.sub(r"\s+", "\t", k, count=1)
            out.write(f"{fnum(d2[k])}\t{fnum(d1[k])}\t{pval}\n")
