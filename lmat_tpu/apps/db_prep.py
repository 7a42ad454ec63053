"""Small DB-prep utilities (parity with the reference's bin/ helpers).

  combine_counts        merge per-taxid k-mer count files (combine_counts.py)
  species_level_map     tid -> species-ancestor map (build_species_level_map.py)
  merge_paired_reads    join read pairs with an N separator
                        (merge_fastq_reads_with_N_separator.pl)
  build_taxid_lst       taxids present in a DB/tax_histo set (build_taxid_lst)
"""

from __future__ import annotations

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
