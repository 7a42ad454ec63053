"""Per-taxid k-mer frequency counts (frequency_counter / countTaxidFrequency
equivalent — the reference ships the same program twice, SURVEY.md §9).

Counts how many k-mers reference each taxid in a tax_histo stream and writes
``tid count`` rows (the ``.kcnt`` input of the null-model normalization).
"""

from __future__ import annotations

from ..io import formats


def count_tax_histo(paths) -> dict[int, int]:
    if isinstance(paths, str):
        paths = [paths]
    counts: dict[int, int] = {}
    for path in paths:
        for _kmer, tids in formats.read_tax_histo(path):
            for tid in tids:
                tid = int(tid)
                counts[tid] = counts.get(tid, 0) + 1
    return counts


def count_index(index) -> dict[int, int]:
    """Same statistic straight from a built KmerIndex."""
    import numpy as np

    vals, cnts = np.unique(index.tid_flat, return_counts=True)
    return {int(t): int(c) for t, c in zip(vals, cnts)}


def write_kcnt(counts: dict[int, int], path: str):
    with open(path, "w") as f:
        for tid in sorted(counts):
            f.write(f"{tid} {counts[tid]}\n")
    return path
