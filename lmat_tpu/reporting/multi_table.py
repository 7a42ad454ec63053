"""Multi-sample fastsummary table (LMAT2multi-fastsummaryTable.pl
equivalent): merge per-sample .fastsummary/.species/.genus/.plasmid files
into a taxid x sample matrix with read-count/score filters.  Deterministic
(sorted) row order; supports the MEGAN raw-count variant."""

from __future__ import annotations

import os


def _parse_rows(path: str):
    """Yield (avg_score, count, tid, name) from any summary flavor."""
    mode = "fastsummary"
    with open(path) as f:
        for raw in f:
            line = raw.rstrip("\n")
            if line.startswith("Average Read Score"):
                mode = "species_genes" if "Pcnt. rRNA" in line else "species"
                continue
            t = line.split("\t")
            try:
                if mode == "fastsummary":
                    if len(t) < 4:
                        continue
                    wrc, cnt, tid = float(t[0]), int(t[1]), int(t[2])
                    yield (wrc / cnt if cnt else 0.0), cnt, tid, t[3]
                elif mode == "species":
                    if len(t) < 5:
                        continue
                    yield float(t[0]), int(t[2]), int(t[3]), t[4]
                else:  # species_genes
                    if len(t) < 8:
                        continue
                    yield float(t[0]), int(t[2]), int(t[6]), t[7]
            except ValueError:
                continue


def multi_table(samples: list[tuple[str, str, int]], out_path: str,
                min_reads: int = 1, min_frac: float = 0.0,
                min_score: float = 0.5, megan: bool | None = None):
    """samples: [(name, summary_path, total_reads)].  total_reads comes from
    the run log in the reference; callers pass it explicitly here."""
    if megan is None:
        megan = "megan" in os.path.basename(out_path)
    names = [s[0] for s in samples]
    data: dict[int, dict[str, tuple[int, float]]] = {}
    orgname: dict[int, str] = {}
    for name, path, total in samples:
        for avg, cnt, tid, nm in _parse_rows(path):
            frac = cnt / total if total else 0.0
            if cnt >= min_reads and frac >= min_frac and avg >= min_score:
                data.setdefault(tid, {})[name] = (cnt, frac)
                orgname.setdefault(tid, nm)
    with open(out_path, "w") as f:
        if megan:
            f.write("@Creator\tlmat_tpu multi_table\n@Algorithm\tTaxonomy\tLMAT\n")
            f.write("#datasets\t" + "\t".join(names) + "\n")
            for tid in sorted(data):
                row = [str(tid)] + [str(data[tid].get(n, (0, 0.0))[0]) for n in names]
                f.write("\t".join(row) + "\n")
        else:
            f.write("Name\tTaxID\t" + "\t".join(names) + "\n")
            for tid in sorted(data):
                row = [orgname[tid], str(tid)] + [
                    f"{data[tid].get(n, (0, 0.0))[1]:.6g}" for n in names
                ]
                f.write("\t".join(row) + "\n")
    return out_path


def merge_fastsummary(paths, out_path: str):
    """Merge per-shard .fastsummary files into one (the reference merges its
    per-thread maps in-process, read_label.cpp:1760-1800; sharded runs merge
    at file level).  Weighted scores accumulate in f32 in input order; rows
    re-sort by weighted score descending like write_fastsummary."""
    import numpy as np

    F = np.float32
    wght: dict[int, F] = {}
    cnt: dict[int, int] = {}
    name: dict[int, str] = {}
    for path in paths:
        with open(path) as f:
            for line in f:
                toks = line.rstrip("\n").split("\t")
                if len(toks) < 4:
                    continue
                tid = int(toks[2])
                wght[tid] = F(wght.get(tid, F(0)) + F(toks[0]))
                cnt[tid] = cnt.get(tid, 0) + int(toks[1])
                name.setdefault(tid, toks[3])
    from ..io.cppfmt import fmt_float

    rows = sorted(wght, key=lambda t: (-wght[t], t))
    with open(out_path, "w") as out:
        for t in rows:
            out.write(f"{fmt_float(wght[t])}\t{cnt[t]}\t{t}\t{name[t]}\n")
    return out_path
