"""Gene-summary re-binning at new thresholds (gsummary.pl equivalent):
recompute per-(gene, taxid) counts/averages from gene_label .out files
without re-searching."""

from __future__ import annotations


def gsummary(gl_out_files, min_score: float, min_kmer: int, out_path: str):
    """gene_label .out line: hdr\tread\ttid tscore\t\t-1 cnt valid\tgid gscore GL"""
    if isinstance(gl_out_files, str):
        gl_out_files = [gl_out_files]
    cnt: dict[tuple[int, int], int] = {}
    ssum: dict[tuple[int, int], float] = {}
    for path in gl_out_files:
        with open(path) as f:
            for raw in f:
                vals = raw.rstrip("\n").split("\t")
                if len(vals) < 6:
                    continue
                try:
                    tid = int(vals[2].split()[0])
                    stats = vals[4].split()
                    valid = int(stats[2])
                    call = vals[5].split()
                    gid, gscore = int(call[0]), float(call[1])
                except (ValueError, IndexError):
                    continue
                if gscore > min_score and valid > min_kmer:
                    key = (gid, tid)
                    cnt[key] = cnt.get(key, 0) + 1
                    ssum[key] = ssum.get(key, 0.0) + gscore
    with open(out_path, "w") as f:
        for (gid, tid) in sorted(cnt):
            c = cnt[(gid, tid)]
            f.write(f"{ssum[(gid, tid)] / c:.6g}\t{c}\t{tid}\t{gid}\n")
    return out_path
