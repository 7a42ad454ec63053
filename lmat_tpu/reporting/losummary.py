"""Fast re-binning of classified reads at new thresholds (losummary_fast.pl
equivalent): recompute a summary from existing .out files without
re-searching.  Output rows are sorted (the perl original emits random hash
order); content is otherwise equivalent:

  <base>.<thresh>.<min_kmers>.fastsummary : "taxid\tname;count;score_sum"
  <base>.<thresh>.<min_kmers>.nomatchsum  : "category;count"
"""

from __future__ import annotations


def read_rank_lineages(path: str) -> dict[int, str]:
    """rank-ids file -> {ktaxid: full line with 'no rank'->'no_rank'}."""
    out = {}
    with open(path) as f:
        for raw in f:
            line = raw.rstrip("\n").replace("no rank", "no_rank")
            head = line.split("\t", 1)[0]
            tid = None
            for part in head.split(","):
                if part.startswith("ktaxid="):
                    try:
                        tid = int(part[7:])
                    except ValueError:
                        pass
                    break
            if tid is not None:
                out[tid] = line
    return out


def fastsummary_from_out(out_files, rank_ids_file: str, out_path: str,
                         nomatch_path: str | None = None,
                         min_score: float = 0.0, min_kmers: int = 30):
    """Regenerate read_label's .fastsummary/.nomatchsum from its per-thread
    ``.out`` files (the accumulation of read_label.cpp:1801-1852 replayed
    from the text outputs): skip ReadTooShort/NoDbHits calls (and reads with
    fewer than ``min_kmers`` valid k-mers), route calls scoring below
    ``min_score`` to LowScore, and accumulate (score sum, count) per taxid.

    Validated byte-identical against the reference's shipped example outputs
    (tests/test_golden_example.py)."""
    import numpy as np

    from ..apps.read_label_host import (
        LOW_SCORE, NO_DB_HITS, READ_TOO_SHORT, write_fastsummary,
        write_nomatchsum,
    )

    F = np.float32  # the reference accumulates in C++ float
    track_score: dict[int, float] = {}
    track_count: dict[int, int] = {}
    track_nomatch: dict[int, int] = {}
    for path in out_files:
        # per-thread partial tallies merged at the end, like the reference's
        # OpenMP reduction: each .out file sums in float32 first
        file_score: dict[int, float] = {}
        with open(path) as f:
            for raw in f:
                vals = raw.rstrip("\n").split("\t")
                if len(vals) < 5:
                    continue
                call = vals[4].split(" ")
                if len(call) < 3:
                    continue
                tid, score, typ = int(call[0]), F(call[1]), call[2]
                if typ == "ReadTooShort":
                    track_nomatch[READ_TOO_SHORT] = track_nomatch.get(READ_TOO_SHORT, 0) + 1
                    continue
                if typ == "NoDbHits":
                    track_nomatch[NO_DB_HITS] = track_nomatch.get(NO_DB_HITS, 0) + 1
                    continue
                stats = vals[2].split(" ")
                if len(stats) >= 3 and float(stats[2]) < min_kmers:
                    track_nomatch[READ_TOO_SHORT] = track_nomatch.get(READ_TOO_SHORT, 0) + 1
                    continue
                if score < min_score:
                    track_nomatch[LOW_SCORE] = track_nomatch.get(LOW_SCORE, 0) + 1
                    continue
                file_score[tid] = F(file_score.get(tid, F(0))) + score
                track_count[tid] = track_count.get(tid, 0) + 1
        for tid, s in file_score.items():
            track_score[tid] = F(track_score.get(tid, F(0))) + s
    write_fastsummary(track_score, track_count, out_path, rank_ids_file)
    if nomatch_path:
        write_nomatchsum(track_nomatch, nomatch_path)
    return out_path


def losummary(out_file: str, rank_lineages: dict[int, str], sig_thresh: float,
              min_kmers: int, out_base: str | None = None):
    out_base = out_base or out_file
    cnt_call: dict[str, int] = {}
    cnt_sum: dict[str, float] = {}
    save_taxid: dict[str, int] = {}
    with open(out_file) as f:
        for raw in f:
            vals = raw.rstrip("\n").split("\t")
            if len(vals) < 5:
                continue
            if min_kmers != -1:
                stats = vals[2].split(" ")
                if len(stats) >= 3 and float(stats[2]) < min_kmers:
                    cnt_call["ShortRead"] = cnt_call.get("ShortRead", 0) + 1
                    continue
            call = vals[4].split(" ")
            if len(call) < 3:
                continue
            ktaxid, loscore, label_type = call[0], float(call[1]), call[2]
            if label_type == "ReadTooShort":
                cnt_call["ShortRead"] = cnt_call.get("ShortRead", 0) + 1
                continue
            if label_type == "NoDbHits":
                cnt_call["NoMatch"] = cnt_call.get("NoMatch", 0) + 1
                continue
            if label_type == "LCA_ERROR" or label_type == "Unmatched":
                cnt_call["LCA_ERROR"] = cnt_call.get("LCA_ERROR", 0) + 1
                continue
            if loscore < sig_thresh:
                cnt_call["LowScore"] = cnt_call.get("LowScore", 0) + 1
                continue
            ktaxid = int(ktaxid)
            lineage = rank_lineages.get(ktaxid)
            if not lineage:
                continue
            lv = lineage.split("\t")
            curr = "root" if len(lv) == 1 else lv[-1]
            cnt_call[curr] = cnt_call.get(curr, 0) + 1
            cnt_sum[curr] = cnt_sum.get(curr, 0.0) + loscore
            save_taxid[curr] = ktaxid

    fs = f"{out_base}.{sig_thresh}.{min_kmers}.fastsummary"
    nm = f"{out_base}.{sig_thresh}.{min_kmers}.nomatchsum"
    with open(fs, "w") as f1, open(nm, "w") as f2:
        for node in sorted(cnt_call):
            if node in save_taxid:
                f1.write(
                    f"{save_taxid[node]}\t{node};{cnt_call[node]};{cnt_sum[node]}\n"
                )
            else:
                f2.write(f"{node};{cnt_call[node]}\n")
    return fs, nm
