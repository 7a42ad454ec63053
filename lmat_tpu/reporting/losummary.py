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
