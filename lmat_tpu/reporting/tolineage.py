"""fastsummary -> tab-separated named lineages (Krona input).

Reimplements /root/reference/bin/tolineage.py byte-compatibly: indexes the
rank-ids file by the taxid in its third comma field, drops 'no rank' lineage
entries, and filters by read count and average score.
"""

from __future__ import annotations


def tolineage(taxfile: str, input_fn: str, output_fn: str, num: int, min_avg: float):
    tax = {}
    with open(taxfile) as f:
        for line in f:
            t = line.split(",")
            if len(t) < 3:
                continue
            t2 = t[2].split("=")
            if len(t2) < 2:
                continue
            tax[t2[1]] = line

    with open(output_fn, "w") as out, open(input_fn) as f:
        for line in f:
            t = line.split()
            if len(t) < 3:
                continue
            count = t[1]
            avg = float(t[0]) / float(t[1])
            ktaxid = t[2]
            if ktaxid not in tax:
                print(("error: failed to find ktaxid", -1, "for entry:"))
                print(line)
                continue
            if int(ktaxid) == 1:
                e2 = ["Root,Root\n"]
                e = tax[ktaxid]
            else:
                e = tax[ktaxid]
                j = e.find("\t")
                if j == -1:
                    e2 = ["Root,Root\n"]
                else:
                    e = e[j + 1 :]
                    e2 = e.split("\t")
            if int(count) > num and avg >= min_avg:
                out.write(count + "\t")
                for x in e2[:-1]:
                    if x.find("no rank") == -1:
                        x2 = x.split(",")
                        out.write(x2[1] + "\t")
                j = e2[-1].find(",")
                out.write(e2[-1][j + 1 :])
