#!/usr/bin/env python3
"""Edge-case read set: boundary lengths, N runs, case variants, chimeras,
duplicate-heavy and degenerate-symbol reads, empty headers."""

import sys


def main():
    fix = sys.argv[1]
    genomes = {}
    hdr = None
    for line in open(fix + "/genomes.fa"):
        line = line.strip()
        if line.startswith(">"):
            hdr = int(line[1:].split()[0])
        else:
            genomes[hdr] = genomes.get(hdr, "") + line
    g = genomes[289011]
    h = genomes[9606]
    reads = [
        ("exact_k", g[:20]),
        ("k_minus_1", g[:19]),
        ("n_only", "N" * 100),
        ("n_runs", g[:30] + "NNNN" + g[40:80] + "N" + g[90:140]),
        ("lowercase", g[200:320].lower()),
        ("mixed_case", "".join(c.lower() if i % 3 else c for i, c in enumerate(g[300:420]))),
        ("exact49", g[500:549]),
        ("exact48", g[500:548]),
        ("human_mix", h[100:160] + g[600:660]),
        ("dup_heavy", (g[700:725]) * 6),
        ("iupac", g[800:860].replace("A", "R", 3)),
        ("", g[900:1020]),
    ]
    with open(fix + "/edge_reads.fa", "w") as f:
        for hd, seq in reads:
            f.write(f">{hd}\n" if hd else ">\n")
            for i in range(0, len(seq), 80):
                f.write(seq[i : i + 80] + "\n")
    with open(fix + "/edge_reads.fq", "w") as f:
        for hd, seq in reads:
            if not seq:
                continue
            f.write(f"@{hd or 'x'}\n{seq}\n+\n{'I' * len(seq)}\n")
    print(f"{len(reads)} edge reads written")


if __name__ == "__main__":
    main()
