#!/usr/bin/env python3
"""Generate a gene-annotation fixture: gene regions cut from the fixture
genomes, a gene k-mer DB input (.int fasta with gene-id headers), and the
gzipped gene-name table consumed by gene_label -g."""

import gzip
import os
import random
import sys

from pathlib import Path


def main():
    fix = Path(sys.argv[1])
    rng = random.Random(4242)
    genomes = {}
    hdr = None
    for line in (fix / "genomes.fa").read_text().splitlines():
        if line.startswith(">"):
            hdr = int(line[1:].split()[0])
        else:
            genomes[hdr] = genomes.get(hdr, "") + line

    gid = 9000001
    genes = []  # (gid, tid, seq)
    for tid, seq in sorted(genomes.items()):
        for _ in range(3):
            ln = rng.randrange(150, 500)
            st = rng.randrange(0, max(1, len(seq) - ln))
            genes.append((gid, tid, seq[st : st + ln]))
            gid += 1

    with open(fix / "genes.fa", "w") as f:
        for g, tid, seq in genes:
            f.write(f">{g}\n{seq}\n")
    # tab-separated like the real gn_ref2 table; within a genesummary line the
    # tab-split fields become t[3]=tid t[4]=gid ... t[7]=type (fsreport.py
    # reads t[4] as geneid and t[7] as the rRNA marker)
    with gzip.open(fix / "gene_names.txt.gz", "wt") as f:
        for i, (g, tid, seq) in enumerate(genes):
            ftype = "rRNA" if i % 5 == 0 else "CDS"
            f.write(
                f"{tid}\t{g}\tNC_{tid}\t1..{len(seq)}\t{ftype}\t"
                f"gene=g{g},product=protein_{g},len={len(seq)}\n"
            )
    print(f"{len(genes)} genes written")


if __name__ == "__main__":
    main()
