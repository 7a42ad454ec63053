#!/usr/bin/env python3
"""Write synthetic null-model files for the fixture in the .rand_lst format
consumed by read_label's loadRandHits (read_label.cpp:512-678):

  line 1: num_bins
  rows:   tid rank-parent {num_obs max_val kmer_cnt} x num_bins

Values are chosen to exercise every branch of the loader: normal cutoffs,
num_obs==0 with kmer_cnt >= 100000 (forced 0.5), num_obs==0 with small
kmer_cnt (neighbor-fill "revisit" logic), the taxid==562 e-coli save, and the
taxid==28384 override.
"""

import gzip
import os
import random
import sys

BINS = 10

# (tid, class) rows; classes must be resolvable by gRank2num
TIDS = [
    (1, "depth=0"), (131567, "depth=0"), (2, "kingdom"), (1224, "phylum"),
    (561, "genus"), (562, "species"), (5621, "species"), (5622, "species"),
    (564, "species"), (5641, "species"), (590, "genus"), (28901, "species"),
    (289011, "species"), (289012, "species"), (1239, "phylum"),
    (1578, "genus"), (1598, "species"), (15981, "species"),
    (2759, "kingdom"), (9606, "genus"), (10239, "kingdom"),
    (32630, "genus"), (10000007, "no_rank"), (28384, "genus"),
]


def gen_file(path, read_len, rng):
    lines = [str(BINS)]
    for tid, cls in TIDS:
        parts = [f"{tid} {cls}-{1}"]
        for b in range(BINS):
            r = rng.random()
            if r < 0.12:
                # no observations, huge genome -> loader forces 0.5
                parts.append("0 0 150000")
            elif r < 0.25:
                # no observations, small genome -> neighbor fill
                parts.append("0 0 5000")
            else:
                max_val = round(rng.uniform(0.05, 0.65), 4)
                num_obs = rng.randrange(1, 500)
                kcnt = rng.randrange(2000, 90000)
                parts.append(f"{num_obs} {max_val} {kcnt}")
        lines.append(" ".join(parts))
    with gzip.open(path, "wt") as f:
        f.write("\n".join(lines) + "\n")


def main():
    outdir = sys.argv[1]
    rng = random.Random(777)
    files = []
    for read_len in (81, 181):
        name = f"null.bin.10.fixture.{read_len}.rand_lst.gz"
        gen_file(os.path.join(outdir, name), read_len, rng)
        files.append((read_len, name))
    with open(os.path.join(outdir, "null_lst.txt"), "w") as f:
        for read_len, name in files:
            f.write(f"{read_len} {name}\n")
    print("null model files written:", [n for _, n in files])


if __name__ == "__main__":
    main()
