#!/usr/bin/env python3
"""Generate a small synthetic metagenomics fixture:

  taxtree.dat    LMAT-format taxonomy tree
  depth.dat      tid depth pairs (the read_label -e input)
  ranks.dat      tid rank pairs (the read_label -w input)
  taxids.info    rank-ids file (the read_label -u input: ...,taxid=N,...\tNAME)
  genomes.fa     single-line ".int" fasta, header = taxid (kmerPrefixCounter input)
  reads.fa       query reads (80-col wrapped, mixed strands/errors/Ns)

The taxonomy has genus/species/strain structure plus human (9606),
phiX/synthetic (32630), and a plasmid-range tid so the special-case logic in
the classifier is exercised.
"""

import argparse
import os
import random

# tid -> (parent, rank, name, depth)
TAX = {
    1:        (1,      "no_rank", "root", 0),
    131567:   (1,      "no_rank", "cellular organisms", 1),
    2:        (131567, "kingdom", "Bacteria", 2),
    1224:     (2,      "phylum", "Proteobacteria", 3),
    561:      (1224,   "genus", "GenusA", 4),
    562:      (561,    "species", "SpeciesA1", 5),
    5621:     (562,    "strain", "StrainA1a", 6),
    5622:     (562,    "strain", "StrainA1b", 6),
    564:      (561,    "species", "SpeciesA2", 5),
    5641:     (564,    "strain", "StrainA2a", 6),
    590:      (1224,   "genus", "GenusB", 4),
    28901:    (590,    "species", "SpeciesB1", 5),
    289011:   (28901,  "strain", "StrainB1a", 6),
    289012:   (28901,  "strain", "StrainB1b", 6),
    1239:     (2,      "phylum", "Firmicutes", 3),
    1578:     (1239,   "genus", "GenusC", 4),
    1598:     (1578,   "species", "SpeciesC1", 5),
    15981:    (1598,   "strain", "StrainC1a", 6),
    2759:     (131567, "kingdom", "Eukaryota", 2),
    9606:     (2759,   "species", "Homo sapiens", 3),
    10239:    (1,      "kingdom", "Viruses", 1),
    32630:    (10239,  "species", "synthetic construct phiX", 2),
    10000007: (28901,  "no_rank", "PlasmidB1", 6),
}

GENOME_TIDS = [5621, 5622, 5641, 289011, 289012, 15981, 9606, 32630, 10000007]


def children_map():
    ch = {t: [] for t in TAX}
    for t, (p, _, _, _) in TAX.items():
        if p != t:
            ch[p].append(t)
    return ch


def write_taxonomy(outdir):
    ch = children_map()
    with open(os.path.join(outdir, "taxtree.dat"), "w") as f:
        f.write("#fixture taxonomy\n#LMAT tree format\n")
        f.write(f"{len(TAX)}\n")
        for t in sorted(TAX):
            kids = sorted(ch[t])
            p = TAX[t][0]
            f.write(f"{t} {len(kids)} {' '.join(map(str, kids))}{' ' if kids else ''}{p}\n")
            f.write(f"{TAX[t][2]}\n")
    with open(os.path.join(outdir, "depth.dat"), "w") as f:
        for t in sorted(TAX):
            f.write(f"{t} {TAX[t][3]}\n")
    with open(os.path.join(outdir, "ranks.dat"), "w") as f:
        for t in sorted(TAX):
            f.write(f"{t} {TAX[t][1]}\n")
    # rank-ids file in the real ncbi_taxonomy_rank format:
    #   ktaxid=K,rank=R,taxid=N\t<rank,name>\t... (lineage root->self, no root)
    # read_label -u scans for the "taxid" token and takes the last tab field
    # as the display name; tolineage uses the comma-field t[2] and the
    # "rank,name" lineage entries.
    def disp_rank(r):
        return "no rank" if r == "no_rank" else r

    with open(os.path.join(outdir, "taxids.info"), "w") as f:
        for t in sorted(TAX):
            lineage = []
            cur = t
            while True:
                lineage.append(cur)
                if TAX[cur][0] == cur:
                    break
                cur = TAX[cur][0]
            lineage.reverse()  # root ... self
            lineage = [x for x in lineage if x != 1]
            meta = f"ktaxid={t},rank={disp_rank(TAX[t][1])},taxid={t},depth={TAX[t][3]}"
            fields = [f"{disp_rank(TAX[x][1])},{TAX[x][2]}" for x in lineage]
            if not fields:
                fields = [f"{disp_rank(TAX[t][1])},{TAX[t][2]}"]
            f.write(meta + "\t" + "\t".join(fields) + "\n")
    # auxiliary files consumed by fsreport.py
    open(os.path.join(outdir, "low_numid_plasmids.txt"), "w").close()
    open(os.path.join(outdir, "plasmid.names.txt"), "w").close()


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def build_genomes(rng):
    """Strain genomes share genus- and species-level cores so LCA collapse
    produces internal-node labels."""
    genus_core = {g: rand_seq(rng, 900) for g in (561, 590, 1578)}
    species_core = {s: rand_seq(rng, 900) for s in (562, 564, 28901, 1598)}
    species_of = {5621: 562, 5622: 562, 5641: 564, 289011: 28901, 289012: 28901, 15981: 1598}
    genus_of = {562: 561, 564: 561, 28901: 590, 1598: 1578}

    genomes = {}
    for strain, sp in species_of.items():
        g = genus_of[sp]
        genomes[strain] = (
            genus_core[g] + rand_seq(rng, 120) + species_core[sp] + rand_seq(rng, 1400)
        )
    genomes[9606] = rand_seq(rng, 2500)
    genomes[32630] = rand_seq(rng, 1500)
    genomes[10000007] = rand_seq(rng, 1200)
    return genomes


RC = str.maketrans("ACGT", "TGCA")


def make_reads(rng, genomes, n_reads):
    reads = []
    tids = list(genomes)
    for i in range(n_reads):
        r = rng.random()
        if r < 0.04:  # too short
            seq = rand_seq(rng, rng.randrange(10, 45))
            src = "short"
        elif r < 0.10:  # random, no db hits
            seq = rand_seq(rng, rng.randrange(80, 220))
            src = "random"
        else:
            tid = rng.choice(tids)
            g = genomes[tid]
            ln = rng.randrange(100, 240)
            st = rng.randrange(0, max(1, len(g) - ln))
            seq = g[st : st + ln]
            # sprinkle errors
            seq = list(seq)
            for _ in range(rng.randrange(0, 4)):
                p = rng.randrange(len(seq))
                seq[p] = rng.choice("ACGT")
            if rng.random() < 0.08:  # a few N bases
                for _ in range(rng.randrange(1, 4)):
                    seq[rng.randrange(len(seq))] = "N"
            seq = "".join(seq)
            if rng.random() < 0.5:
                seq = seq.translate(RC)[::-1]
            src = f"tid{tid}"
        reads.append((f"read{i}_{src}", seq))
    return reads


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--seed", type=int, default=20260817)
    ap.add_argument("--reads", type=int, default=400)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    rng = random.Random(args.seed)

    write_taxonomy(args.outdir)
    genomes = build_genomes(rng)
    with open(os.path.join(args.outdir, "genomes.fa"), "w") as f:
        for tid in GENOME_TIDS:
            f.write(f">{tid}\n{genomes[tid]}\n")
    reads = make_reads(rng, genomes, args.reads)
    with open(os.path.join(args.outdir, "reads.fa"), "w") as f:
        for hdr, seq in reads:
            f.write(f">{hdr}\n")
            for j in range(0, len(seq), 80):
                f.write(seq[j : j + 80] + "\n")
    print(f"fixture written to {args.outdir}: {len(genomes)} genomes, {len(reads)} reads")


if __name__ == "__main__":
    main()
