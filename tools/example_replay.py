#!/usr/bin/env python3
"""Reconstruct LMAT runtime inputs from the reference's shipped example outputs.

The reference ships its de-facto integration test as `example/example.tgz`:
a 1000-read input plus the complete output chain (per-thread .out files,
.fastsummary, .lineage, rank reports, .summ content tree + _kmer_cov
histograms, gene summaries).  The classification step needs the unavailable
18 GB database, but every post-classification stage takes the shipped
.out/.fastsummary files as input — IF the runtime tree/rank inputs
($LMAT_DIR files, not shipped) are available.

This module rebuilds them from the outputs themselves:

  taxtree (.dat.nohl format)  <- the .summ tree (indentation = parentage,
                                 file order = child order)
  rank table (taxid -> token)  <- fastsummary col4 first fields
                                 ("species group"->"species_group" etc.),
                                 plus "strain" for nodes strictly below a
                                 species (the NCBI pruned-rank convention)
  rank-ids file (tolineage -u) <- .summ paths + .lineage printed-name
                                 evidence (a lineage entry printed <=> its
                                 rank is not "no rank"), self entries byte-
                                 equal to fastsummary col4
  plasmid files                <- empty (the example has no plasmids)

Validation: `python tools/example_replay.py` reconstructs the inputs and runs
the REFERENCE's own bin/{tolineage,fsreport,summary}.py against them,
byte-comparing to the shipped outputs — proving the reconstruction is
faithful before lmat_tpu's implementations are held to the same bar
(tests/test_golden_example.py).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tarfile

EXAMPLE_TGZ = "/root/reference/example/example.tgz"
FS_BASE = "simple_list.1000.fna.kML+Human.v4-14.20.g10.db.lo.rl_output.0.30.fastsummary"
GL_BASE = "rl_output.flst.allgenes.7-14.20.db.gl_output"
RANK_FILES = (
    "depth=0", "superkingdom", "kingdom", "subkingdom", "phylum", "order",
    "family", "genus", "species_group", "species", "strain",
)


def extract(workdir: str) -> str:
    exdir = os.path.join(workdir, "example")
    if not os.path.isdir(exdir):
        os.makedirs(exdir, exist_ok=True)
        with tarfile.open(EXAMPLE_TGZ) as tf:
            tf.extractall(exdir, filter="data")
    return exdir


def parse_summ(path):
    """-> (names {tid:str}, parent {tid:tid}, children {tid:[tid]} in file
    order, depth {tid:int})."""
    names, parent, children, depth = {}, {1: 1}, {}, {}
    stack = []  # (tid, n_tabs)
    with open(path) as f:
        for raw in f:
            vals = raw.rstrip("\n").split("\t")
            if vals[0] == "Name":
                continue
            tabs = 0
            while vals[tabs] == "":
                tabs += 1
            name, tid = vals[tabs], int(vals[tabs + 1])
            names[tid] = name
            depth[tid] = tabs
            while stack and stack[-1][1] >= tabs:
                stack.pop()
            if stack:
                p = stack[-1][0]
                parent[tid] = p
                children.setdefault(p, []).append(tid)
            else:
                parent[tid] = tid
            stack.append((tid, tabs))
    return names, parent, children, depth


def parse_fastsummary(path):
    rows = []
    with open(path) as f:
        for raw in f:
            t = raw.rstrip("\n").split("\t")
            if len(t) >= 4:
                rows.append((t[0], int(t[1]), int(t[2]), t[3]))
    return rows


def path_to(tid, parent):
    path = [tid]
    while parent.get(tid, tid) != tid:
        tid = parent[tid]
        path.append(tid)
    return path[::-1]


def reconstruct(exdir: str, outdir: str) -> dict:
    """Write the runtime inputs into outdir; returns {role: path}."""
    os.makedirs(outdir, exist_ok=True)
    fs_path = os.path.join(exdir, FS_BASE)
    names, parent, children, depth = parse_summ(fs_path + ".summ")
    fs = parse_fastsummary(fs_path)

    # ---- rank table (single-token vocab) ---------------------------------
    rank = {}
    for _, _, tid, col4 in fs:
        tok = col4.split(",")[0].replace(" ", "_")
        rank[tid] = tok
    # kmer_cov headers confirm rank membership for covered taxa
    for rk in RANK_FILES:
        cov = f"{fs_path}.summ.{rk}_kmer_cov"
        if os.path.exists(cov):
            with open(cov) as f:
                for line in f:
                    if line.startswith("taxid="):
                        t = int(line.split()[0].split("=")[1])
                        rank.setdefault(t, rk)
    # below-species nodes carry the "strain" keyword in the rank table
    # (run_rl.sh:57: 'uses a keyword "strain" to identify ranks below species')
    for tid in names:
        t = tid
        while parent.get(t, t) != t:
            t = parent[t]
            if rank.get(t) == "species":
                rank[tid] = "strain"
                break

    rank_path = os.path.join(outdir, "ncbi_taxid_to_rank.pruned.txt")
    with open(rank_path, "w") as f:
        for tid in sorted(names):
            f.write(f"{tid} {rank.get(tid, 'no_rank')}\n")

    # ---- taxtree (.dat.nohl) ---------------------------------------------
    tree_path = os.path.join(outdir, "ncbi_taxonomy.segment.pruned.dat.nohl")
    with open(tree_path, "w") as f:
        f.write("#reconstructed from example.tgz outputs\n#LMAT tree format\n")
        f.write(f"{len(names)}\n")
        for tid in names:
            ch = children.get(tid, [])
            f.write(
                f"{tid} {len(ch)}"
                + ("" if not ch else " " + " ".join(str(c) for c in ch))
                + f" {parent[tid]}\n{names[tid]}\n"
            )

    # ---- rank-ids file (tolineage / read_label -u) ------------------------
    # printed-name evidence: tolineage printed an ancestor <=> it is ranked.
    # .lineage rows follow fastsummary order, filtered to count > 10.
    ranked_votes: dict[int, bool] = {}
    lin_path = fs_path + ".lineage"
    if os.path.exists(lin_path):
        lin_rows = [l.rstrip("\n").split("\t") for l in open(lin_path)]
        big = [(c, tid) for _, c, tid, _ in fs if c > 10]
        assert len(big) == len(lin_rows), (len(big), len(lin_rows))
        for (count, tid), row in zip(big, lin_rows):
            assert int(row[0]) == count, (tid, row)
            printed = row[1:-1]  # ancestors; row[-1] is the self name
            path = path_to(tid, parent)[:-1]  # ancestors incl. root
            j = 0
            for node in path:
                if j < len(printed) and names[node] == printed[j]:
                    assert ranked_votes.get(node, True), (node, "conflict")
                    ranked_votes[node] = True
                    j += 1
                else:
                    assert not ranked_votes.get(node, False), (node, "conflict")
                    ranked_votes[node] = False
            assert j == len(printed), (tid, printed[j:])

    fs_col4 = {tid: col4 for _, _, tid, col4 in fs}

    def lineage_entry(tid):
        if tid == 1:
            return "no rank,root"  # dropped by tolineage in ancestor position
        if tid in fs_col4:
            return fs_col4[tid]
        tok = rank.get(tid, "no_rank")
        if tok != "no_rank" and not ranked_votes.get(tid, tok != "no_rank"):
            tok = "no_rank"  # evidence says unranked; trust the lineage
        if tok == "no_rank" or not ranked_votes.get(tid, tok != "no_rank"):
            tok = "no_rank" if not ranked_votes.get(tid, False) else "clade"
        return f"{tok.replace('_', ' ')},{names[tid]}"

    ids_path = os.path.join(outdir, "ncbi_taxonomy_rank.segment.pruned.txt")
    with open(ids_path, "w") as f:
        for tid in names:
            if tid == 1:
                f.write("depth=0,taxid=1,ktaxid=1,entries=-1\n")
                continue
            path = path_to(tid, parent)
            entries = [lineage_entry(t) for t in path[:-1]]
            entries.append(fs_col4.get(tid, lineage_entry(tid)))
            f.write(
                f"depth={len(path)-1},taxid={tid},ktaxid={tid},entries=-1\t"
                + "\t".join(entries) + "\n"
            )

    # ---- plasmid files (none in the example) ------------------------------
    plas_path = os.path.join(outdir, "low_numid_plasmids.txt")
    plasn_path = os.path.join(outdir, "plasmid.names.txt")
    open(plas_path, "w").close()
    open(plasn_path, "w").close()

    return {
        "taxtree": tree_path, "ranks": rank_path, "rank_ids": ids_path,
        "plasmids": plas_path, "plasmid_names": plasn_path,
        "fastsummary": fs_path, "exdir": exdir,
    }


# --------------------------------------------------------------------------
# Validation against the reference's own scripts (dev harness, not a test)
# --------------------------------------------------------------------------

def _tok_eq(x: str, y: str) -> bool:
    """Equal tokens, treating float spellings as equal when the values agree
    to 1e-9 (the shipped outputs carry Python-2 str() floats; the reference
    scripts run here under Python 3)."""
    if x == y:
        return True
    try:
        fx, fy = float(x), float(y)
    except ValueError:
        return False
    return abs(fx - fy) <= 1e-9 * max(1.0, abs(fx), abs(fy))


def _cmp(a, b, label):
    la = open(a).read().splitlines()
    lb = open(b).read().splitlines()
    ok = len(la) == len(lb)
    first_bad = None
    if ok:
        for i, (x, y) in enumerate(zip(la, lb)):
            tx = [t for f in x.split("\t") for t in f.split(",")]
            ty = [t for f in y.split("\t") for t in f.split(",")]
            # compare per sorted token multiset too: py2 dict order may
            # permute columns within a line
            if len(tx) != len(ty) or not all(
                any(_tok_eq(u, v) for v in ty) for u in tx
            ):
                ok, first_bad = False, (i, x, y)
                break
    status = "OK " if ok else "DIFF"
    print(f"  [{status}] {label}")
    if first_bad:
        i, x, y = first_bad
        print(f"    line {i}: ours {x!r}\n             ship {y!r}")
    elif len(la) != len(lb):
        print(f"    line counts {len(la)} vs {len(lb)}")
    return ok


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/example_replay"
    exdir = extract(work)
    lmat_dir = os.path.join(work, "lmat_dir")
    paths = reconstruct(exdir, lmat_dir)
    odir = os.path.join(work, "ref_out")
    os.makedirs(odir, exist_ok=True)
    env = dict(os.environ, LMAT_DIR=lmat_dir)
    fs = paths["fastsummary"]
    ok = True

    # tolineage.py taxfile fastsummary out 10 0
    out = os.path.join(odir, "lineage")
    subprocess.run(
        [sys.executable, "/root/reference/bin/tolineage.py",
         paths["rank_ids"], fs, out, "10", "0"],
        check=True, env=env, capture_output=True)
    ok &= _cmp(out, fs + ".lineage", "tolineage -> .lineage")

    # fsreport.py fastsummary plasmid,species,genus odir gsfile 10
    gs = os.path.join(exdir, GL_BASE + ".0.1.20.genesummary.min_tax_score.0")
    subprocess.run(
        [sys.executable, "/root/reference/bin/fsreport.py", fs,
         "plasmid,species,genus", odir, gs, "10"],
        check=True, env=env, capture_output=True)
    for rk in ("species", "genus"):
        ok &= _cmp(os.path.join(odir, FS_BASE + "." + rk),
                   fs + "." + rk, f"fsreport -> .{rk}")

    # summary.py summ rankfile fastsummary plasfile out_base ranks
    obase = os.path.join(odir, "ordered")
    subprocess.run(
        [sys.executable, "/root/reference/bin/summary.py", fs + ".summ",
         paths["ranks"], fs, paths["plasmids"], obase,
         "plasmid,species,genus"],
        check=True, env=env, capture_output=True)
    for rk in ("plasmid", "species", "genus"):
        ok &= _cmp(obase + "." + rk, fs + ".ordered." + rk,
                   f"summary -> .ordered.{rk}")

    print("reconstruction " + ("FAITHFUL" if ok else "NOT faithful"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
