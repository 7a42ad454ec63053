"""Build the runtime-input taxonomy bundle from NCBI dump files.

Replaces the reference's DB-prep scripts (bin/build_header_table.py,
Tid16_getMapping.py, build_tid_numeric_rank_table.py, pyLMAT's
parse_ncbi_taxonomy.py): parse nodes.dmp/names.dmp and emit every runtime
input the classifier consumes:

  taxtree        LMAT tree format (TaxNode.hpp:131-147)
  depth file     "tid depth" (edges to root)
  rank file      "tid rank" (ranks below species coerced to "strain",
                 matching ncbi_taxid_to_rank semantics)
  rank-ids file  "ktaxid=..,rank=..,taxid=..,..\\t<rank,name>..." lineages
  numeric ranks  "tid priority" for rank-priority pruning (deeper = higher)
  32->16 map     "tid32 tid16" compaction table
"""

from __future__ import annotations

import os

# ranks at-or-below species collapse to "strain" in the reference's rank table
BELOW_SPECIES = {
    "subspecies", "varietas", "forma", "strain", "isolate", "serotype",
    "serogroup", "genotype", "biotype", "morph", "pathogroup", "forma specialis",
}


def parse_ncbi_dumps(nodes_dmp: str, names_dmp: str):
    """Returns (parent {tid:par}, rank {tid:rank}, name {tid:scientific name})."""
    parent: dict[int, int] = {}
    rank: dict[int, str] = {}
    with open(nodes_dmp) as f:
        for line in f:
            t = [x.strip() for x in line.split("|")]
            tid, par = int(t[0]), int(t[1])
            parent[tid] = par
            rank[tid] = t[2].replace(" ", "_") if t[2] else "no_rank"
    names: dict[int, str] = {}
    with open(names_dmp) as f:
        for line in f:
            t = [x.strip() for x in line.split("|")]
            if len(t) >= 4 and t[3] == "scientific name":
                names[int(t[0])] = t[1]
    return parent, rank, names


def write_bundle(parent: dict, rank: dict, names: dict, outdir: str,
                 keep: set | None = None):
    """Write the full runtime bundle.  `keep`: optional taxid subset (the
    bundle is pruned to keep + all ancestors, like the reference's .pruned
    files)."""
    os.makedirs(outdir, exist_ok=True)

    def path_to_root(tid):
        out = []
        cur = tid
        while True:
            par = parent.get(cur, cur)
            if par == cur:
                break
            out.append(par)
            cur = par
        return out

    if keep is not None:
        full = set()
        for t in keep:
            if t in parent:
                full.add(t)
                full.update(path_to_root(t))
        tids = sorted(full)
    else:
        tids = sorted(parent)
    tidset = set(tids)

    children: dict[int, list] = {t: [] for t in tids}
    for t in tids:
        p = parent.get(t, t)
        if p != t and p in tidset:
            children[p].append(t)

    def eff_rank(tid):
        r = rank.get(tid, "no_rank")
        if r in BELOW_SPECIES or r.replace("_", " ") in BELOW_SPECIES:
            return "strain"
        if r == "superkingdom":
            return "kingdom"
        return r

    with open(os.path.join(outdir, "taxtree.dat"), "w") as f:
        f.write("#NCBI taxonomy (lmat_tpu build_taxonomy)\n#LMAT tree format\n")
        f.write(f"{len(tids)}\n")
        for t in tids:
            ch = sorted(children[t])
            p = parent.get(t, t)
            if p not in tidset:
                p = t
            f.write(f"{t} {len(ch)} {' '.join(map(str, ch))}{' ' if ch else ''}{p}\n")
            f.write(f"{names.get(t, f'taxid_{t}')}\n")

    with open(os.path.join(outdir, "depth.dat"), "w") as f:
        for t in tids:
            f.write(f"{t} {len(path_to_root(t))}\n")

    with open(os.path.join(outdir, "ranks.dat"), "w") as f:
        for t in tids:
            f.write(f"{t} {eff_rank(t)}\n")

    with open(os.path.join(outdir, "taxids.info"), "w") as f:
        for t in tids:
            lineage = [x for x in reversed(path_to_root(t)) if x != 1] + (
                [t] if t != 1 else []
            )
            disp = lambda r: "no rank" if r == "no_rank" else r
            meta = f"ktaxid={t},rank={disp(eff_rank(t))},taxid={t},depth={len(path_to_root(t))}"
            fields = [f"{disp(eff_rank(x))},{names.get(x, f'taxid_{x}')}" for x in lineage]
            if not fields:
                fields = [f"{disp(eff_rank(t))},{names.get(t, 'root')}"]
            f.write(meta + "\t" + "\t".join(fields) + "\n")

    with open(os.path.join(outdir, "numeric_ranks"), "w") as f:
        for t in tids:
            f.write(f"{t} {len(path_to_root(t))}\n")

    if len(tids) < 65534:
        with open(os.path.join(outdir, "m32to16.map"), "w") as f:
            for i, t in enumerate(tids, start=2):
                f.write(f"{t} {i}\n")
    return tids
