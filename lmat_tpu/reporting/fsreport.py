"""Rank-level fastsummary reports (.species/.genus/.plasmid files).

Reimplements /root/reference/bin/fsreport.py: bins fastsummary rows up-tree to
the requested ranks, detects the top strain per species, and optionally
augments with rRNA/gene columns from a (sorted) genesummary file.  Output is
byte-compatible (same float formatting via Python str()/%.4f).
"""

from __future__ import annotations

import os

from .py2fmt import py2_str


def is_plasmid(plasmids: set, tid: str) -> bool:
    return tid in plasmids or 10000000 <= int(tid) < 20000000


class TaxFiles:
    """The $LMAT_DIR runtime inputs fsreport needs, as string-keyed maps."""

    def __init__(self, taxtree_path, rank_path, plasmid_path, plasmid_names_path):
        self.plasmids = set()
        with open(plasmid_path) as f:
            for line in f:
                self.plasmids.add(line.rstrip())
        self.plasname = {}
        with open(plasmid_names_path) as f:
            for line in f:
                vals = line.rstrip().split("\t")
                if vals and vals[0]:
                    self.plasname[vals[0]] = vals[-1]
        self.ranktable = {}
        with open(rank_path) as f:
            for line in f:
                vals = line.split()
                if len(vals) >= 2:
                    self.ranktable[vals[0]] = vals[1]
        self.parent = {"1": "1"}
        self.names = {}
        with open(taxtree_path) as f:
            f.readline()
            f.readline()
            f.readline()
            while True:
                hdr = f.readline()
                if not hdr:
                    break
                name = f.readline()
                t = hdr.split()
                if not t:
                    continue
                self.parent[t[0]] = t[-1]
                self.names[t[0]] = name.rstrip("\n")


def get_rank_tid(rank, tid, ranks, parent, plasmids):
    stid = tid
    if (stid in ranks and rank == ranks[stid]) or (
        rank == "plasmid" and is_plasmid(plasmids, tid)
    ):
        return tid
    while parent.get(stid, stid) != stid:
        if stid in ranks and ranks[stid] == rank:
            return stid
        stid = parent[stid]
    return -1


def fsreport(fsfile: str, rank_lst_str: str, odir: str, tf: TaxFiles,
             gsfile: str = "", min_gene_cnt: int = 2, legacy: bool = False):
    """legacy=True prints floats with Python-2 str() semantics (the shipped
    example outputs are py2 products; see reporting/py2fmt.py)."""
    _s = py2_str if legacy else str
    rank_lst = rank_lst_str.split(",")
    orig = {}
    store = {}
    with open(fsfile) as f:
        for raw in f:
            line = raw.rstrip()
            t = line.split("\t")
            if len(t) < 4:
                continue
            wrc, count, taxid = t[0], t[1], t[2]
            orig[taxid] = t[3]
            if taxid not in tf.parent and taxid != 1:
                tf.parent.setdefault(taxid, "1")
            for rank in rank_lst:
                tid = get_rank_tid(rank, taxid, tf.ranktable, tf.parent, tf.plasmids)
                if tid == -1:
                    continue
                store.setdefault(rank, {}).setdefault(tid, []).append((taxid, wrc, count))

    gene_store = {}
    gene_cnt = {}
    if gsfile:
        with open(gsfile) as f:
            for raw in f:
                t = raw.rstrip().split("\t")
                if len(t) < 8:
                    continue
                rc, taxid, geneid, gtype = t[1], t[2], t[4], t[7]
                if taxid == "0":
                    continue
                if taxid not in tf.parent:
                    tf.parent.setdefault(taxid, "1")
                for rank in rank_lst:
                    tid = get_rank_tid(rank, taxid, tf.ranktable, tf.parent, tf.plasmids)
                    if tid == -1:
                        continue
                    if gtype == "rRNA":
                        gene_store.setdefault(rank, {}).setdefault(tid, []).append((taxid, rc))
                    if int(rc) > min_gene_cnt:
                        gene_cnt.setdefault(rank, {}).setdefault(tid, {}).setdefault(geneid, 0)
                        gene_cnt[rank][tid][geneid] += int(rc)

    outputs = []
    for rank in list(store.keys()):
        fsname = os.path.basename(fsfile)
        fsfileout = os.path.join(odir, fsname + "." + rank)
        outputs.append(fsfileout)
        with open(fsfileout, "w") as fh:
            save = []
            for tid in list(store[rank].keys()):
                if tid in tf.plasmids and tid in tf.plasname and rank == "plasmid":
                    name_str = tf.plasname[tid]
                elif tid in orig:
                    name_str = orig[tid]
                else:
                    name_str = tf.names.get(tid, "")
                idx = name_str.find(",")
                if idx != -1:
                    name_str = name_str[idx + 1 :]
                lst = store[rank][tid]
                if len(lst) == 1 and is_plasmid(tf.plasmids, tid) and rank != "plasmid":
                    continue
                best_wrc, best_count = -1, -1
                top_strain = -1
                wrc_sum, count_sum = 0, 0
                for taxid, wrc, count in lst:
                    if is_plasmid(tf.plasmids, taxid):
                        tf.ranktable[taxid] = "plasmid"
                    wrc_sum += float(wrc)
                    count_sum += int(count)
                    if rank == "species" and tf.ranktable.get(taxid) == "strain":
                        if best_wrc < float(wrc):
                            top_strain = taxid
                            best_wrc = float(wrc)
                            best_count = count
                strain_info = ""
                if top_strain != -1:
                    strain_info = (
                        "\t" + _s(best_wrc) + "\t" + _s(best_count)
                        + "\t" + top_strain + "\t" + orig[top_strain]
                    )
                gene_lst = gene_store.get(rank, {}).get(tid, [])
                rrna_csum = sum(int(c) for _, c in gene_lst)
                gene_ids = gene_cnt.get(rank, {}).get(tid, {})
                gene_read_cnt = sum(gene_ids.values())
                save.append(
                    (wrc_sum, count_sum, tid, name_str, rrna_csum,
                     len(gene_ids), gene_read_cnt, strain_info)
                )
            sval = sorted(save, key=lambda v: v[0], reverse=True)
            if gsfile:
                fh.write(
                    "Average Read Score\tTotal Read Score\tRead Count\t"
                    "Pcnt. rRNA\tNo. Genes\tNo. Gene Reads\tTaxID\tName\tStrain Info\n"
                )
            else:
                fh.write(
                    "Average Read Score\tTotal Read Score\tRead Count\t"
                    "TaxID\tName\tStrain Info\n"
                )
            for val in sval:
                avg = float(val[0]) / float(val[1])
                astr = "%.4f" % avg
                if gsfile:
                    pcnt = float(val[4]) / float(val[1])
                    fstr = "%.4f" % pcnt
                    out_str = (
                        astr + "\t" + _s(val[0]) + "\t" + _s(val[1]) + "\t" + fstr
                        + "\t" + _s(val[5]) + "\t" + _s(val[6]) + "\t"
                        + str(val[2]) + "\t" + val[3] + val[7]
                    )
                else:
                    out_str = (
                        astr + "\t" + _s(val[0]) + "\t" + _s(val[1]) + "\t"
                        + str(val[2]) + "\t" + val[3] + val[7]
                    )
                fh.write(out_str + "\n")
    return outputs
