"""content_summ post-processor -> .ordered.RANK call tables.

Reimplements /root/reference/bin/summary.py byte-compatibly: parses the
tab-indented .summ tree, aggregates subtree read counts per rank call (top
strain substituted for species), and annotates with second-peak k-mer
coverage estimates from the _kmer_cov histograms.
"""

from __future__ import annotations

import os

from .py2fmt import py2_int_dict_order, py2_str


class Summary:
    def __init__(self, rankfile: str, fsummfile: str, plasmid_file: str,
                 legacy: bool = False):
        # legacy=True reproduces the reference script under Python 2: str()
        # floats at 12 significant digits and k-coverage columns in py2
        # small-int dict hash order (see reporting/py2fmt.py)
        self.legacy = legacy
        self.plasmids = set()
        with open(plasmid_file) as f:
            for ln in f:
                ln = ln.rstrip()
                if ln:
                    self.plasmids.add(int(ln))
        self.rank_map = {}
        with open(rankfile) as f:
            for ln in f:
                vl = ln.split()
                if len(vl) >= 2:
                    self.rank_map.setdefault(int(vl[0]), vl[1])
        self.fsum = {}
        with open(fsummfile) as f:
            for ln in f:
                ln = ln.rstrip()
                vl = ln.split()
                if len(vl) >= 3:
                    self.fsum.setdefault(int(vl[2]), ln)
        self.rdcnt = {}
        self.wrdcnt = {}

    def is_plasmid(self, tid: int) -> bool:
        return tid >= 10000000 or tid in self.plasmids

    # -- .summ tree ---------------------------------------------------------

    def load_tree(self, summfile: str):
        names = {}
        child: dict[int, list[int]] = {}
        lines = [(1, 0)]
        with open(summfile) as f:
            for raw in f:
                line = raw.rstrip()
                vals = line.split("\t")
                if vals[0] == "Name":
                    continue
                num_tabs = 0
                for v in vals:
                    if v != "":
                        break
                    num_tabs += 1
                i = num_tabs
                pn, cnode, val2, val3 = vals[i], int(vals[i + 1]), int(vals[i + 2]), float(vals[i + 3])
                names[cnode] = pn
                self.rdcnt[cnode] = val2
                self.wrdcnt[cnode] = val3
                while lines:
                    pnode, last_tab_cnt = lines[0]
                    if num_tabs > last_tab_cnt:
                        child.setdefault(pnode, []).append(cnode)
                        break
                    lines.pop(0)
                lines.insert(0, (cnode, num_tabs))
        return child, names

    # -- per-call subtree aggregation ---------------------------------------

    def _summ_node(self, cnode, call_type, child):
        tot_wrdcnt, tot_rdcnt = 0, 0
        the_call = cnode
        matches = (
            cnode in self.rank_map
            and self.rank_map[cnode] == call_type
            and not self.is_plasmid(cnode)
        ) or (self.is_plasmid(cnode) and call_type == "plasmid")
        if matches:
            tot_wrdcnt = self.wrdcnt[cnode]
            tot_rdcnt = self.rdcnt[cnode]
            save_strains = []
            lopen = list(child.get(cnode, []))
            while lopen:
                alt = lopen.pop(0)
                # replicate the reference's operator-precedence quirk:
                # (species and not plasmid) or (not species and rdcnt>0)
                if (call_type == "species" and not self.is_plasmid(alt)) or (
                    call_type != "species" and self.rdcnt[alt] > 0
                ):
                    tot_wrdcnt += self.wrdcnt[alt]
                    tot_rdcnt += self.rdcnt[alt]
                if (
                    call_type == "species"
                    and alt in self.rank_map
                    and self.rank_map[alt] == "strain"
                    and not self.is_plasmid(alt)
                    and self.rdcnt[alt] > 0
                ):
                    save_strains.append(alt)
                lopen.extend(child.get(alt, []))
            if save_strains:
                slst = sorted(save_strains, key=lambda v: self.wrdcnt[v], reverse=True)
                the_call = slst[0]
        return (cnode, the_call, tot_wrdcnt, tot_rdcnt)

    def _traverse(self, call_type, child):
        save_calls = []
        lopen = [1]
        while lopen:
            cnode = lopen.pop(0)
            if (call_type == "plasmid" and self.is_plasmid(cnode)) or (
                cnode in self.rank_map
                and call_type == self.rank_map[cnode]
                and not self.is_plasmid(cnode)
            ):
                result = self._summ_node(cnode, call_type, child)
                if result[3] > 0:
                    save_calls.append(result)
            else:
                for nd in child.get(cnode, []):
                    lopen.insert(0, nd)
        return save_calls

    # -- coverage histograms ------------------------------------------------

    @staticmethod
    def _find_peak(arr):
        fnd_first_local_min = False
        copy_val = -1
        for it in range(1, len(arr) - 1):
            if (
                not fnd_first_local_min
                and arr[it - 1][1] >= arr[it][1]
                and arr[it][1] < arr[it + 1][1]
            ):
                fnd_first_local_min = True
            if (
                fnd_first_local_min
                and arr[it - 1][1] <= arr[it][1]
                and arr[it][1] > arr[it + 1][1]
            ):
                copy_val = arr[it][0]
                break
        return copy_val

    def load_kmer_stats(self, ifile, rank):
        hold = {}
        save_distr = False
        distr = []
        tot_kcnt = tid = kval = kcnt = -1
        with open(ifile) as fh:
            while True:
                ln = fh.readline().rstrip()
                if ln == "" or ("taxid=" in ln and "distinct_kmer_cnt=" in ln):
                    if distr:
                        val = self._find_peak(distr)
                        hold.setdefault(tid, {})
                        hold[tid].setdefault(kval, (val, kcnt, tot_kcnt))
                    if ln == "":
                        break
                    save_distr = False
                    distr = []
                    vals = ln.split("=")
                    tid = int(vals[1].split(" ")[0])
                    if tid in self.rank_map and rank == self.rank_map[tid]:
                        kcnt = int(vals[2].split(" ")[0])
                        kval = int(vals[3].split(" ")[0])
                        tot_kcnt = int(vals[4].split(" ")[0])
                        save_distr = True
                elif save_distr:
                    vals = ln.split(" ")
                    distr.append((int(vals[2]), int(vals[3])))
        return hold

    # -- output -------------------------------------------------------------

    def _print_calls(self, save_calls, outh, names, kcov):
        rep = sorted(save_calls, key=lambda v: v[2], reverse=True)
        outh.write(
            "% of Reads, Avg Read Score, Weighted Read Count (WRC), "
            "Read Count (RC), Original WRC, Original RC, Name, Taxid\n"
        )
        rc_sum = sum(v[3] for v in rep)
        _s = py2_str if self.legacy else str
        for val in rep:
            rep_id, call_id = val[0], val[1]
            owrc, orc = -1, -1
            if call_id in self.fsum:
                v1 = self.fsum[call_id].split("\t")
                prn_name = v1[3]
                owrc, orc = v1[0], v1[1]
            else:
                prn_name = names[call_id]
            wrc, rc = val[2], val[3]
            avg = float(wrc) / float(rc)
            tot_pcnt = float(rc) / float(rc_sum)
            pstr = (
                _s(tot_pcnt) + "\t" + _s(avg) + "\t" + _s(wrc) + "\t" + str(rc)
                + "\t" + _s(owrc) + "\t" + _s(orc) + "\t" + prn_name
                + "\t" + str(call_id) + "\t" + str(rep_id)
            )
            if rep_id in kcov:
                kvs = list(kcov[rep_id].keys())
                if self.legacy:
                    kvs = py2_int_dict_order(kvs)
                for kv in kvs:
                    c = kcov[rep_id][kv]
                    pstr += "\t" + str(kv) + "," + str(c[0]) + "," + str(c[1]) + "," + str(c[2])
            outh.write(pstr + "\n")

    def run(self, summfile: str, out_base: str, rank_calls: str):
        child, names = self.load_tree(summfile)
        outputs = []
        for ranktype in rank_calls.split(","):
            outfile = out_base + "." + ranktype
            outputs.append(outfile)
            redun_file = summfile + "." + ranktype + "_kmer_cov"
            kcov = {}
            if os.path.isfile(redun_file):
                kcov = self.load_kmer_stats(redun_file, ranktype)
            save_calls = self._traverse(ranktype, child)
            with open(outfile, "w") as outh:
                self._print_calls(save_calls, outh, names, kcov)
        return outputs
