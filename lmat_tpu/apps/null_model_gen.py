"""Null-model post-processing — merge_cnts equivalent + pipeline driver.

Replicates /root/reference/bin/merge_cnts.py (run under python3 semantics):
roll sparsely-observed taxids' random-match observations up to representative
ranks, substitute e-coli-equivalent models for problem clades, and emit the
``null.bin.<bins>...rand_lst`` cutoff files plus the ``null_lst.txt`` index
consumed by the classifier (read_len key = read length - (k-1), i.e. the
number of k-mer positions; gen_rand_mod.sh:154).
"""

from __future__ import annotations

import gzip
import os

MAG_DIFF = 100


def is_human(tid: int) -> bool:
    return tid in (9606, 63221, 741158)


def merge_cnts(rand_lst_path: str, taxonomy, rank_path: str, min_obs: int,
               tax_histo_cnt: dict | None, out_path: str, num_bins: int):
    """tax_histo_cnt: tid -> k-mer count (frequency_counter output), or None."""
    ranks = {}
    with open(rank_path) as f:
        for line in f:
            toks = line.split()
            if len(toks) >= 2:
                ranks[int(toks[0])] = toks[1]
    ranks.setdefault(1, "life")

    parents = taxonomy.parent

    thc = dict(tax_histo_cnt) if tax_histo_cnt else {}
    ignore_thc = not thc

    def ancestor_or_self(tid, targets):
        t = tid
        while True:
            if t in targets:
                return True
            if parents.get(t, t) == t:
                return False
            t = parents[t]

    AGG_RANKS = ("genus", "family", "order", "class", "phylum", "kingdom",
                 "domain", "life")

    def is_agg_rank(tid, human_yes):
        r = ranks.get(tid, "")
        return (r == "species" and human_yes) or r in AGG_RANKS

    # phase 1: collect per-aggregation-node observation lists
    store_rank_val: dict[int, list] = {}
    with open(rand_lst_path) as f:
        for raw in f:
            t = raw.split()
            if not t:
                continue
            tid = int(t[0])
            if ignore_thc:
                thc.setdefault(tid, 1)
            if tid not in thc:
                continue
            if tid not in parents:
                continue
            curr_tid = parents[tid]
            kmer_cnt = thc[tid]
            is_ignore = ancestor_or_self(tid, {2, 2157, 28384})
            human_yes = is_human(tid)
            if (not human_yes and tid >= 10000000) or (is_ignore and kmer_cnt < 100000):
                continue
            obs = t[1:]
            while True:
                if is_agg_rank(curr_tid, human_yes):
                    if curr_tid in store_rank_val:
                        lst = store_rank_val[curr_tid]
                        for obi in range(0, num_bins, 2):
                            pcnt = float(obs[obi])
                            num_obs = int(obs[obi + 1])
                            fnd = False
                            for it in range(len(lst)):
                                obs_lst, store_kmer_cnt = lst[it]
                                for it1 in range(0, len(obs_lst), 2):
                                    store_pcnt = float(obs_lst[it1])
                                    store_obs = int(obs_lst[it1 + 1])
                                    chk_diff = kmer_cnt / store_kmer_cnt
                                    if chk_diff < MAG_DIFF and pcnt >= store_pcnt:
                                        store_rank_val[curr_tid][it] = (
                                            pcnt, num_obs + store_obs, kmer_cnt,
                                        )
                                    if chk_diff < MAG_DIFF:
                                        fnd = True
                                        break
                            if not fnd:
                                store_rank_val[curr_tid].append((obs, kmer_cnt))
                    else:
                        store_rank_val.setdefault(curr_tid, [(obs, kmer_cnt)])
                    break
                if parents.get(curr_tid, curr_tid) == curr_tid:
                    break
                curr_tid = parents[curr_tid]

    merge_hack = store_rank_val.get(561, [])
    if 620 in store_rank_val:
        merge_hack = list(merge_hack) + store_rank_val[620]

    def entry_pairs(entry):
        """An entry is either (obs_list, kcnt) from initial storage or a
        replacement tuple (pcnt, num_obs, kcnt) — normalize to pair list."""
        if len(entry) == 3 and not isinstance(entry[0], list):
            pcnt, num_obs, kcnt = entry
            return [(float(pcnt), int(num_obs))], kcnt
        obs, kcnt = entry
        return [
            (float(obs[i]), int(obs[i + 1])) for i in range(0, len(obs), 2)
        ], kcnt

    # phase 2: emit per-taxid cutoff rows
    def is_euk(tid):
        return ancestor_or_self(tid, {2759})

    qlst = [562] + list(thc.keys())
    once = set()
    lines = [str(num_bins)]
    def_euk = None
    for tid in qlst:
        if tid in once:
            continue
        once.add(tid)
        if tid not in parents:
            continue
        curr_tid = parents[tid]
        tid_kcnt = thc.get(tid, 0)
        human_yes = is_human(tid)
        if tid >= 10000000 and not human_yes:
            tid_kcnt = thc.get(curr_tid, tid_kcnt)
        use_val = []
        is_other = False
        while True:
            if curr_tid == 28384:
                is_other = True
                break
            if is_agg_rank(curr_tid, human_yes):
                if curr_tid in store_rank_val:
                    use_val = store_rank_val[curr_tid]
                    if curr_tid in (561, 620):
                        use_val = merge_hack
            if use_val != []:
                break
            if parents.get(curr_tid, curr_tid) == curr_tid:
                break
            curr_tid = parents[curr_tid]
        if is_other:
            use_val = merge_hack
        if tid == 9606 and 9606 in store_rank_val:
            use_val = store_rank_val[9606]

        rval_pcnt = [0.0] * num_bins
        rval_obs = [0] * num_bins
        rval_kcnt = [0] * num_bins
        rv1_pcnt = [1.0] * num_bins
        rv1_obs = [0] * num_bins
        rv1_kcnt = [0] * num_bins
        close_match = [-1.0] * num_bins
        fnd_match = False
        for entry in use_val:
            pairs, kcnt = entry_pairs(entry)
            diff_pcnt = tid_kcnt / kcnt if kcnt else float("inf")
            for it, (pcnt, obsv) in enumerate(pairs):
                if it >= num_bins:
                    break
                if diff_pcnt < MAG_DIFF and pcnt > rval_pcnt[it]:
                    rval_pcnt[it] = pcnt
                    rval_obs[it] = obsv
                    rval_kcnt[it] = kcnt
                    fnd_match = True
                if diff_pcnt < close_match[it] or close_match[it] == -1:
                    rv1_pcnt[it] = pcnt
                    rv1_obs[it] = obsv
                    rv1_kcnt[it] = kcnt
                    close_match[it] = diff_pcnt
        if not fnd_match:
            rval_pcnt, rval_kcnt, rval_obs = rv1_pcnt, rv1_kcnt, rv1_obs

        use_rank = "genus" if human_yes else ranks.get(curr_tid, "")
        if tid == 562:
            def_euk = (list(rval_pcnt), list(rval_obs), list(rval_kcnt))
        if is_euk(tid) and use_rank == "genus" and def_euk is not None:
            rval_pcnt, rval_obs, rval_kcnt = (
                list(def_euk[0]), list(def_euk[1]), list(def_euk[2])
            )
        if tid == 1:
            rval_pcnt = [1.0] * num_bins

        # neighbor fill for under-observed bins
        for it in range(num_bins):
            if int(rval_obs[it]) < min_obs:
                save_rit = save_fit = -1
                for rit in range(it - 1, -1, -1):
                    if int(rval_obs[rit]) >= min_obs:
                        save_rit = rit
                        break
                for fit in range(it + 1, num_bins):
                    if int(rval_obs[fit]) >= min_obs:
                        save_fit = fit
                        break
                d1 = abs(it - save_rit) if save_rit >= 0 else num_bins + 1
                d2 = abs(it - save_fit) if save_fit >= 0 else num_bins + 1
                if d1 <= d2 and save_rit != -1:
                    rval_pcnt[it] = rval_pcnt[save_rit]
                elif save_fit != -1:
                    rval_pcnt[it] = rval_pcnt[save_fit]

        parts = [f"{tid} {use_rank}-{curr_tid}"]
        for it in range(num_bins):
            parts.append(f"{rval_obs[it]} {rval_pcnt[it]} {rval_kcnt[it]}")
        lines.append(" ".join(parts))

    opener = gzip.open if out_path.endswith(".gz") else open
    with opener(out_path, "wt") as f:
        f.write("\n".join(lines) + "\n")
    return out_path


def write_null_lst(outdir: str, entries, k: int = 20):
    """entries: [(read_len, filename)]; keys are read_len - (k-1)."""
    path = os.path.join(outdir, "null_lst.txt")
    rows = sorted((rl - (k - 1), fn) for rl, fn in entries)
    with open(path, "w") as f:
        for key, fn in rows:
            f.write(f"{key} {fn}\n")
    return path
