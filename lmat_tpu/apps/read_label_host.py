"""Reference-exact read classification (host epilogue).

This module reproduces, decision-for-decision and float-for-float, the per-read
scoring of the reference classifier:

  retrieve_kmer_labels   /root/reference/src/read_label.cpp:974-1209
  construct_labels       read_label.cpp:693-941
  findReadLabelVer2      read_label.cpp:284-419
  proc_line              read_label.cpp:1211-1279

It consumes k-mer lookup results — which may come from the host index or from
the batched TPU probe (apps/read_label.py) — and produces the per-read output
line plus the (taxid, score) call used for the fastsummary.

All floating point follows C float semantics: np.float32 arithmetic with
promotion to double only where the C code does (log/sqrt and the final
ostream formatting).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..core.encoding import ReadKmers
from ..core.gnusort import gnu_sort
from ..io.cppfmt import fmt_float

F = np.float32
UNDEF = F(-10000.0)

HUMAN_TAXID = 9606
ART_SEQ_TID = 32630
BAD_GENOMES = (12721, 693660)  # read_label.cpp:92-100
SKIP_TID = 20999999


def is_human(tid: int) -> bool:
    return tid in (9606, 63221, 741158)  # tid_checks.hpp:15-28


def is_phix(tid: int) -> bool:
    return tid in (374840, 10847, 32630)  # tid_checks.hpp:13


# Rank ordering used for null-model cutoff propagation (read_label.cpp:520-547)
RANK2NUM = {
    "no_rank": 0,
    "ethnic": 0,
    "region": 1,
    "species": 2,
    "genus": 3,
    "family": 4,
    "order": 5,
    "class": 6,
    "phylum": 7,
    "kingdom": 8,
    "depth=0": 9,
}
NUM2RANK = {
    0: "ethnic",
    1: "region",
    2: "species",
    3: "genus",
    4: "family",
    5: "order",
    6: "class",
    7: "phylum",
    8: "kingdom",
    9: "depth=0",
}

MATCH_STR = {
    0: "DirectMatch",
    1: "MultiMatch",
    2: "PartialMultiMatch",
    3: "NoMatch",
    4: "LCA_ERROR",
}
DIRECT, MULTI, PARTIAL, NOMATCH, LCA_ERROR = range(5)
READ_TOO_SHORT, NO_DB_HITS, LOW_SCORE = range(3)
NOMATCH_STR = {0: "ReadTooShort", 1: "NoDbHits", 2: "LowScore"}


@dataclass
class ScoreOptions:
    """Mirror of the reference ScoreOptions + CLI knobs."""

    min_score: float = 0.0      # -x
    min_kmer: int = 35          # -j (run_rl.sh passes 30)
    min_fnd_kmer: int = 1       # -z
    diff_thresh: float = 1.0    # -b (sdiff)
    diff_thresh2: float = 3.0   # -l (hbias)
    prn_all: bool = True        # -p
    screen_phix: bool = True    # cleared by -h
    max_count: int = -1         # -g tid cutoff at query time (-1 = off)
    tid_rank_map: dict = field(default_factory=dict)  # -m numeric ranks
    permissive: bool = False    # -s
    prn_read: bool = True       # cleared by -a
    low_num_plasmids: frozenset = field(default_factory=frozenset)  # -r


def is_plasmid(tid: int, low_num) -> bool:
    return (10000000 <= tid < 11000000) or tid in low_num


class Classifier:
    """One instance per run; stateless across reads except summary tallies."""

    def __init__(self, taxonomy, index, opts: ScoreOptions, null_model=None):
        self.tax = taxonomy
        self.index = index
        self.opts = opts
        self.null = null_model  # core.nullmodel.NullModel or None
        self.k = index.k if index is not None else 20
        # summary tallies (merge maps, read_label.cpp:1760-1800)
        self.track_count: dict[int, int] = {}
        self.track_score: dict[int, F] = {}
        self.track_nomatch: dict[int, int] = {}

    # -- depth helpers ------------------------------------------------------

    def _depth(self, tid: int) -> int:
        return self.tax.depth[tid]

    # ======================================================================
    # retrieve_kmer_labels
    # ======================================================================

    def _retrieve(self, seq: str, lookups=None, collapse_human=True):
        """Returns (label_first, label_sets, taxid_lst, tax2idx,
        valid_kmers, bin_sel).

        label_first: list per position: -1 invalid, else ng.
        label_sets: list per position of sorted-set (std::set semantics) of
                    (tid, 1) — we track tids only (count always 1).
        lookups: optional precomputed per-position lookup results
                 [(found, ng, tids-list)] from the device probe; if None the
                 host index is queried.
        """
        k = self.k
        rk = ReadKmers(seq.encode(), k)
        P = rk.kmers.shape[0] if rk.length >= k else 0
        label_first = [-1] * P
        label_sets: list[set] = [set() for _ in range(P)]
        taxid_lst: list[int] = []
        tax2idx: dict[int, int] = {}
        leaf_track: dict[int, int] = {}

        opts = self.opts
        tax = self.tax
        for pos in range(P):
            if not rk.valid[pos] or rk.is_dup[pos]:
                continue
            label_first[pos] = 0
            if lookups is not None:
                res = lookups[pos]
            else:
                got = self.index.lookup_host(int(rk.kmers[pos]))
                res = (True, got[0], got[1]) if got is not None else (False, 0, ())
            found, ng, tids = res
            if not found:
                continue
            # query-time pruning (TaxNodeStat.hpp:60-206)
            if 0 < opts.max_count < ng:
                if not opts.tid_rank_map:
                    tids = tids[:1]
                    ng = 1
                else:
                    tids, ng = _prune_by_rank(tids, opts.tid_rank_map, opts.max_count)
            obs_tids = []
            seen_human = False
            dcnt = 0
            for tid in tids:
                tid = int(tid)
                if collapse_human and is_human(tid):
                    # rkmer.hpp (the rand_read_label loop) lacks this collapse
                    if seen_human:
                        continue
                    tid = HUMAN_TAXID
                    seen_human = True
                if tid == SKIP_TID or tid in BAD_GENOMES:
                    continue
                if dcnt == 0:
                    label_first[pos] = max(int(ng), 1)
                dcnt += 1
                obs_tids.append(tid)
                if opts.permissive:
                    # permissive mode registers every observed tid immediately
                    # in next() order (read_label.cpp:1050-1057)
                    label_sets[pos].add(tid)
                    if tid not in tax2idx:
                        tax2idx[tid] = len(taxid_lst)
                        taxid_lst.append(tid)
            # stable depth-desc sort via the exact libstdc++ algorithm
            dmap = tax.depth
            gnu_sort(obs_tids, lambda a, b: dmap[a] > dmap[b])
            if opts.permissive:
                last_depth = -1
                for tid in obs_tids:
                    depth = dmap[tid]
                    if depth == 0:
                        break
                    if last_depth == depth or last_depth == -1:
                        for ptid in tax.path_to_root(tid):
                            label_sets[pos].add(ptid)
                            if ptid not in tax2idx:
                                tax2idx[ptid] = len(taxid_lst)
                                taxid_lst.append(ptid)
                    else:
                        break
            else:
                non_leaf = set()
                for tid in obs_tids:
                    if tid not in non_leaf:
                        label_sets[pos].add(tid)
                        leaf_track[tid] = leaf_track.get(tid, 0) + 1
                        if tid not in tax2idx:
                            tax2idx[tid] = len(taxid_lst)
                            taxid_lst.append(tid)
                        non_leaf.update(tax.path_to_root(tid))

        if not opts.permissive:
            self._strain_augment(label_first, label_sets, leaf_track, taxid_lst, tax2idx)

        # permissive path adds tid itself + ancestors; reference adds path only
        # (read_label.cpp:1085-1098) but inserts tid via the earlier insert;
        # we merged both inserts above for the permissive case.
        valid_kmers = rk.valid_kmers
        bin_sel = rk.bin_sel
        return label_first, label_sets, taxid_lst, tax2idx, valid_kmers, bin_sel

    def _strain_augment(self, label_first, label_sets, leaf_track, taxid_lst, tax2idx):
        """Representative-strain selection + ancestor-path augmentation
        (read_label.cpp:1143-1204)."""
        tax = self.tax
        save_spec_rep: dict[int, tuple[int, int]] = {}
        for stid in sorted(leaf_track):  # std::map iteration order
            stid_cnt = leaf_track[stid]
            if tax.rank.get(stid) == "strain":
                for ptid in tax.path_to_root(stid):
                    if tax.rank.get(ptid) == "species":
                        cur = save_spec_rep.get(ptid)
                        if cur is None:
                            save_spec_rep[ptid] = (stid, stid_cnt)
                        elif stid_cnt > cur[1]:
                            save_spec_rep[ptid] = (stid, stid_cnt)
                        break
        rep_strain = {v[0] for v in save_spec_rep.values()}

        for pos in range(len(label_first)):
            if label_first[pos] >= 0:
                # std::set iteration visits newly inserted larger keys too;
                # iterating a snapshot plus processing insertions in sorted
                # order reproduces the effect because ancestors' paths are
                # subsets of descendants' paths.
                pending = sorted(label_sets[pos])
                seen = set()
                while pending:
                    tid = pending.pop(0)
                    if tid in seen:
                        continue
                    seen.add(tid)
                    # gRank_table[tid] operator[] default-inserts "" (≠ strain)
                    if tid in rep_strain or tax.rank.get(tid, "") != "strain":
                        for ptid in tax.path_to_root(tid):
                            if ptid not in label_sets[pos]:
                                label_sets[pos].add(ptid)
                                if ptid > tid and ptid not in seen:
                                    pending.append(ptid)
                                    pending.sort()
                            if ptid not in tax2idx:
                                tax2idx[ptid] = len(taxid_lst)
                                taxid_lst.append(ptid)

    # ======================================================================
    # construct_labels
    # ======================================================================

    def _construct(self, label_first, label_sets, taxid_lst, tax2idx, bin_sel,
                   min_valid_kmers, min_fnd_kmers, out: list):
        """Returns ((tid, score), match_type); appends output text to `out`
        (without trailing newline pieces; caller joins)."""
        opts = self.opts
        tax = self.tax
        num_tax = len(taxid_lst)
        P = len(label_first)

        cand_kmer_cnt = sum(1 for pos in range(P) if label_first[pos] >= 0)
        cnt_fnd_kmers = sum(1 for pos in range(P) if label_sets[pos])
        if cnt_fnd_kmers < min_fnd_kmers:
            return (0, F(-1)), NOMATCH
        if cand_kmer_cnt < min_valid_kmers:
            return (0, F(-1)), NOMATCH

        # per-candidate found counts
        found_cnt = {t: F(0) for t in taxid_lst}
        for pos in range(P):
            for tid in label_sets[pos]:
                found_cnt[tid] += F(1)

        # null model selection
        use_rand = False
        rand_hits = equiv_class = None
        if self.null is not None:
            read_len_bin = self.null.get_read_len(cand_kmer_cnt)
            rh = self.null.rand_hits.get(read_len_bin)
            if rh is not None:
                use_rand = True
                rand_hits = rh
                equiv_class = self.null.rand_class[read_len_bin]

        has_human = False
        track: dict[str, F] = {}
        rank_first = []
        for tid in taxid_lst:
            if is_human(tid):
                has_human = True
            label_prob = found_cnt[tid] / F(cand_kmer_cnt)
            rank_first.append(label_prob)
            if use_rand:
                if tid in rand_hits:
                    random_prob = rand_hits[tid][bin_sel] + F(0.0001)
                else:
                    random_prob = F(1.0)
                cval = equiv_class[tid]
                if cval not in track:
                    track[cval] = random_prob
                else:
                    track[cval] = max(random_prob, track[cval])
                cval_rank = RANK2NUM[cval]
                for ti in range(cval_rank - 1, -1, -1):
                    lower = NUM2RANK[ti]
                    if lower in track:
                        track[cval] = max(track[cval], track[lower])

        # scores
        rank_label: list[list] = []
        all_cand_set: dict[int, F] = {}
        log_sum = F(0)
        pos_log_sum = F(0)
        sig_hits = 0
        pos_sig_hits = 0
        fnd_phix = False
        phix_score = F(0)
        top_score = F(0)
        def_rand = F(0.1)
        for i, tid in enumerate(taxid_lst):
            label_prob = rank_first[i]
            if use_rand:
                random_prob = track[equiv_class[tid]]
                denom = random_prob if random_prob > 0 else F(0.00001)
                log_odds = F(math.log(float(label_prob / denom)))
            else:
                log_odds = label_prob
            rank_label.append([tid, log_odds])
            if tid not in all_cand_set:
                all_cand_set[tid] = log_odds
            log_sum += log_odds
            sig_hits += 1
            if log_odds > 0:
                pos_sig_hits += 1
                pos_log_sum += log_odds
            if opts.screen_phix and is_phix(tid):
                phix_score = log_odds
                fnd_phix = True
            if i == 0 or log_odds > top_score:
                top_score = log_odds

        if opts.screen_phix and fnd_phix and phix_score >= top_score:
            out.append(f"-1 -1 {cand_kmer_cnt}\t")
            out.append(f"{ART_SEQ_TID} {fmt_float(phix_score)}")
            out.append("\t")
            out.append(f"{ART_SEQ_TID} {fmt_float(phix_score)} DirectMatch")
            return (ART_SEQ_TID, phix_score), DIRECT

        min_pos_examples = 3
        if pos_sig_hits > min_pos_examples:
            use_sig_hits = pos_sig_hits
            log_avg = pos_log_sum / F(pos_sig_hits)
        else:
            use_sig_hits = sig_hits
            log_avg = log_sum / F(sig_hits) if sig_hits > 0 else F(0)

        log_std = F(0)
        for i in range(num_tax):
            score = rank_label[i][1]
            if score > 0 and pos_sig_hits > min_pos_examples:
                val = log_avg - score
                log_std += val * val
            if pos_sig_hits <= min_pos_examples:
                val = log_avg - score
                log_std += val * val

        stdev1 = (
            F(math.sqrt(float(log_std / F(use_sig_hits - 1))))
            if use_sig_hits > 1
            else F(0)
        )

        res_call = (0, F(0))
        res_match = NOMATCH
        valid_cand: list = []
        if use_sig_hits > 0:
            if has_human:
                for rl in rank_label:
                    if is_human(rl[0]):
                        rl[1] = rl[1] + F(opts.diff_thresh2) * stdev1
            dmap = tax.depth

            def tcmp(a, b):
                if abs(float(a[1]) - float(b[1])) < 0.001:
                    return dmap[a[0]] < dmap[b[0]]
                return a[1] < b[1]

            gnu_sort(rank_label, tcmp)
            out.append(f"{fmt_float(log_avg)} {fmt_float(stdev1)} {cand_kmer_cnt}\t")
            stdev1 = stdev1 * F(opts.diff_thresh)
            res_call, res_match, valid_cand = self._find_read_label(
                rank_label, stdev1, tax2idx, all_cand_set, top_score
            )
            if opts.prn_all:
                printed = False
                for i in range(len(rank_label) - 1, -1, -1):
                    if rank_label[i][1] >= 0:
                        out.append(f" {rank_label[i][0]} {fmt_float(rank_label[i][1])}")
                        printed = True
                if not printed:
                    out.append("-1 -1")
                out.append("\t")

        match_str = MATCH_STR[res_match]
        if res_match == DIRECT:
            out.append(f"{res_call[0]} {fmt_float(res_call[1])} {match_str}")
        elif res_match in (MULTI, PARTIAL):
            if not opts.prn_all:
                for tid, sc in valid_cand:
                    out.append(f" {tid} {fmt_float(sc)}")
                if not valid_cand:
                    out.append("-1 -1")
                out.append("\t")
            out.append(f"{res_call[0]} {fmt_float(res_call[1])} {match_str}")
        elif res_match == NOMATCH:
            out.append(f"-1 -1 {match_str}")
        else:
            out.append("-1 -1 Unmatched")
        return res_call, res_match

    # ======================================================================
    # findReadLabelVer2
    # ======================================================================

    def _find_read_label(self, rank_label, diff_thresh, tax2idx, all_cand_set, top_score):
        tax = self.tax
        dmap = tax.depth
        opts = self.opts
        match = NOMATCH
        save_plasmid = None
        lowest_depth = 0
        highest_depth = 0
        lowest = (0, F(0))
        highest = (0, F(0))
        lidx = -1
        lin_done = False
        cand_lin: list = []  # list of (tid, score)

        def add_to_cand_lineage(cand):
            # read_label.cpp:225-262
            if not cand_lin:
                cand_lin.append(cand)
                return True
            cand_depth = dmap.get(cand[0], 0)
            for taxid, _sc in cand_lin:
                chk_depth = dmap.get(taxid, 0)
                if chk_depth > cand_depth and not tax.is_ancestor(cand[0], taxid):
                    return False
                if chk_depth < cand_depth and not tax.is_ancestor(taxid, cand[0]):
                    return False
                if chk_depth == cand_depth:
                    return False
            cand_lin.append(cand)
            return True

        n = len(rank_label)
        for i in range(n - 1, -1, -1):
            tid, score = rank_label[i][0], rank_label[i][1]
            if score >= top_score and is_plasmid(tid, opts.low_num_plasmids):
                save_plasmid = tid
            if not lin_done and not add_to_cand_lineage((tid, score)):
                lidx = i
                lin_done = True
            elif not lin_done:
                d = dmap[tid]
                if d > lowest_depth or i == n - 1:
                    lowest = (tid, score)
                    lowest_depth = d
                if d < highest_depth or i == n - 1:
                    highest = (tid, score)
                    highest_depth = d
            if lin_done and score < top_score:
                break

        add_set = set()
        if highest_depth != 0:
            for ptid in tax.path_to_root(highest[0]):
                add_set.add(ptid)
                if ptid in all_cand_set:
                    cand_lin.append((ptid, all_cand_set[ptid]))
                else:
                    cand_lin.append((ptid, UNDEF))

        cand_lin_vec = list(cand_lin)
        gnu_sort(cand_lin_vec, lambda a, b: dmap[a[0]] > dmap[b[0]])

        no_good = set()
        for i in range(lidx, -1, -1):
            tid, score = rank_label[i][0], rank_label[i][1]
            if tid not in add_set:
                # cmpCompLineage, read_label.cpp:264-282
                keep_going = True
                for ltid, lsc in cand_lin_vec:
                    if tax.is_ancestor(ltid, tid):
                        break
                    if lsc != UNDEF and (lsc - score) > diff_thresh:
                        keep_going = False
                        break
                    if (lsc - score) <= diff_thresh:
                        no_good.add(ltid)
                if not keep_going:
                    break

        if not cand_lin and not no_good:
            taxid_call = (0, F(0))
            match = NOMATCH
        elif cand_lin and not no_good:
            taxid_call = lowest
            match = DIRECT
        else:
            cand_vec = list(cand_lin)
            gnu_sort(cand_vec, lambda a, b: dmap[a[0]] > dmap[b[0]])
            max_val = UNDEF
            res = None
            root_idx = -1
            for i, (tax_i, sc) in enumerate(cand_vec):
                max_val = max(sc, max_val)
                if tax_i not in no_good:
                    res = tax_i
                    root_idx = i
                    break
            if res is None:
                taxid_call = (0, F(-1))
                match = LCA_ERROR
            else:
                match = MULTI
                if res in all_cand_set:
                    if max_val < cand_vec[root_idx][1]:
                        match = PARTIAL
                        max_val = cand_vec[root_idx][1]
                taxid_call = (res, max_val)

        if save_plasmid is not None:
            if tax.is_ancestor(taxid_call[0], save_plasmid):
                taxid_call = (save_plasmid, taxid_call[1])
        return taxid_call, match, cand_lin

    # ======================================================================
    # proc_line — per read driver
    # ======================================================================

    def classify(self, header: str, seq: str, lookups=None) -> str:
        """Return the full output line (header\tread\t<result>), updating the
        summary tallies exactly as proc_line does."""
        opts = self.opts
        prefix = f"{header}\t{seq if opts.prn_read else 'X'}\t"
        out: list = []
        ri_len = len(seq)
        k = self.k
        if ri_len < k:
            out.append(f"-1 -1 -1\t-1 -1\t{ri_len} {k} ReadTooShort")
            self.track_nomatch[READ_TOO_SHORT] = self.track_nomatch.get(READ_TOO_SHORT, 0) + 1
            return prefix + "".join(out)

        (label_first, label_sets, taxid_lst, tax2idx, valid_kmers, bin_sel) = self._retrieve(
            seq, lookups=lookups
        )
        if valid_kmers < opts.min_kmer:
            out.append(f"-1 -1 -1\t-1 -1\t{valid_kmers} {opts.min_kmer} ReadTooShort")
            self.track_nomatch[READ_TOO_SHORT] = self.track_nomatch.get(READ_TOO_SHORT, 0) + 1
        elif taxid_lst:
            call, mtype = self._construct(
                label_first, label_sets, taxid_lst, tax2idx, bin_sel,
                opts.min_kmer, opts.min_fnd_kmer, out
            )
            if mtype == NOMATCH and valid_kmers < opts.min_kmer:
                out.append(f"-1 -1 -1\t-1 -1\t{valid_kmers} {opts.min_kmer} ReadTooShort")
                self.track_nomatch[READ_TOO_SHORT] = self.track_nomatch.get(READ_TOO_SHORT, 0) + 1
            elif mtype == NOMATCH:
                self.track_nomatch[NO_DB_HITS] = self.track_nomatch.get(NO_DB_HITS, 0) + 1
            elif call[1] >= opts.min_score and valid_kmers >= opts.min_kmer:
                tid = call[0]
                if tid not in self.track_count:
                    self.track_count[tid] = 1
                    self.track_score[tid] = call[1]
                else:
                    self.track_count[tid] += 1
                    self.track_score[tid] = self.track_score[tid] + call[1]
            elif call[1] < opts.min_score:
                self.track_nomatch[LOW_SCORE] = self.track_nomatch.get(LOW_SCORE, 0) + 1
        else:
            out.append(f"-1 -1 {valid_kmers}\t-1 -1\t{ri_len} {k} NoDbHits")
            self.track_nomatch[NO_DB_HITS] = self.track_nomatch.get(NO_DB_HITS, 0) + 1
        return prefix + "".join(out)

    # ======================================================================
    # summaries
    # ======================================================================

    def write_fastsummary(self, path: str, rank_ids_file: str):
        """read_label.cpp:1801-1852."""
        write_fastsummary(self.track_score, self.track_count, path, rank_ids_file)

    def write_nomatchsum(self, path: str):
        write_nomatchsum(self.track_nomatch, path)


def write_fastsummary(track_score, track_count, path: str, rank_ids_file: str):
        cand = set(track_score)
        save_id: dict[int, str] = {}
        with open(rank_ids_file) as f:
            for raw in f:
                line = raw.rstrip("\n")
                # replicate the strtok scan: find "taxid" token, next is value
                toks = _strtok(line, "=,")
                for i, tok in enumerate(toks):
                    if tok == "taxid":
                        try:
                            cid = int(toks[i + 1].split()[0]) if i + 1 < len(toks) else None
                        except ValueError:
                            cid = None
                        if cid is not None and cid in cand and cid not in save_id:
                            pos = line.rfind("\t")
                            save_id[cid] = line[pos + 1 :]
                        break
        sort_val = [(tid, track_score[tid]) for tid in sorted(track_score)]
        gnu_sort(sort_val, lambda a, b: a[1] > b[1])
        with open(path, "w") as f:
            for tid, wght in sort_val:
                cnt = track_count[tid]
                f.write(f"{fmt_float(wght)}\t{cnt}\t{tid}\t{save_id.get(tid, '')}\n")


def write_nomatchsum(track_nomatch, path: str):
        with open(path, "w") as f:
            for key in sorted(track_nomatch):
                f.write(f"{NOMATCH_STR[key]}\t{track_nomatch[key]}\n")


def _prune_by_rank(tids, rank_map: dict, tid_cut: int):
    """Rank-priority pruning, TaxNodeStat.hpp:118-200: drop batches of the
    highest-priority taxids until <= tid_cut remain; the survivors are then
    emitted in priority_queue pop order.  An empty result collapses to the
    root taxid.  Uses the exact libstdc++ heap so tie order matches."""
    from ..core.gnusort import CppPriorityQueue

    q = CppPriorityQueue(lambda a, b: a[0] < b[0])
    for tid in tids:
        tid = int(tid)
        q.push((rank_map.get(tid, 0), tid))
    while len(q):
        cur = q.top()[0]
        while q.top()[0] == cur:
            q.pop()
            if not len(q):
                break
        if len(q) <= tid_cut:
            break
    if not len(q):
        return [1], 1
    count = len(q)
    out = [q.pop()[1] for _ in range(count)]
    return out, count


def _strtok(s: str, delims: str) -> list[str]:
    """C strtok semantics: runs of delimiters collapse, no empty tokens."""
    out = []
    cur = []
    for ch in s:
        if ch in delims:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out
