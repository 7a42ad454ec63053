"""Device (TPU) scorer — full read classification under jit ("fast mode").

Implements the scoring semantics of read_label (construct_labels +
findReadLabelVer2, /root/reference/src/read_label.cpp:284-941) as batched XLA
over a per-read candidate axis of static cap C:

  probe results [B,P,T] -> per-position ancestor suppression (Euler-tour
  O(1) ancestor tests) -> per-read candidate set (sort+unique, cap C) ->
  representative-strain selection -> ancestor-path augmentation -> null-model
  log-odds -> the candidate-lineage walk and competing-lineage analysis as a
  lax.scan over sorted candidates -> (call taxid, score, match type).

Known, documented divergences from the bit-exact host path (exact mode):
  * float accumulation order is candidate-index order (taxonomy order), not
    the reference's insertion order — scores can differ in final ulps;
  * the TCmp 1e-3 epsilon tie grouping is approximated by exact
    (score, depth, ascending-taxid) lexicographic sorting; candidates whose
    scores are exactly equal print in ascending-taxid order instead of the
    reference's per-read insertion order (platform-deterministic: the sort
    carries an explicit slot tiebreaker because TPU sorts are not stable);
  * null-model rank-cutoff propagation uses an order-free prefix max.
GC bins for the null-model lookup are computed on the HOST
(core.encoding.host_gc_bins): TPU f32 division is not IEEE
correctly-rounded and flips truncation at exact bin boundaries.
tests/test_device_scorer.py checks call-level agreement with exact mode.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

F32 = np.float32
UNDEF = -10000.0
NOT_FOUND_PROB = 2.0  # sentinel in null cutoff arrays: missing tid -> 1.0 rule


@dataclass
class DeviceScorerConfig:
    max_candidates: int = 128
    min_kmer: int = 30
    min_fnd_kmer: int = 1
    diff_thresh: float = 1.0    # sdiff
    diff_thresh2: float = 0.0   # hbias
    screen_phix: bool = True
    def_rand: float = 0.1
    permissive: bool = False    # read_label -s (read_label.cpp:1050-1098)


class DeviceScorer:
    """Bound to taxonomy device arrays + optional null model."""

    def __init__(self, taxonomy, cfg: DeviceScorerConfig, null_model=None,
                 num_bins: int = 10):
        import jax.numpy as jnp

        self.cfg = cfg
        arr = taxonomy.device_arrays()
        self.tids = arr["tids"]
        self.index = arr["index"]
        n = len(self.tids)
        self.n_nodes = n
        # taxonomy arrays stay HOST numpy on purpose: they are closed over
        # by the jitted step and lowering embeds numpy constants directly,
        # while device-resident jax arrays are fetched BACK host-side by
        # ir_constant during lowering — ~50 s/array over a remote
        # host<->device link (round-5 cold-start root cause; they still end
        # up on-device once, baked into the compiled executable)
        self.depth = np.ascontiguousarray(arr["depth"])
        self.euler_in = np.ascontiguousarray(arr["euler_in"])
        self.euler_out = np.ascontiguousarray(arr["euler_out"])
        self.path_mat = np.ascontiguousarray(arr["path_mat"])
        self.max_path = arr["path_mat"].shape[1]
        self.rank_code = np.ascontiguousarray(arr["rank_code"])
        self.species_anc = np.ascontiguousarray(arr["species_anc"])

        def idx_of(tid):
            return self.index.get(tid, -1)

        human = np.zeros(n, bool)
        phix = np.zeros(n, bool)
        plasmid = np.zeros(n, bool)
        raw = arr["tids"]
        for i, t in enumerate(raw):
            t = int(t)
            if t in (9606, 63221, 741158):
                human[i] = True
            if t in (374840, 10847, 32630):
                phix[i] = True
            if 10000000 <= t < 11000000:
                plasmid[i] = True
        self.is_human = human
        self.is_phix = phix
        self.is_plasmid = plasmid
        self.idx_human = idx_of(9606)
        self.idx_art = idx_of(32630)

        # packed per-node attributes: one wide row gather per candidate table
        # instead of several element gathers in the hot loops
        flags = (
            human.astype(np.int32)
            | (phix.astype(np.int32) << 1)
            | (plasmid.astype(np.int32) << 2)
        )
        self.node_pack = (
            np.stack(
                [arr["euler_in"].astype(np.int32),
                 arr["euler_out"].astype(np.int32),
                 arr["depth"].astype(np.int32),
                 arr["rank_code"].astype(np.int32),
                 arr["species_anc"].astype(np.int32),
                 arr["tids"].astype(np.int32),
                 flags,
                 np.zeros(n, np.int32)],
                axis=1,
            )
        )

        # null model arrays
        self.null = null_model
        self.num_bins = num_bins
        if null_model is not None:
            lens = sorted(null_model.rand_hits)
            self.null_lens = np.asarray(lens, np.int32)
            cut = np.full((len(lens), n, num_bins), NOT_FOUND_PROB, F32)
            cls = np.zeros((len(lens), n), np.int8)
            from .read_label_host import RANK2NUM

            for li, L in enumerate(lens):
                rh = null_model.rand_hits[L]
                rc = null_model.rand_class[L]
                for tid, cutoffs in rh.items():
                    i = self.index.get(int(tid))
                    if i is None:
                        continue
                    cut[li, i, :] = [float(c) for c in cutoffs]
                    cls[li, i] = RANK2NUM.get(rc[tid], 0)
            # host numpy for the same reason as the taxonomy arrays above
            self.null_cut = cut
            self.null_cls = cls
            # closest() boundaries
            vec = sorted(null_model.read_len_vec)
            self.rl_vec = np.asarray(vec, np.int32)
            self.rl_avgs = np.asarray(
                [(vec[i - 1] + vec[i]) // 2 for i in range(1, len(vec))], np.int32
            )

    # per-observation flag bits embedded in the remapped arena entries so the
    # scorer needs no per-observation attribute gathers at all
    IDX_BITS = 24
    IDX_MASK = (1 << 24) - 1
    HUMAN_BIT = np.uint32(1 << 24)   # human-clade collapse (read_label.cpp:1031-1037)
    SKIP_BIT = np.uint32(1 << 25)    # badGenomes/20999999 skip (read_label.cpp:1038)

    # ------------------------------------------------------------------
    def remap_index_tids(self, kidx):
        """Return a copy of a KmerIndex whose arena stores dense node indices
        (uint32) with HUMAN/SKIP flag bits ORed into the high bits; unknown
        taxids map to 0 (the reference would abort)."""
        import copy

        out = copy.copy(kidx)
        flat = kidx.tid_flat
        if kidx.conv_table is not None:
            flat = kidx.conv_table[flat]
            out.conv_table = None
        sorted_tids = self.tids.astype(np.int64)
        assert len(sorted_tids) < (1 << self.IDX_BITS), "taxonomy too large for flag packing"
        pos = np.searchsorted(sorted_tids, flat.astype(np.int64))
        pos = np.clip(pos, 0, len(sorted_tids) - 1)
        hit = sorted_tids[pos] == flat
        node = np.where(hit, pos, 0).astype(np.uint32)
        raw = flat.astype(np.int64)
        human = np.isin(raw, (9606, 63221, 741158))
        skip = np.isin(raw, (20999999, 12721, 693660))
        node |= np.where(human, self.HUMAN_BIT, np.uint32(0))
        node |= np.where(skip, self.SKIP_BIT, np.uint32(0))
        out.tid_flat = node
        return out

    # ------------------------------------------------------------------
    def _anc(self, a, d):
        """proper_ancestor(a, d) via Euler intervals; a,d: int32 idx arrays."""
        import jax.numpy as jnp

        ia = jnp.take(self.euler_in, a, mode="clip")
        oa = jnp.take(self.euler_out, a, mode="clip")
        idd = jnp.take(self.euler_in, d, mode="clip")
        return (ia < idd) & (idd < oa)

    @staticmethod
    def _permute(order, *fields):
        """out[b, i] = field[b, order[b, i]] for each field, via a one-hot
        select.  take_along_axis on batched small operands runs ~8x slower
        than this on TPU (tools/profile_r3i.py); the integer where+sum is
        bit-exact for every dtype (floats ride through their int32 bits)."""
        import jax
        import jax.numpy as jnp

        S = fields[0].shape[1]
        oh = order[:, :, None] == jnp.arange(S, dtype=order.dtype)[None, None, :]
        outs = []
        for f in fields:
            if f.dtype == jnp.bool_:
                outs.append(jnp.any(oh & f[:, None, :], axis=2))
            elif f.dtype == jnp.float32:
                b32 = jax.lax.bitcast_convert_type(f, jnp.int32)
                r = jnp.sum(jnp.where(oh, b32[:, None, :], 0), axis=2)
                outs.append(jax.lax.bitcast_convert_type(r, jnp.float32))
            else:
                r = jnp.sum(jnp.where(oh, f[:, None, :], 0), axis=2)
                outs.append(r.astype(f.dtype))
        return outs[0] if len(outs) == 1 else tuple(outs)

    # ------------------------------------------------------------------
    def _presence(self, probe, collapse_human=True):
        """Candidate construction + per-candidate presence counts.

        The shared front half of read_label scoring and rand_read_label null
        generation (reference shares it as src/rkmer.hpp).  Returns a dict
        with the per-read candidate table and counts; score_batch layers the
        null model, aggregates and the lineage walk on top.

        The per-observation work is reformulated in *candidate space*: one
        sort+unique yields the per-read candidate table [B,C]; all ancestor
        tests and occurrence counts then run as [B,C,C] compares and bf16
        one-hot matmuls on the MXU instead of per-observation gathers
        (row/element gathers are the TPU bottleneck, matmuls are ~free)."""
        import jax
        import jax.numpy as jnp

        cfg = self.cfg
        C = cfg.max_candidates
        raw_obs = probe["tids"].astype(jnp.uint32)  # [B,P,T] node idx | flags
        tmask = probe["tmask"]
        B, P, T = raw_obs.shape

        tids = (raw_obs & jnp.uint32(self.IDX_MASK)).astype(jnp.int32)
        obs_h = (raw_obs & jnp.uint32(self.HUMAN_BIT)) != 0
        obs_skip = (raw_obs & jnp.uint32(self.SKIP_BIT)) != 0

        # --- special-tid handling (read_label.cpp:1031-1046) --------------
        if collapse_human:
            hm = obs_h & tmask
            first_h = jnp.cumsum(hm.astype(jnp.int32), axis=-1)
            # keep the first human slot (mapped to 9606), drop later ones
            keep_h = hm & (first_h == 1)
            tids = jnp.where(keep_h, self.idx_human, tids)
            tmask = tmask & (~hm | keep_h)
        tmask = tmask & ~obs_skip

        # --- candidate set of observed tids (sort+unique, cap C) ----------
        SENTINEL = jnp.int32(self.n_nodes + 7)

        def unique_cap(flat):
            # sort + first-occurrence mask; the compaction into [B,C] slots
            # runs as a one-hot f32 matmul — a row scatter here costs ~7x
            # more than the MXU pass (values < 2^24 are exact in f32)
            s = jnp.sort(flat, axis=1)
            uniq = jnp.concatenate(
                [jnp.ones((B, 1), bool), s[:, 1:] != s[:, :-1]], axis=1
            ) & (s < SENTINEL)
            pos = jnp.cumsum(uniq.astype(jnp.int32), axis=1) - 1
            oh = uniq[:, :, None] & (
                pos[:, :, None] == jnp.arange(C, dtype=jnp.int32)[None, None, :]
            )
            # precision=HIGHEST: this matmul carries integer IDs; on TPU
            # generations where default f32 dots round through bf16 inputs,
            # any ID > 2^8 would silently corrupt.
            out = jnp.einsum(
                "bj,bjc->bc", s.astype(jnp.float32), oh.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(jnp.int32)
            out = jnp.where(jnp.any(oh, axis=1), out, SENTINEL)
            total = jnp.max(pos, axis=1) + 1
            n = jnp.minimum(total, C)
            # per-read overflow count: lets the host reroute just the
            # affected reads through the exact path (the reference has no
            # candidate cap at all — read_label.cpp:693-726)
            return out, n, jnp.maximum(total - C, 0)

        flat1 = jnp.where(tmask, tids, SENTINEL).reshape(B, P * T)
        cand1, n1, ovf1 = unique_cap(flat1)

        # per-stage1-candidate attributes: one row gather
        pk1 = jnp.take(self.node_pack, cand1, axis=0, mode="clip")  # [B,C,8]
        e_in1, e_out1 = pk1[..., 0], pk1[..., 1]
        rank1 = pk1[..., 3]
        spec1 = pk1[..., 4]
        raw1 = pk1[..., 5]

        # anc1[b,i,j] = cand1[i] proper ancestor of cand1[j] (Euler intervals)
        anc1 = (e_in1[:, :, None] < e_in1[:, None, :]) & (
            e_in1[:, None, :] < e_out1[:, :, None]
        )

        # one-hot observation membership -> per-position candidate occupancy
        oh = (tids[..., None] == cand1[:, None, None, :]) & tmask[..., None]
        occ_pos = jnp.any(oh, axis=2)  # [B,P,C]

        MMT = jnp.bfloat16 if C <= 256 else jnp.float32
        qual_pos = None
        if cfg.permissive:
            # -s mode: every observed tid registers at its position, and every
            # observed tid with depth > 0 contributes its root path (the
            # reference's last_depth guard never updates, so the depth-desc
            # walk only stops at depth-0 entries — read_label.cpp:1074-1100)
            kept_c = occ_pos
            cnt1 = jnp.sum(kept_c.astype(jnp.int32), axis=1)
            valid1 = cnt1 > 0
            depth1 = pk1[..., 2]
            qual_pos = occ_pos & (depth1[:, None, :] > 0)
            qualify1 = jnp.any(qual_pos, axis=1)
        else:
            # per-position ancestor suppression in candidate space: candidate
            # i is suppressed at p iff some candidate j observed at p has
            # anc1[i,j] (read_label.cpp:1067-1134).  Counts are small ints:
            # exact in bf16.
            sup = jnp.einsum(
                "bpj,bij->bpi", occ_pos.astype(MMT), anc1.astype(MMT),
                preferred_element_type=jnp.float32,
            )
            kept_c = occ_pos & ~(sup > 0)  # [B,P,C] kept occurrences
            cnt1 = jnp.sum(kept_c.astype(jnp.int32), axis=1)  # [B,C]
            valid1 = cnt1 > 0  # fully-suppressed tids never become candidates

            # representative strain per species among valid strain
            # candidates: max (count, -taxid); reference ties keep the
            # smaller taxid
            strain1 = (rank1 == 1) & (cand1 < SENTINEL) & valid1
            has_spec1 = strain1 & (spec1 >= 0)
            # pairwise dominance: another same-species strain with more
            # hits, or equal hits and a smaller taxid, displaces this one
            same_spec = (
                (spec1[:, :, None] == spec1[:, None, :])
                & has_spec1[:, None, :]
                & has_spec1[:, :, None]
            )
            beats = same_spec & (
                (cnt1[:, None, :] > cnt1[:, :, None])
                | ((cnt1[:, None, :] == cnt1[:, :, None]) & (raw1[:, None, :] < raw1[:, :, None]))
            )
            is_rep1 = has_spec1 & ~jnp.any(beats, axis=2)
            qualify1 = valid1 & (cand1 < SENTINEL) & (~strain1 | is_rep1)

        # --- stage 2: final candidates = stage1 + qualifying paths --------
        paths1 = jnp.take(self.path_mat, cand1, axis=0, mode="clip")  # [B,C,D]
        pv1 = (paths1 >= 0) & qualify1[:, :, None]
        flat2 = jnp.concatenate(
            [jnp.where(valid1, cand1, SENTINEL),
             jnp.where(pv1, paths1, SENTINEL).reshape(B, C * self.max_path)],
            axis=1,
        )
        cand, n_cand, ovf2 = unique_cap(flat2)
        cmask = jnp.arange(C)[None, :] < n_cand[:, None]
        overflow = jnp.maximum(ovf1, ovf2)

        # per-final-candidate attributes: one row gather
        pk = jnp.take(self.node_pack, cand, axis=0, mode="clip")  # [B,C,8]
        e_in_c, e_out_c = pk[..., 0], pk[..., 1]

        # --- presence/found counts [B,C] -----------------------------------
        # M1[b,j,c]: stage1 candidate j contributes presence to final
        # candidate c — directly (same node) or as a qualified descendant
        # (read_label.cpp:1143-1204); one bf16 matmul folds the per-position
        # OR over observations.
        direct = cand[:, None, :] == cand1[:, :, None]  # [B,C1,C]
        anc_fc = (e_in_c[:, None, :] < e_in1[:, :, None]) & (
            e_in1[:, :, None] < e_out_c[:, None, :]
        )  # cand[c] proper ancestor of cand1[j]
        if cfg.permissive:
            # ancestor presence requires the contributor to be among the
            # position's deepest observations, so it gets its own matmul
            X = jnp.einsum(
                "bpj,bjc->bpc", kept_c.astype(MMT), direct.astype(MMT),
                preferred_element_type=jnp.float32,
            ) + jnp.einsum(
                "bpj,bjc->bpc", qual_pos.astype(MMT), anc_fc.astype(MMT),
                preferred_element_type=jnp.float32,
            )
        else:
            M1 = direct | (anc_fc & qualify1[:, :, None])
            X = jnp.einsum(
                "bpj,bjc->bpc", kept_c.astype(MMT), M1.astype(MMT),
                preferred_element_type=jnp.float32,
            )
        pres_any = X > 0
        found_cnt = jnp.sum(pres_any.astype(jnp.int32), axis=1)

        qvalid = probe["qvalid"]
        cand_kmer_cnt = jnp.sum(qvalid.astype(jnp.int32), axis=1)
        cnt_fnd = jnp.sum(jnp.any(pres_any, axis=2).astype(jnp.int32), axis=1)

        return {
            "cand": cand, "cmask": cmask, "n_cand": n_cand, "pk": pk,
            "found_cnt": found_cnt, "cnt_fnd": cnt_fnd,
            "cand_kmer_cnt": cand_kmer_cnt, "valid_kmers": probe["valid_kmers"],
            "overflow": overflow, "bin_sel": probe["bin_sel"],
        }

    # ------------------------------------------------------------------
    def score_batch(self, probe, collapse_human=True):
        """probe: dict from the probe pipeline with tids already REMAPPED to
        dense node indices (+flag bits).  Returns a dict of [B]-shaped result
        arrays and [B,C] candidate tables (for output formatting)."""
        import jax
        import jax.numpy as jnp

        cfg = self.cfg
        C = cfg.max_candidates
        pres = self._presence(probe, collapse_human=collapse_human)
        cand = pres["cand"]
        cmask = pres["cmask"]
        n_cand = pres["n_cand"]
        pk = pres["pk"]
        found_cnt = pres["found_cnt"]
        cnt_fnd = pres["cnt_fnd"]
        cand_kmer_cnt = pres["cand_kmer_cnt"]
        valid_kmers = pres["valid_kmers"]
        overflow = pres["overflow"]
        B = cand.shape[0]

        e_in_c, e_out_c = pk[..., 0], pk[..., 1]
        depth_c = pk[..., 2]
        fl_c = pk[..., 6]
        human_c = ((fl_c & 1) != 0) & cmask
        phix_flag = (fl_c & 2) != 0
        plasmid_c = (fl_c & 4) != 0

        # --- probabilities and log-odds -----------------------------------
        label_prob = found_cnt.astype(F32) / jnp.maximum(cand_kmer_cnt, 1)[:, None].astype(F32)
        use_rand = self.null is not None
        if use_rand:
            # read-length bin via closest()
            avgs = jnp.asarray(self.rl_avgs)
            vec = jnp.asarray(self.rl_vec)
            bi = jnp.searchsorted(avgs, cand_kmer_cnt, side="left")
            sel_len = jnp.take(vec, bi, mode="clip")
            li = jnp.searchsorted(jnp.asarray(self.null_lens), sel_len)
            li = jnp.clip(li, 0, len(self.null_lens) - 1)
            have_model = jnp.take(jnp.asarray(self.null_lens), li, mode="clip") == sel_len
            gc_bin = jnp.clip(probe["bin_sel"], 0, self.num_bins - 1)
            # jnp wrap: the tables are host numpy (see __init__) and numpy
            # rejects tracer fancy-indexing
            cut = jnp.asarray(self.null_cut)[li[:, None], cand, gc_bin[:, None]]  # [B,C]
            rp = jnp.where(cut >= NOT_FOUND_PROB, F32(1.0), cut + F32(0.0001))
            cls = jnp.asarray(self.null_cls)[li[:, None], cand]  # [B,C]
            # per-class max + prefix max over class ranks (order-free track)
            NBC = 10
            cls_max = jnp.zeros((B, NBC), F32)
            cls_max = cls_max.at[jnp.arange(B)[:, None], cls].max(
                jnp.where(cmask, rp, F32(0)), mode="drop"
            )
            track = jax.lax.associative_scan(jnp.maximum, cls_max, axis=1)
            random_prob = track[jnp.arange(B)[:, None], cls]
            denom = jnp.where(random_prob > 0, random_prob, F32(0.00001))
            score = jnp.log(label_prob / denom).astype(F32)
            score = jnp.where(have_model[:, None], score, label_prob)
        else:
            score = label_prob
        score = jnp.where(cmask, score, F32(0))

        # --- aggregates ----------------------------------------------------
        pos_mask = (score > 0) & cmask
        log_sum = jnp.sum(jnp.where(cmask, score, 0), axis=1)
        pos_log_sum = jnp.sum(jnp.where(pos_mask, score, 0), axis=1)
        sig_hits = n_cand
        pos_sig_hits = jnp.sum(pos_mask.astype(jnp.int32), axis=1)
        NEGF = F32(-3.0e38)
        top_score = jnp.max(jnp.where(cmask, score, NEGF), axis=1)

        phix_c = phix_flag & cmask
        fnd_phix = jnp.any(phix_c, axis=1)
        # last phiX in candidate order wins (insertion-order quirk; with one
        # phiX tid per DB this is unique)
        phix_score = jnp.max(jnp.where(phix_c, score, NEGF), axis=1)

        use_pos = pos_sig_hits > 3
        log_avg = jnp.where(
            use_pos,
            pos_log_sum / jnp.maximum(pos_sig_hits, 1).astype(F32),
            jnp.where(sig_hits > 0, log_sum / jnp.maximum(sig_hits, 1).astype(F32), F32(0)),
        ).astype(F32)
        dev = (log_avg[:, None] - score).astype(F32)
        sq = dev * dev
        contrib = jnp.where(
            use_pos[:, None], jnp.where(pos_mask, sq, 0), jnp.where(cmask, sq, 0)
        )
        log_std = jnp.sum(contrib, axis=1).astype(F32)
        use_sig = jnp.where(use_pos, pos_sig_hits, sig_hits)
        stdev = jnp.where(
            use_sig > 1,
            jnp.sqrt(log_std / jnp.maximum(use_sig - 1, 1).astype(F32)),
            F32(0),
        ).astype(F32)

        has_human = jnp.any(human_c, axis=1)
        score = jnp.where(
            human_c & has_human[:, None], score + F32(cfg.diff_thresh2) * stdev[:, None], score
        )

        # --- sort candidates by (score asc, depth asc, slot asc) ----------
        # padding sorts FIRST so descending processing starts at the top
        # score; the explicit slot key keeps tie order deterministic across
        # platforms (TPU sorts are not stable)
        sort_key = jnp.where(cmask, score, F32(-3.0e38))
        # descending slot within ties: the print loop walks the order in
        # reverse, so ties come out in ascending slot (= ascending taxid)
        # order like the host path
        slot = jnp.broadcast_to(
            jnp.arange(C - 1, -1, -1, dtype=jnp.int32)[None, :], score.shape
        )
        order = jnp.lexsort((slot, depth_c, sort_key), axis=1)  # [B,C] ascending

        diff = stdev * F32(cfg.diff_thresh)
        res = self._find_read_label(cand, score, depth_c, cmask, n_cand, order,
                                    top_score, diff, e_in_c, e_out_c, plasmid_c)

        # formatting-ready views: raw taxids in print order and the call's
        # raw taxid, so the host never has to re-index scorer tables
        raw_c = pk[..., 5]
        # node-index view of the sorted candidates: half the transfer bytes of
        # raw taxids when the node count fits uint16 (host maps them back)
        tid_sorted, cand_sorted, score_sorted = self._permute(
            order, raw_c, cand, score
        )
        call_tid = jnp.take(self.node_pack[:, 5], res["call_idx"], mode="clip")

        return {
            "cand": cand, "cmask": cmask, "n_cand": n_cand, "score": score,
            "order": order, "cand_kmer_cnt": cand_kmer_cnt, "cnt_fnd": cnt_fnd,
            "valid_kmers": valid_kmers, "log_avg": log_avg, "stdev": stdev,
            "top_score": top_score, "fnd_phix": fnd_phix, "phix_score": phix_score,
            "overflow": overflow, "tid_sorted": tid_sorted,
            "cand_sorted": cand_sorted,
            "score_sorted": score_sorted, "call_tid": call_tid, **res,
        }

    # ------------------------------------------------------------------
    def _find_read_label(self, cand, score, depth_c, cmask, n_cand, order,
                         top_score, diff, e_in_c, e_out_c, plasmid_c):
        """Scan-based findReadLabelVer2 (read_label.cpp:284-419).

        All ancestor tests are precomputed as pairwise [B,C,C] Euler-interval
        compares and streamed into the scans as per-step xs rows, so the scan
        bodies are pure elementwise ops (no gathers inside the loops)."""
        import jax
        import jax.numpy as jnp

        C = self.cfg.max_candidates
        B = cand.shape[0]
        D = self.max_path
        bi = jnp.arange(B)

        # sorted candidate views [B,C]: one fused one-hot select for all
        # seven fields (see _permute)
        cand_s, score_s, depth_s, valid_s, e_in_s, e_out_s, pl_s = self._permute(
            order, cand, score, depth_c, cmask, e_in_c, e_out_c, plasmid_c
        )

        # ancS[b,i,j] = cand_s[i] proper ancestor of cand_s[j]
        ancS = (e_in_s[:, :, None] < e_in_s[:, None, :]) & (
            e_in_s[:, None, :] < e_out_s[:, :, None]
        )

        rev = jnp.arange(C - 1, -1, -1, dtype=jnp.int32)
        xs = {
            "c": jnp.moveaxis(cand_s[:, ::-1], 1, 0),       # [C,B]
            "sc": jnp.moveaxis(score_s[:, ::-1], 1, 0),
            "dp": jnp.moveaxis(depth_s[:, ::-1], 1, 0),
            "ok": jnp.moveaxis(valid_s[:, ::-1], 1, 0),
            "pl": jnp.moveaxis(pl_s[:, ::-1], 1, 0),
            "a_cm": jnp.moveaxis(ancS[:, ::-1, :], 1, 0),   # [C,B,C] anc(c_i, members)
            "a_mc": jnp.moveaxis(
                jnp.swapaxes(ancS, 1, 2)[:, ::-1, :], 1, 0
            ),                                              # anc(members, c_i)
            "i": rev,
            "onehot": jnp.eye(C, dtype=bool)[::-1],         # [C,C] step -> slot i
        }

        init = {
            "lin": jnp.zeros((B, C), bool),
            "lin_done": jnp.zeros(B, bool),
            "lidx": jnp.full(B, -1, jnp.int32),
            "lowest_depth": jnp.zeros(B, jnp.int32),
            "lowest_i": jnp.zeros(B, jnp.int32),
            "highest_depth": jnp.zeros(B, jnp.int32),
            "highest_i": jnp.zeros(B, jnp.int32),
            "plasmid_i": jnp.full(B, -1, jnp.int32),
            "stopped": jnp.zeros(B, bool),
            "first": jnp.ones(B, bool),
        }

        def body(state, x):
            sc = x["sc"]
            dp = x["dp"]
            i = x["i"]
            ok_pos = x["ok"] & ~state["stopped"]

            hit_pl = ok_pos & (sc >= top_score) & x["pl"]
            plasmid_i = jnp.where(hit_pl, i, state["plasmid_i"])

            # addToCandLineage test against current lineage members
            in_lin = state["lin"]
            bad = in_lin & (
                ((depth_s > dp[:, None]) & ~x["a_cm"])
                | ((depth_s < dp[:, None]) & ~x["a_mc"])
                | (depth_s == dp[:, None])
            )
            can_add = ~jnp.any(bad, axis=1)
            adding = ok_pos & ~state["lin_done"] & can_add
            failing = ok_pos & ~state["lin_done"] & ~can_add

            lin = state["lin"] | (adding[:, None] & x["onehot"][None, :])
            lin_done = state["lin_done"] | failing
            lidx = jnp.where(failing, i, state["lidx"])

            upd_low = adding & ((dp > state["lowest_depth"]) | state["first"])
            lowest_depth = jnp.where(upd_low, dp, state["lowest_depth"])
            lowest_i = jnp.where(upd_low, i, state["lowest_i"])
            upd_high = adding & ((dp < state["highest_depth"]) | state["first"])
            highest_depth = jnp.where(upd_high, dp, state["highest_depth"])
            highest_i = jnp.where(upd_high, i, state["highest_i"])
            first = state["first"] & ~ok_pos

            stopped = state["stopped"] | (ok_pos & lin_done & (sc < top_score))
            return {
                "lin": lin, "lin_done": lin_done, "lidx": lidx,
                "lowest_depth": lowest_depth, "lowest_i": lowest_i,
                "highest_depth": highest_depth, "highest_i": highest_i,
                "plasmid_i": plasmid_i, "stopped": stopped, "first": first,
            }, None

        state, _ = jax.lax.scan(body, init, xs, unroll=8)

        # --- path augmentation of cand_lin --------------------------------
        highest_c = cand_s[bi, state["highest_i"]]
        e_in_high = e_in_s[bi, state["highest_i"]]
        hpath = jnp.take(self.path_mat, highest_c, axis=0)  # [B,D]
        hvalid = (hpath >= 0) & (state["highest_depth"] > 0)[:, None]
        # score of path nodes if they are candidates (all_cand_set)
        in_cand = hpath[:, :, None] == cand_s[:, None, :]  # [B,D,C]
        in_cand = in_cand & valid_s[:, None, :]
        p_score = jnp.max(
            jnp.where(in_cand, score_s[:, None, :], F32(UNDEF)), axis=2
        )
        p_in_set = jnp.any(in_cand, axis=2)
        p_score = jnp.where(p_in_set, p_score, F32(UNDEF))

        # combined lineage = lineage members + path entries, sorted depth
        # desc; the candidate half's node attributes are already in the
        # sorted views, so only the path half gathers node_pack rows
        comb_idx = jnp.concatenate([cand_s, hpath], axis=1)          # [B,C+D]
        comb_score = jnp.concatenate([score_s, p_score], axis=1)
        comb_valid = jnp.concatenate([state["lin"], hvalid], axis=1)
        hpk = jnp.take(self.node_pack, hpath, axis=0, mode="clip")   # [B,D,8]
        comb_depth = jnp.concatenate([depth_s, hpk[..., 2]], axis=1)
        e_in_comb = jnp.concatenate([e_in_s, hpk[..., 0]], axis=1)
        e_out_comb = jnp.concatenate([e_out_s, hpk[..., 1]], axis=1)
        dkey = jnp.where(comb_valid, -comb_depth, 10**6)
        corder = jnp.argsort(dkey, axis=1, stable=True)
        lin_idx, lin_score, lin_valid, e_in_lin, e_out_lin = self._permute(
            corder, comb_idx, comb_score, comb_valid, e_in_comb, e_out_comb
        )

        # --- competing-lineage walk (no_good accumulation) ----------------
        CD = C + D
        # anc_lc[b,e,i] = lin entry e proper ancestor of cand_s[i]
        anc_lc = (e_in_lin[:, :, None] < e_in_s[:, None, :]) & (
            e_in_s[:, None, :] < e_out_lin[:, :, None]
        )
        # cand_s[i] proper ancestor of highest (in path(highest))
        in_add_set = (e_in_s < e_in_high[:, None]) & (
            e_in_high[:, None] < e_out_s
        )

        lidx = state["lidx"]
        xs2 = {
            "sc": jnp.moveaxis(score_s[:, ::-1], 1, 0),       # [C,B]
            "skip": jnp.moveaxis((in_add_set | ~valid_s)[:, ::-1], 1, 0),
            "anc_here": jnp.moveaxis(
                jnp.swapaxes(anc_lc, 1, 2)[:, ::-1, :], 1, 0
            ),                                                # [C,B,CD]
            "i": rev,
        }

        def comp_body(st, x):
            # visits original slots i = C-1 .. 0; a slot participates only
            # once the walk has started there (i <= lidx) and hasn't halted
            active = (x["i"] <= lidx) & ~st["halt"]
            csc = x["sc"]
            do = active & ~x["skip"]
            # inner walk over combined lineage (vectorized with prefix logic)
            anc_here = x["anc_here"]                          # [B,CD]
            far = lin_valid & (lin_score != F32(UNDEF)) & (
                (lin_score - csc[:, None]) > diff[:, None]
            )
            # walk stops at the first ancestor-of-cand or far entry
            stop = (anc_here | far) & lin_valid
            stop_pos = jnp.argmax(stop, axis=1)
            any_stop = jnp.any(stop, axis=1)
            reach = jnp.arange(CD)[None, :] < jnp.where(any_stop, stop_pos, CD)[:, None]
            close = lin_valid & ((lin_score - csc[:, None]) <= diff[:, None])
            mark = reach & close & do[:, None]
            no_good = st["no_good"] | mark
            stopped_far = do & any_stop & far[bi, stop_pos]
            halt = st["halt"] | stopped_far
            return {"no_good": no_good, "halt": halt}, None

        comp_init = {
            "no_good": jnp.zeros((B, CD), bool),
            "halt": jnp.zeros(B, bool),
        }
        comp_state, _ = jax.lax.scan(comp_body, comp_init, xs2, unroll=8)
        no_good_e = comp_state["no_good"]  # over combined entries pre-sort? no: entries [B,CD] in comb order

        # node-level no_good: an entry's node is no_good if any marked entry
        # shares its node id
        ng_nodes = jnp.any(
            (lin_idx[:, :, None] == lin_idx[:, None, :]) & no_good_e[:, None, :],
            axis=2,
        )

        any_lin = jnp.any(comb_valid, axis=1)
        any_ng = jnp.any(no_good_e, axis=1)

        # DirectMatch call = lowest
        lowest_c = cand_s[bi, state["lowest_i"]]
        lowest_sc = score_s[bi, state["lowest_i"]]

        # Multi branch: walk lin (depth desc) for first node not in no_good
        run_max = jax.lax.associative_scan(
            jnp.maximum, jnp.where(lin_valid, lin_score, F32(UNDEF)), axis=1
        )
        ok_node = lin_valid & ~ng_nodes
        root_pos = jnp.argmax(ok_node, axis=1)
        found_root = jnp.any(ok_node, axis=1)
        lca_c = lin_idx[bi, root_pos]
        max_val = run_max[bi, root_pos]

        DIRECT, MULTI, PARTIAL, NOMATCH, LCA_ERROR = 0, 1, 2, 3, 4
        match = jnp.where(
            ~any_lin & ~any_ng,
            NOMATCH,
            jnp.where(
                any_lin & ~any_ng,
                DIRECT,
                jnp.where(found_root, MULTI, LCA_ERROR),
            ),
        )
        call_c = jnp.where(match == DIRECT, lowest_c, jnp.where(match == MULTI, lca_c, 0))
        call_s = jnp.where(
            match == DIRECT, lowest_sc,
            jnp.where(match == MULTI, max_val, F32(-1.0)),
        )
        # plasmid override
        has_pl = state["plasmid_i"] >= 0
        pl_c = cand_s[bi, jnp.maximum(state["plasmid_i"], 0)]
        override = has_pl & self._anc(call_c, pl_c)
        call_c = jnp.where(override, pl_c, call_c)
        return {"call_idx": call_c, "call_score": call_s, "match": match}
