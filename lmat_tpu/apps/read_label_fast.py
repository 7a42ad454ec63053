"""Fast mode — full-device classification pipeline.

One jit: encode -> probe -> device scorer.  The host only formats output
lines and applies the tiny per-read gating that depends on string output
(ReadTooShort/NoDbHits rows, the phiX short-circuit, summary tallies).
"""

from __future__ import annotations

import numpy as np

from ..io.cppfmt import fmt_float
from .read_label_device import pad_batch, prepare_reads, probe
from .read_label_host import (
    ART_SEQ_TID,
    DIRECT,
    LCA_ERROR,
    MATCH_STR,
    MULTI,
    NOMATCH,
    PARTIAL,
    NO_DB_HITS,
    READ_TOO_SHORT,
    LOW_SCORE,
)

F = np.float32


class FastClassifier:
    def __init__(self, dev_index, scorer, k: int = 20, min_score: float = 0.0):
        import jax

        self.k = k
        self.scorer = scorer
        self.min_score = min_score
        self.dev_index = dev_index
        cfg = scorer.cfg

        def step(batch):
            prep = prepare_reads(batch, k)
            pr = probe(dev_index, prep)
            return scorer.score_batch(pr)

        self.step = jax.jit(step)
        self.track_count: dict[int, int] = {}
        self.track_score: dict[int, F] = {}
        self.track_nomatch: dict[int, int] = {}

    def classify_batch(self, reads: list[tuple[str, str]], out=None):
        """reads: [(header, seq)]; writes lines to `out` (list or file)."""
        cfg = self.scorer.cfg
        batch = pad_batch([s for _, s in reads])
        res = {k: np.asarray(v) for k, v in self.step(batch).items()}
        assert int(res["overflow"]) == 0, "candidate cap overflow; raise max_candidates"
        tids = self.scorer.tids
        lines = []
        for i, (hdr, seq) in enumerate(reads):
            prefix = f"{hdr}\t{seq}\t"
            line = prefix + self._finish_read(i, seq, res, cfg)
            lines.append(line)
            if out is not None:
                out.write(line + "\n")
        return lines

    def _finish_read(self, i, seq, res, cfg) -> str:
        tids = self.scorer.tids
        ri_len = len(seq)
        if ri_len < self.k:
            self._nomatch(READ_TOO_SHORT)
            return f"-1 -1 -1\t-1 -1\t{ri_len} {self.k} ReadTooShort"
        valid_kmers = int(res["valid_kmers"][i])
        if valid_kmers < cfg.min_kmer:
            self._nomatch(READ_TOO_SHORT)
            return f"-1 -1 -1\t-1 -1\t{valid_kmers} {cfg.min_kmer} ReadTooShort"
        n_cand = int(res["n_cand"][i])
        if n_cand == 0:
            self._nomatch(NO_DB_HITS)
            return f"-1 -1 {valid_kmers}\t-1 -1\t{ri_len} {self.k} NoDbHits"
        cnt_fnd = int(res["cnt_fnd"][i])
        cand_kmer_cnt = int(res["cand_kmer_cnt"][i])
        if cnt_fnd < cfg.min_fnd_kmer or cand_kmer_cnt < cfg.min_kmer:
            self._nomatch(NO_DB_HITS)
            return ""  # reference writes nothing for this case

        # phiX short-circuit
        if cfg.screen_phix and bool(res["fnd_phix"][i]):
            ps = F(res["phix_score"][i])
            if ps >= F(res["top_score"][i]):
                self._track(ART_SEQ_TID, ps)
                return (
                    f"-1 -1 {cand_kmer_cnt}\t{ART_SEQ_TID} {fmt_float(ps)}\t"
                    f"{ART_SEQ_TID} {fmt_float(ps)} DirectMatch"
                )

        parts = [
            f"{fmt_float(res['log_avg'][i])} {fmt_float(res['stdev'][i])} {cand_kmer_cnt}\t"
        ]
        order = res["order"][i]
        score = res["score"][i]
        cmask = res["cmask"][i]
        cand = res["cand"][i]
        printed = False
        for j in range(len(order) - 1, -1, -1):
            c = order[j]
            if cmask[c] and score[c] >= 0:
                parts.append(f" {int(tids[cand[c]])} {fmt_float(score[c])}")
                printed = True
        if not printed:
            parts.append("-1 -1")
        parts.append("\t")

        match = int(res["match"][i])
        if match in (DIRECT, MULTI, PARTIAL):
            call_tid = int(tids[int(res["call_idx"][i])])
            call_score = F(res["call_score"][i])
            parts.append(f"{call_tid} {fmt_float(call_score)} {MATCH_STR[match]}")
            if call_score >= self.min_score and valid_kmers >= cfg.min_kmer:
                self._track(call_tid, call_score)
            elif call_score < self.min_score:
                self._nomatch(LOW_SCORE)
        elif match == NOMATCH:
            parts.append("-1 -1 NoMatch")
            self._nomatch(NO_DB_HITS)
        else:  # LCA_ERROR prints "Unmatched" (read_label.cpp:933-936)
            parts.append("-1 -1 Unmatched")
            self._nomatch(LOW_SCORE)
        return "".join(parts)

    def _track(self, tid, score):
        if tid not in self.track_count:
            self.track_count[tid] = 1
            self.track_score[tid] = F(score)
        else:
            self.track_count[tid] += 1
            self.track_score[tid] = self.track_score[tid] + F(score)

    def _nomatch(self, kind):
        self.track_nomatch[kind] = self.track_nomatch.get(kind, 0) + 1
