"""Gene annotation pass — second k-mer search over classified reads.

Replicates /root/reference/src/gene_label.cpp: parse read_label ``.out``
lines, look every canonical k-mer of the read up in a gene-ID-keyed k-mer DB,
call the gene with the most k-mer hits (score = hits / distinct-valid-k-mers),
and aggregate (gene, read-taxid) count/score tables joined against a gzipped
gene-name table into ``.genesummary`` files.

Field-parsing quirks reproduced exactly (gene_label.cpp:588-632): C++11
zero-on-extraction-failure, the ReadTooShort skip via stats[2] == -1, and
taxid := 0 for NoDbHits/ReadTooShort match types.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass, field

import numpy as np

from ..core.encoding import ReadKmers
from ..core.gnusort import gnu_sort
from ..io.cppfmt import fmt_float

F = np.float32


@dataclass
class GeneLabelOptions:
    min_score: float = 0.0      # -x (run_gl.sh: 0.1)
    min_kmer: int = 0           # -q (run_gl.sh: 20)
    min_tax_score: float = 0.0  # -b
    k: int = 20


def _parse_out_line(line: str):
    """Replicate the tab-field scan of gene_label.cpp:603-632.

    Returns (hdr, read, skip, taxid, tax_score) — skip=True for the
    stats[2] == -1 (ReadTooShort) case.
    """
    p1 = line.find("\t")
    hdr = line[:p1] if p1 >= 0 else line
    p2 = line.find("\t", p1 + 1) if p1 >= 0 else -1
    read_buff = line[p1 + 1 : p2 if p2 >= 0 else len(line)] if p1 >= 0 else ""
    p3 = line.find("\t", p2 + 1) if p2 >= 0 else -1
    stats = line[p2 + 1 : p3 if p3 >= 0 else len(line)] if p2 >= 0 else ""
    s = _extract_floats(stats, 3)
    if s[2] == -1.0:
        return hdr, read_buff, True, 0, F(0)
    # npos+1 wraps to 0 in the reference when a tab is missing
    p3_next = (p3 + 1) if p3 >= 0 else 0
    p4 = line.find("\t", p3_next)
    p4_next = (p4 + 1) if p4 >= 0 else 0
    p5 = line.find("\t", p4_next)
    taxid_w_scores = line[p4 + 1 : (p5 + 1) if p5 >= 0 else len(line)] if p4 >= 0 else line[0 : (p5 + 1) if p5 >= 0 else len(line)]
    toks = taxid_w_scores.split()
    taxid, tax_score, match_type = 0, F(0), ""
    ok = True
    if toks:
        try:
            taxid = int(toks[0])
        except ValueError:
            taxid, ok = 0, False
        if ok and len(toks) > 1:
            try:
                tax_score = F(toks[1])
            except ValueError:
                tax_score, ok = F(0), False
        if ok and len(toks) > 2:
            match_type = toks[2]
    if match_type[:1] in ("N", "R"):
        taxid = 0
    return hdr, read_buff, False, taxid, tax_score


def _extract_floats(s: str, n: int):
    out = [0.0] * n
    toks = s.split()
    for i in range(n):
        if i < len(toks):
            try:
                out[i] = float(toks[i])
            except ValueError:
                break
        else:
            break
    return out


class GeneLabeler:
    def __init__(self, gene_index, opts: GeneLabelOptions):
        self.index = gene_index
        self.opts = opts
        # taxid -> {gid -> count}, taxid -> {gid -> score sum}; plus the
        # min_tax_score-filtered twins (gene_label.cpp:535-539)
        self.track: dict[int, dict[int, int]] = {}
        self.track_tax: dict[int, dict[int, int]] = {}
        self.score: dict[int, dict[int, F]] = {}
        self.score_tax: dict[int, dict[int, F]] = {}

    def process_line(self, line: str, lookups=None) -> str | None:
        """Process one read_label .out line; returns the output line or None."""
        hdr, read, skip, taxid, tscore = _parse_out_line(line)
        if skip or len(read) < self.opts.k:
            return None
        rk = ReadKmers(read.encode(), self.opts.k)
        gene_track: dict[int, int] = {}
        geneid_lst: list[int] = []
        valid_cnt = 0
        P = rk.kmers.shape[0]
        for pos in range(P):
            if not rk.valid[pos] or rk.is_dup[pos]:
                continue
            valid_cnt += 1
            if lookups is not None:
                found, _ng, gids = lookups[pos]
                if not found:
                    continue
            else:
                got = self.index.lookup_host(int(rk.kmers[pos]))
                if got is None:
                    continue
                gids = got[1]
            for gid in gids:
                gid = int(gid)
                if gid not in gene_track:
                    gene_track[gid] = 1
                    geneid_lst.append(gid)
                else:
                    gene_track[gid] += 1
        if not geneid_lst:
            return None
        return self._finish_read(hdr, read, taxid, tscore, geneid_lst,
                                 gene_track, valid_cnt)

    def _finish_read(self, hdr, read, taxid, tscore, geneid_lst, gene_track,
                     valid_cnt):
        """Best-gene selection + line formatting + summary tallies
        (gene_label.cpp:288-302); geneid_lst must be in first-occurrence
        order so the exact std::sort tie permutation is reproduced."""
        gsort = [(g, gene_track[g]) for g in geneid_lst]
        gnu_sort(gsort, lambda a, b: a[1] > b[1])
        gl, best_cnt = gsort[0]
        gscore = F(best_cnt) / F(valid_cnt)
        out = (
            f"{hdr}\t{read}\t{taxid} {fmt_float(tscore)}\t"
            f"\t-1 {best_cnt} {valid_cnt}\t{gl} {fmt_float(gscore)} GL"
        )
        self._tally(taxid, tscore, gl, gscore, valid_cnt)
        return out

    def _tally(self, taxid, tscore, gl, gscore, valid_cnt):
        """Summary accumulation (gene_label.cpp:302-310)."""
        o = self.opts
        if gscore > o.min_score and valid_cnt > o.min_kmer:
            self.track.setdefault(taxid, {}).setdefault(gl, 0)
            self.track[taxid][gl] += 1
            self.score.setdefault(taxid, {})
            self.score[taxid][gl] = self.score[taxid].get(gl, F(0)) + gscore
        if tscore >= o.min_tax_score and gscore > o.min_score and valid_cnt > o.min_kmer:
            self.track_tax.setdefault(taxid, {}).setdefault(gl, 0)
            self.track_tax[taxid][gl] += 1
            self.score_tax.setdefault(taxid, {})
            self.score_tax[taxid][gl] = self.score_tax[taxid].get(gl, F(0)) + gscore

    def ingest_out_file(self, path: str):
        """Replay summary tallies from an existing gene_label ``.out`` file
        (no DB probes): each row carries the call taxid/tscore and the
        best-gene (gl, gscore, valid_cnt) this tally needs — so shipped
        outputs regenerate their own .genesummary files
        (tests/test_golden_example.py)."""
        with open(path) as f:
            for raw in f:
                vals = raw.rstrip("\n").split("\t")
                if len(vals) < 6:
                    continue
                call = vals[2].split(" ")
                stats = vals[4].split(" ")
                gcall = vals[5].split(" ")
                if len(call) < 2 or len(stats) < 3 or len(gcall) < 3:
                    continue
                taxid = int(call[0])
                tscore = F(call[1])
                valid_cnt = int(stats[2])
                gl = int(gcall[0])
                gscore = F(gcall[1])
                self._tally(taxid, tscore, gl, gscore, valid_cnt)

    def run_files(self, out_files: list[str], ofbase: str, device: bool = False):
        """One output file per input file (thread-per-file in the reference).
        device=True batches the k-mer lookups through the TPU probe."""
        for i, path in enumerate(out_files):
            with open(path) as f, open(f"{ofbase}{i}.out", "w") as ofs:
                if device:
                    self._run_device(f, ofs)
                else:
                    for raw in f:
                        res = self.process_line(raw.rstrip("\n"))
                        if res is not None:
                            ofs.write(res + "\n")

    def _make_gene_step(self, C: int):
        """Jitted batched step: probe -> per-read gene-candidate table with
        occurrence counts and first-occurrence ranks.  The gene ids are raw
        (no taxonomy remap), so the unique compaction splits values into two
        16-bit one-hot matmuls to stay exact in f32."""
        import jax
        import jax.numpy as jnp

        from .read_label_device import prepare_reads, probe

        dev = self.index.to_device()
        k = self.opts.k
        SENT = jnp.int32(0x7FFFFFFF)

        def step(dev, batch):
            pr = probe(dev, prepare_reads(batch, k))
            gids = pr["tids"].astype(jnp.int32)
            tmask = pr["tmask"]
            B, P, T = gids.shape
            flat = jnp.where(tmask, gids, SENT).reshape(B, P * T)
            s = jnp.sort(flat, axis=1)
            uniq = jnp.concatenate(
                [jnp.ones((B, 1), bool), s[:, 1:] != s[:, :-1]], axis=1
            ) & (s < SENT)
            pos = jnp.cumsum(uniq.astype(jnp.int32), axis=1) - 1
            oh = uniq[:, :, None] & (
                pos[:, :, None] == jnp.arange(C, dtype=jnp.int32)[None, None, :]
            )
            ohf = oh.astype(jnp.float32)

            def compact(vals):
                # precision=HIGHEST: carries integer gene-ID halves; default
                # f32 dots may round through bf16 on some TPU generations.
                return jnp.einsum(
                    "bj,bjc->bc", vals.astype(jnp.float32), ohf,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).astype(jnp.int32)

            lo16 = compact(s & 0xFFFF)
            hi16 = compact((s >> 16) & 0x7FFF)
            cand = jnp.where(jnp.any(oh, axis=1), (hi16 << 16) | lo16, SENT)
            total = jnp.max(pos, axis=1) + 1
            n_cand = jnp.minimum(total, C)
            overflow = jnp.max(jnp.maximum(total - C, 0))

            m = (flat[:, :, None] == cand[:, None, :]) & (flat < SENT)[:, :, None]
            cnt = jnp.sum(m.astype(jnp.int32), axis=1)
            lin = jnp.arange(flat.shape[1], dtype=jnp.int32)[None, :, None]
            first = jnp.min(jnp.where(m, lin, jnp.int32(0x7FFFFFFF)), axis=1)
            valid_cnt = jnp.sum(pr["qvalid"].astype(jnp.int32), axis=1)
            return cand, cnt, first, n_cand, valid_cnt, overflow

        import functools

        return functools.partial(jax.jit(step), dev)

    def _run_device(self, f, ofs, batch_size: int = 1024, max_genes: int = 256):
        """Batched device gene pass: the per-position/per-gid Python loop is
        replaced by the jitted candidate-count step; the host only rebuilds
        each read's first-occurrence gene list (preserving the reference's
        exact std::sort tie behavior) and formats."""
        import jax
        import numpy as np

        from .read_label_device import pad_batch

        lines = [raw.rstrip("\n") for raw in f]
        # small inputs (tests, tail files) compile a correspondingly small
        # step shape instead of the full batch
        while batch_size // 2 >= len(lines) and batch_size > 32:
            batch_size //= 2
        if not hasattr(self, "_gstep"):
            self._gstep = self._make_gene_step(max_genes)
        k = self.opts.k
        for lo in range(0, len(lines), batch_size):
            chunk = lines[lo : lo + batch_size]
            parsed = [_parse_out_line(line) for line in chunk]
            seqs = ["" if p[2] else p[1] for p in parsed]
            batch = pad_batch(
                [s if s else "N" for s in seqs] + [""] * (batch_size - len(chunk))
            )
            cand, cnt, first, n_cand, valid_cnt, overflow = jax.device_get(
                self._gstep(batch)
            )
            assert int(overflow) == 0, "raise max_genes"
            for j, (hdr, read, skip, taxid, tscore) in enumerate(parsed):
                if skip or len(read) < k:
                    continue
                n = int(n_cand[j])
                if n == 0:
                    continue
                order = np.argsort(first[j, :n], kind="stable")
                geneid_lst = [int(cand[j, o]) for o in order]
                gene_track = {int(cand[j, o]): int(cnt[j, o]) for o in order}
                res = self._finish_read(
                    hdr, read, taxid, tscore, geneid_lst, gene_track,
                    int(valid_cnt[j]),
                )
                if res is not None:
                    ofs.write(res + "\n")

    # ------------------------------------------------------------------
    def _merge(self, per_tax: dict) -> dict:
        """taxid->{gid->v} re-keyed as gid->{taxid->v} (doMerge/doMergeF)."""
        out: dict[int, dict[int, object]] = {}
        for tid in sorted(per_tax):
            for gid, v in per_tax[tid].items():
                out.setdefault(gid, {})
                out[gid][tid] = out[gid].get(tid, 0) + v
        return out

    def write_summaries(self, gene_table_gz: str, ofbase: str):
        o = self.opts
        merge_cnt = self._merge(self.track)
        merge_cnt_tax = self._merge(self.track_tax)
        score_merge = self._merge(self.score)
        score_merge_tax = self._merge(self.score_tax)
        base = f"{ofbase}.{fmt_float(o.min_score) if o.min_score else '0'}.{o.min_kmer}.genesummary"
        f1 = open(base, "w")
        f2 = open(f"{base}.min_tax_score.{fmt_float(o.min_tax_score) if o.min_tax_score else '0'}", "w")
        opener = gzip.open if gene_table_gz.endswith(".gz") else open
        with opener(gene_table_gz, "rt") as gt:
            for raw in gt:
                line = raw.rstrip("\n")
                toks = line.split()
                if len(toks) < 2:
                    continue
                try:
                    gid = int(toks[1])
                except ValueError:
                    continue
                if gid in merge_cnt:
                    for label in sorted(merge_cnt[gid]):
                        cnt = merge_cnt[gid][label]
                        sc = score_merge.get(gid, {}).get(label, F(0))
                        avg = sc / F(cnt)
                        f1.write(f"{fmt_float(avg)}\t{cnt}\t{label}\t{line}\n")
                if gid in merge_cnt_tax:
                    for label in sorted(merge_cnt_tax[gid]):
                        cnt = merge_cnt_tax[gid][label]
                        sc = score_merge_tax.get(gid, {}).get(label, F(0))
                        avg = sc / F(cnt)
                        f2.write(f"{fmt_float(avg)}\t{cnt}\t{label}\t{line}\n")
        f1.close()
        f2.close()
