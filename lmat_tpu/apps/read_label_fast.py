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
    def __init__(self, dev_index, scorer, k: int = 20, min_score: float = 0.0,
                 dedup_frac: float | None = None):
        import jax

        self.k = k
        self.scorer = scorer
        self.min_score = min_score
        self.dev_index = dev_index
        self.dedup_frac = dedup_frac
        cfg = scorer.cfg

        import jax.numpy as jnp

        idx16 = self._init_node_tab(scorer)

        # dev_index is a jit ARGUMENT (DeviceIndex is a pytree): capturing the
        # tables in the closure would embed them as HLO constants
        def step(dev_index, batch, gc_bins):
            # batch arrives nibble-packed ([B, L/2] uint8, two bases/byte):
            # half the host->device upload bytes of the ASCII form (run()
            # and _prep() pack on the host)
            prep = prepare_reads(batch, k, packed=True)
            if dedup_frac:
                # cross-read k-mer dedup: probe distinct k-mers once (reads
                # from one organism share most k-mers); undersized caps are
                # safe — affected reads reroute via the overflow fallback
                from .read_label_device import probe_dedup

                B, P = prep["hi"].shape
                u_cap = max(128, -(-int(B * P * dedup_frac) // 128) * 128)
                pr = probe_dedup(dev_index, prep, min(u_cap, B * P))
            else:
                pr = probe(dev_index, prep)
            # GC bins come from the host: TPU f32 division is not IEEE
            # correctly-rounded and can flip the bin truncation at exact
            # boundaries (see core.encoding.host_gc_bins)
            pr["bin_sel"] = gc_bins
            out = scorer.score_batch(pr)
            # pack outputs to minimize host transfer bytes (the fetch round
            # trip is the critical path over remote host<->device links):
            # candidates ship pre-sorted as raw taxids, so neither the sort
            # order nor the node table is needed on the host
            # compact per-read int transfer when the ranges allow (node
            # indices fit uint16, counts fit uint16, flags/enums fit uint8):
            # 28 B/read -> 11 B/read of fetch bytes; _fetch reconstructs the
            # canonical 7-column int32 layout host-side
            compact = idx16 and scorer.cfg.max_candidates <= 255
            if compact:
                ints = (
                    jnp.stack(
                        [out["call_idx"], out["cand_kmer_cnt"],
                         out["cnt_fnd"], out["valid_kmers"]], axis=1
                    ).astype(jnp.uint16),
                    jnp.stack(
                        [out["match"], out["n_cand"],
                         out["fnd_phix"].astype(jnp.int32)], axis=1
                    ).astype(jnp.uint8),
                )
            else:
                ints = jnp.stack(
                    [out["call_tid"], out["match"], out["n_cand"],
                     out["cand_kmer_cnt"], out["cnt_fnd"], out["valid_kmers"],
                     out["fnd_phix"].astype(jnp.int32)],
                    axis=1,
                )
            flts = jnp.stack(
                [out["call_score"], out["log_avg"], out["stdev"],
                 out["top_score"], out["phix_score"]],
                axis=1,
            )
            cs = out["cand_sorted"]
            cs = cs.astype(jnp.uint16) if idx16 else cs
            ss = out["score_sorted"]
            # out["overflow"] is per-read ([B]); the trailing scalar is the
            # router-capacity overflow slot (always 0 single-chip — the
            # sharded subclass fills it)
            ovf = out["overflow"]
            if dedup_frac:
                ovf = ovf + pr["dedup_ovf"]
            if compact:
                # only the >0 test reaches the host; saturate into uint8
                ovf = jnp.minimum(ovf, 255).astype(jnp.uint8)

            # compact candidate transfer: only the PRINTED candidates (the
            # contiguous score>=0 tail of each sorted row) ship by default —
            # a [cap] flat stream instead of the dense [B,C] cand+score
            # arrays, cutting fetch bytes ~2.5x on remote host<->device
            # links.  The dense arrays stay in the output tuple; _fetch
            # pulls them only when the flat stream overflows `cap`.
            B2, C2 = ss.shape
            j = jnp.arange(C2, dtype=jnp.int32)[None, :]
            printable = (j >= (C2 - out["n_cand"])[:, None]) & (ss >= 0)
            m32 = jnp.sum(printable.astype(jnp.int32), axis=1)
            # m <= max_candidates <= 255 in compact mode; the total below
            # must sum in int32 BEFORE the narrowing cast
            m = m32.astype(jnp.uint8) if compact else m32
            cap = self.FLAT_CAP_PER_READ * B2
            key = jnp.where(
                printable,
                jnp.arange(B2, dtype=jnp.int32)[:, None] * C2 + j,
                jnp.int32(B2 * C2),
            ).reshape(-1)
            ssb = jax.lax.bitcast_convert_type(ss, jnp.int32).reshape(-1)
            _, flat_c, flat_sb = jax.lax.sort(
                (key, cs.reshape(-1).astype(jnp.int32), ssb), num_keys=1
            )
            flat_c = flat_c[:cap]
            flat_s = jax.lax.bitcast_convert_type(flat_sb[:cap], jnp.float32)
            flat_ovf = (jnp.sum(m32) > cap).astype(jnp.int32)
            return (ints, flts, cs, ss, ovf, jnp.int32(0),
                    m, flat_c.astype(cs.dtype), flat_s, flat_ovf)

        from ..core.encoding import host_gc_bins, pack_nibbles

        jit_step = jax.jit(step)

        def run(batch_np, gcb=None):
            # convention: a call WITHOUT gc bins carries the raw ASCII
            # batch (pack here); a call WITH them comes from the _prep
            # producer thread, which already packed (and uploaded) it
            if gcb is None:
                arr = np.asarray(batch_np)
                gcb = host_gc_bins(arr, k)
                batch_np = pack_nibbles(arr)
            return jit_step(self.dev_index, batch_np, gcb)

        self.step = run
        self.fallback = None
        self.track_count: dict[int, int] = {}
        self.track_score: dict[int, F] = {}
        self.track_nomatch: dict[int, int] = {}

    def set_fallback(self, host_clf):
        """Attach the exact host-path classifier used for reads whose
        candidate set overflows the device table (the reference has no cap:
        read_label.cpp:693-726).  The host classifier's tally dicts are
        aliased to ours so fastsummary accumulation stays in read order."""
        host_clf.track_count = self.track_count
        host_clf.track_score = self.track_score
        host_clf.track_nomatch = self.track_nomatch
        self.fallback = host_clf

    def _resolve_router(self, reads, vals):
        """Hook for router-capacity overflow (sharded subclass re-runs the
        batch with a doubled cap); single-chip steps never set the slot."""
        return vals

    # flat candidate-stream budget per read (see the compact-transfer note
    # in __init__); overflowing batches fall back to the dense fetch
    FLAT_CAP_PER_READ = 8

    def _fetch(self, dev_out):
        """Device->host transfer of a step result, normalized to the
        (ints, flts, cand_sorted, score_sorted, overflow, router) tuple.

        Single-chip steps emit the compact 10-tuple: the dense [B,C]
        candidate/score arrays are reconstructed from the flat printed-
        candidate stream (unshipped slots get score -1, which the print
        walk skips), and are fetched dense only when the stream overflowed.
        The multi-host subclass overrides this to pull process-local rows."""
        import jax

        if len(dev_out) != 10:
            return jax.device_get(dev_out)
        ints, flts, ovf, rtr, m, flat_c, flat_s, fovf = jax.device_get(
            (dev_out[0], dev_out[1], dev_out[4], dev_out[5], dev_out[6],
             dev_out[7], dev_out[8], dev_out[9])
        )
        if isinstance(ints, tuple):
            # compact transfer (see step): (uint16 [B,4], uint8 [B,3]) back
            # to the canonical int32 [B,7] columns; call_idx -> raw taxid
            # through the host node table
            a16, b8 = ints
            ints = np.column_stack([
                self._node_tab[np.minimum(a16[:, 0].astype(np.int64),
                                          len(self._node_tab) - 1)],
                b8[:, 0], b8[:, 1],
                a16[:, 1], a16[:, 2], a16[:, 3], b8[:, 2],
            ]).astype(np.int32)
        m = np.asarray(m, np.int64)
        if int(fovf):
            cs, ss = jax.device_get((dev_out[2], dev_out[3]))
            return ints, flts, cs, ss, ovf, rtr
        B = ints.shape[0]
        C = self.scorer.cfg.max_candidates
        cs = np.zeros((B, C), flat_c.dtype)
        ss = np.full((B, C), -1.0, np.float32)
        total = int(m.sum())
        if total:
            rows = np.repeat(np.arange(B), m)
            offs = np.cumsum(m) - m
            posj = (C - m[rows]) + (np.arange(total) - offs[rows])
            cs[rows, posj] = flat_c[:total]
            ss[rows, posj] = flat_s[:total]
        return ints, flts, cs, ss, ovf, rtr

    def _overflow_line(self, i, hdr, seq):
        """Classify one overflowing read through the exact host path."""
        if self.fallback is None:
            raise RuntimeError(
                "candidate-table overflow and no exact-path fallback is "
                "attached: raise max_candidates or call set_fallback()")
        return self.fallback.classify(hdr, seq)

    # default routing threshold for the long-read path (reads above this go
    # through the position-axis chunked probe + exact epilogue); the fast
    # scorer's [B, C, C] candidate tensors stay short-read sized
    LONG_READ_THRESHOLD = 2048

    def long_read_line(self, hdr: str, seq: str) -> str:
        """Classify one contig/long read of ANY length, bit-identically to
        the exact host path.

        Position-axis split (SURVEY.md §2.3): the read's window positions are
        partitioned into [rows, 4096] chunk rows probed on-device in one
        batch; the exact host epilogue scores the whole read from the merged
        per-position lookups (read_label.cpp:1225 label_vec semantics).
        Requires set_fallback() (the epilogue lives on the host classifier);
        tallies stay in read order through the shared dicts.
        """
        import functools

        import jax

        from .read_label_device import (
            chunk_long_read,
            chunk_lookups_to_positions,
            prepare_reads,
        )

        if self.fallback is None:
            raise RuntimeError("long_read_line requires set_fallback()")
        if getattr(self, "dev_index", None) is None:
            # mesh-sharded classifiers hold no single-chip index; the pure
            # host path is still exact (just not device-probed)
            return self.fallback.classify(hdr, seq)
        batch, n_pos, stride = chunk_long_read(seq, self.k)
        if n_pos == 0:
            return self.fallback.classify(hdr, seq)
        if not hasattr(self, "_long_jit"):
            def chunk_probe(dev_index, arr):
                prep = prepare_reads(arr, self.k)
                return dev_index.lookup(prep["hi"], prep["lo"], prep["qvalid"])

            self._long_jit = jax.jit(chunk_probe)
        found, ng, tids, tmask = jax.device_get(
            self._long_jit(self.dev_index, batch)
        )
        # the device arena stores node indices with flag bits (see
        # DeviceScorer.remap_index_tids); the exact epilogue needs raw taxids
        sc = self.scorer
        idx_mask = (1 << sc.IDX_BITS) - 1
        raw = np.asarray(sc.tids, np.int64)[
            np.asarray(tids, np.int64) & idx_mask
        ].astype(np.uint32)
        lookups = chunk_lookups_to_positions(found, ng, raw, tmask, n_pos, stride)
        return self.fallback.classify(hdr, seq, lookups=lookups)

    def _init_node_tab(self, scorer) -> bool:
        """Node-index candidate transfer: raw taxids cost 4 B each; node
        indices fit uint16 for taxonomies under 64k nodes and are mapped back
        through this table on the host.  Returns whether uint16 fits."""
        self._node_tab = np.concatenate(
            [np.asarray(scorer.tids, np.int64).astype(np.int32),
             np.zeros(8, np.int32)]
        )
        return scorer.n_nodes + 8 < (1 << 16)

    # outstanding device_get fetches: each fetch pays the full host<->device
    # round-trip latency, so on remote links several must be in flight for
    # the transfer time (not the latency) to be the cost per batch (measured
    # on the axon tunnel: depth 3 -> 6 was +17% e2e in round 1; 6 -> 10
    # another +15% in a round-5 same-window sweep — the threads are
    # IO-blocked, so the depth costs only outstanding-batch memory)
    FETCH_DEPTH = 10
    # batches prepared (pad + host GC bins + nibble pack + upload) ahead of
    # dispatch on a producer thread, so the host prep overlaps the device
    # step
    PREP_DEPTH = 4

    def _prep(self, reads, pad_to=None, fixed_rows=None):
        """Producer-thread half of a step: pad + host GC bins + the input
        UPLOAD.  device_put here overlaps the ~0.5 MB/batch host->device
        transfer with the previous batch's device step — over a remote
        link that transfer is ~15 ms/batch of critical-path time if left
        to the dispatch."""
        import jax

        from ..core.encoding import host_gc_bins, pack_nibbles

        import os

        arr = self.pad(reads, pad_to=pad_to, fixed_rows=fixed_rows)
        gcb = host_gc_bins(arr, self.k)
        if getattr(self, "dev_index", None) is None:
            # mesh-sharded classifiers let pjit place the (sharded, raw
            # ASCII) inputs
            return arr, gcb
        packed = pack_nibbles(arr)
        if os.environ.get("LMAT_TPU_NO_PREPUT"):
            return packed, gcb
        return jax.device_put(packed), jax.device_put(gcb)

    def _stream(self, batches, consume, pad_to=None, fixed_rows=None,
                work=None):
        """Shared pipelined driver: producer thread preps batch i+1..i+3,
        the main thread dispatches in order, FETCH_DEPTH worker threads run
        `work(reads, dev_out)` (default: the device fetch) for completed
        batches, and `consume(reads, result)` runs in order."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        if work is None:
            work = lambda reads, dev_out: self._fetch(dev_out)
        batches = list(batches)
        with ThreadPoolExecutor(max_workers=self.FETCH_DEPTH) as pool, \
                ThreadPoolExecutor(max_workers=1) as prep:
            pend = deque()  # (reads, future of work result), in order
            preps = {}

            def drain(keep):
                while len(pend) > keep:
                    p_reads, fut = pend.popleft()
                    consume(p_reads, fut.result())

            for i, reads in enumerate(batches):
                for j in range(i, min(i + self.PREP_DEPTH, len(batches))):
                    if j not in preps:
                        preps[j] = prep.submit(
                            self._prep, batches[j], pad_to, fixed_rows
                        )
                arr, gcb = preps.pop(i).result()
                dev_out = self.step(arr, gcb)
                pend.append((reads, pool.submit(work, reads, dev_out)))
                drain(self.FETCH_DEPTH)
            drain(0)

    def classify_stream(self, batches: list[list[tuple[str, str]]], out=None):
        """Pipelined classification over multiple batches.

        Overlapped stages: a producer thread preps upcoming batches, device
        steps are dispatched (async) ahead, and up to FETCH_DEPTH fetch
        threads pull completed batches over the host<->device link while the
        main thread formats them in order.  The fetch round trip — not
        device compute — is the critical path on remote links, so it gets
        concurrent threads."""
        all_lines = []

        def consume(reads, fetched):
            all_lines.extend(self._format(reads, fetched, out))

        self._stream(batches, consume)
        return all_lines

    def classify_stream_native(self, batches, out, pad_to=None, fixed_rows=None):
        """Like classify_stream but formats with the native C formatter and
        writes the final byte stream to a binary sink; returns the read
        count.  Requires io.native_writer.native_available().

        The fetch AND the (pure) native format both run on the worker
        threads — ctypes releases the GIL during the C call, so the ~5
        ms/batch of formatting overlaps the device pipeline; only the
        order-dependent tally updates and the final write stay on the main
        thread."""
        n = 0

        def work(reads, dev_out):
            vals = self._resolve_router(reads, self._fetch(dev_out))
            return vals, self._format_native_pure(reads, vals)

        def consume(reads, res):
            nonlocal n
            vals, pure = res
            if pure is None:
                # native formatter unavailable or overflow reroute:
                # Python path (handles the exact-path fallback)
                lines = self._format_vals(reads, vals)
                data = "".join(
                    l if l.endswith("\t") else l + "\n" for l in lines
                ).encode()
            else:
                data = self._apply_native_tallies(reads, pure)
            out.write(data)
            n += len(reads)

        self._stream(batches, consume, pad_to=pad_to, fixed_rows=fixed_rows,
                     work=work)
        return n

    def pad(self, reads, pad_to=None, fixed_rows=None):
        """Pack (hdr, seq) pairs into the device batch layout; fixed_rows
        keeps the row count static across a stream's tail batch."""
        seqs = [s for _, s in reads]
        if fixed_rows is not None and len(seqs) < fixed_rows:
            seqs = seqs + [""] * (fixed_rows - len(seqs))
        return pad_batch(seqs, pad_to=pad_to)

    def _format_native_pure(self, reads, vals):
        """Thread-safe half of the native format: no shared-state updates.
        Returns (data, track_tid, track_score, nomatch) or None when the
        native library is unavailable or the batch needs the overflow
        reroute (callers fall back to the Python path)."""
        from ..io.native_writer import fmt_out_lines

        cfg = self.scorer.cfg
        ints, flts, cand_sorted, score_sorted, overflow, _ = vals
        if int(np.max(overflow)) > 0:
            # rare: some reads overflowed the candidate table — take the
            # Python format path, which reroutes just those reads through
            # the exact host classifier
            return None
        tid_sorted = self._node_tab[np.asarray(cand_sorted, np.int64)]
        return fmt_out_lines(
            ints, flts, tid_sorted, score_sorted, reads,
            self.k, cfg.min_kmer, cfg.min_fnd_kmer, cfg.screen_phix,
            self.min_score,
        )

    def _apply_native_tallies(self, reads, pure):
        """Order-dependent half: summary tallies; returns the byte stream."""
        data, track_tid, track_score, nomatch = pure
        for i in range(len(reads)):
            t = int(track_tid[i])
            if t >= 0:
                self._track(t, track_score[i])
            k = int(nomatch[i])
            if k >= 0:
                self._nomatch(k)
        return data

    def format_native(self, reads, dev_out):
        """Format a fetched batch with the native C formatter; returns the
        final byte stream (newlines and the reject quirk included) and
        updates the summary tallies.  Returns None when the native library
        is unavailable — callers fall back to _format."""
        vals = self._resolve_router(reads, self._fetch(dev_out))
        pure = self._format_native_pure(reads, vals)
        if pure is None:
            return None
        return self._apply_native_tallies(reads, pure)

    def classify_batch(self, reads: list[tuple[str, str]], out=None):
        """reads: [(header, seq)]; writes lines to `out` (list or file)."""
        return self._format(reads, self.step(pad_batch([s for _, s in reads])), out)

    def _format(self, reads, dev_out, out=None):
        # one batched device_get: per-array fetches each pay a full
        # host<->device round trip, which dominates over remote links
        return self._format_vals(
            reads, self._resolve_router(reads, self._fetch(dev_out)), out
        )

    def _format_vals(self, reads, vals, out=None):
        cfg = self.scorer.cfg
        ints, flts, cand_sorted, score_sorted, overflow, _ = vals
        tid_sorted = self._node_tab[np.asarray(cand_sorted, np.int64)]
        res = {
            "ints": ints.tolist(),
            "flts": flts.tolist(),
            "tid": tid_sorted.tolist(),
            "score": score_sorted.tolist(),
        }
        ovf = np.asarray(overflow)
        lines = []
        for i, (hdr, seq) in enumerate(reads):
            if ovf[i] > 0:
                # graceful degrade: this read's candidate set exceeded the
                # device table — classify it on the exact host path (which
                # has no cap), keeping tally updates in read order
                line = self._overflow_line(i, hdr, seq)
            else:
                line = f"{hdr}\t{seq}\t" + self._finish_read(i, seq, res, cfg)
            lines.append(line)
        if out is not None:
            # reference quirk: reads rejected inside construct_labels leave
            # the header/read prefix without a newline (read_label.cpp:727-733)
            out.write("".join(l if l.endswith("\t") else l + "\n" for l in lines))
        return lines

    def _finish_read(self, i, seq, res, cfg) -> str:
        # values in res came through .tolist() from f32 arrays, so they are
        # exact doubles of the f32 values — '%g' formats them identically to
        # io.cppfmt.fmt_float without the per-call np.float32 wrap
        g = "%g".__mod__
        call_tid, match, n_cand, cand_kmer_cnt, cnt_fnd, valid_kmers, fnd_phix = res["ints"][i]
        call_score, log_avg, stdev, top_score, phix_score = res["flts"][i]
        ri_len = len(seq)
        if ri_len < self.k:
            self._nomatch(READ_TOO_SHORT)
            return f"-1 -1 -1\t-1 -1\t{ri_len} {self.k} ReadTooShort"
        if valid_kmers < cfg.min_kmer:
            self._nomatch(READ_TOO_SHORT)
            return f"-1 -1 -1\t-1 -1\t{valid_kmers} {cfg.min_kmer} ReadTooShort"
        if n_cand == 0:
            self._nomatch(NO_DB_HITS)
            return f"-1 -1 {valid_kmers}\t-1 -1\t{ri_len} {self.k} NoDbHits"
        if cnt_fnd < cfg.min_fnd_kmer or cand_kmer_cnt < cfg.min_kmer:
            self._nomatch(NO_DB_HITS)
            return ""  # reference writes nothing for this case

        # phiX short-circuit
        if cfg.screen_phix and fnd_phix and F(phix_score) >= F(top_score):
            ps = F(phix_score)
            self._track(ART_SEQ_TID, ps)
            return (
                f"-1 -1 {cand_kmer_cnt}\t{ART_SEQ_TID} {fmt_float(ps)}\t"
                f"{ART_SEQ_TID} {fmt_float(ps)} DirectMatch"
            )

        parts = [f"{g(log_avg)} {g(stdev)} {cand_kmer_cnt}\t"]
        score_i = res["score"][i]
        tid_i = res["tid"][i]
        C = len(score_i)
        printed = False
        # candidates arrive sorted ascending by (score, depth) with padding
        # first: the last n_cand entries are the valid ones
        for j in range(C - 1, C - 1 - n_cand, -1):
            if score_i[j] >= 0:
                parts.append(f" {tid_i[j]} {g(score_i[j])}")
                printed = True
        if not printed:
            parts.append("-1 -1")
        parts.append("\t")

        if match in (DIRECT, MULTI, PARTIAL):
            cs = F(call_score)
            parts.append(f"{call_tid} {fmt_float(cs)} {MATCH_STR[match]}")
            if cs >= self.min_score and valid_kmers >= cfg.min_kmer:
                self._track(call_tid, cs)
            elif cs < self.min_score:
                self._nomatch(LOW_SCORE)
        elif match == NOMATCH:
            parts.append("-1 -1 NoMatch")
            self._nomatch(NO_DB_HITS)
        else:  # LCA_ERROR prints "Unmatched" (read_label.cpp:933-936)
            parts.append("-1 -1 Unmatched")
            self._nomatch(LOW_SCORE)
        return "".join(parts)

    def write_fastsummary(self, path: str, rank_ids_file: str):
        from .read_label_host import write_fastsummary

        write_fastsummary(self.track_score, self.track_count, path, rank_ids_file)

    def write_nomatchsum(self, path: str):
        from .read_label_host import write_nomatchsum

        write_nomatchsum(self.track_nomatch, path)

    def _track(self, tid, score):
        if tid not in self.track_count:
            self.track_count[tid] = 1
            self.track_score[tid] = F(score)
        else:
            self.track_count[tid] += 1
            self.track_score[tid] = self.track_score[tid] + F(score)

    def _nomatch(self, kind):
        self.track_nomatch[kind] = self.track_nomatch.get(kind, 0) + 1
