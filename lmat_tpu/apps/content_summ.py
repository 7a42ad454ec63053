"""Content summarization — multi-k distinct-k-mer coverage per taxon.

Replicates /root/reference/src/content_summ.cpp: reads a fastsummary and the
classified ``.out`` files, rolls strain calls up to species, counts distinct
canonical k-mers per (k, taxid) over the classified reads (no DB lookups),
and writes the tree-indented ``.summ`` plus per-rank ``_kmer_cov`` coverage
histograms.

Reference quirks reproduced:
  * the per-rank coverage file is created on the first taxid of a rank but
    that taxid's histogram is NOT written (shadowed-variable bug,
    content_summ.cpp:497-512);
  * children are traversed depth-first with each node's children reversed
    (push_front onto the open list, content_summ.cpp:475-486);
  * rows are emitted for every tree node on a called path, including
    zero-read internal nodes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core.encoding import _CODE_LUT
from ..io.cppfmt import fmt_float

F = np.float32


def is_plasmid(tid: int, low_num=frozenset()) -> bool:
    return (10000000 <= tid < 11000000) or tid in low_num


def is_human(tid: int) -> bool:
    return tid in (9606, 63221, 741158)


@dataclass
class ContentSummOptions:
    k_list: tuple = (8, 10, 14, 20)     # -k (run_cs.sh: 8,10,12,14,17)
    rank_check: tuple = ("plasmid", "species", "genus")  # -a
    threshold: float = 0.0              # -v
    skip_human: bool = False            # -s
    do_human_reg: bool = False          # -n
    low_num_plasmids: frozenset = field(default_factory=frozenset)  # -p
    device: bool = False                # TPU data plane (apps/content_device)


def _parse_call_field(line: str):
    """Field scan of content_summ.cpp:410-425. Returns (read, call_str)."""
    p1 = line.find("\t")
    p2 = line.find("\t", p1 + 1) if p1 >= 0 else -1
    p3 = line.find("\t", p2 + 1) if p2 >= 0 else -1
    p3n = (p3 + 1) if p3 >= 0 else 0
    p4 = line.find("\t", p3n)
    p4n = (p4 + 1) if p4 >= 0 else 0
    p5 = line.find("\t", p4n)
    read = line[p1 + 1 : p2 if p2 >= 0 else len(line)] if p1 >= 0 else ""
    lo = p4 + 1 if p4 >= 0 else 0
    hi = p5 if p5 >= 0 else len(line)
    return read, line[lo:hi]


class ContentSummarizer:
    def __init__(self, taxonomy, opts: ContentSummOptions):
        self.tax = taxonomy
        self.opts = opts
        self.weighted: dict[int, str] = {}   # printed verbatim via %g float
        self.read_cnts: dict[int, int] = {}
        self.clst: list[int] = []
        self.strain2spec: dict[int, int] = {}
        # k -> taxid -> [uint64 arrays of per-read-distinct k-mers]
        self.kmer_track: dict[int, dict[int, list]] = {
            k: {} for k in opts.k_list
        }
        self._pending: list[tuple[int, bytes]] = []  # (use_tid, read)
        self._pool = None
        self._futures: list = []
        self._device_chunks: list = []
        self._flusher = None
        if opts.device:
            from .content_device import DeviceFlusher

            self._flusher = DeviceFlusher(opts.k_list, self._flush_batch)

    # -- fastsummary load (content_summ.cpp:349-382) -----------------------

    def load_fastsummary(self, path: str):
        tax = self.tax
        target_rank = "region" if self.opts.do_human_reg else "species"
        with open(path) as f:
            for raw in f:
                line = raw.rstrip("\n")
                if "\tNULL\t" in line:
                    continue
                toks = line.split()
                if len(toks) < 3:
                    continue
                wght = F(toks[0])
                cnt = int(toks[1])
                tid = int(toks[2])
                self.weighted.setdefault(tid, wght)
                self.read_cnts.setdefault(tid, cnt)
                if tax.rank.get(tid, "") == target_rank:
                    self.strain2spec.setdefault(tid, tid)
                if not is_plasmid(tid, self.opts.low_num_plasmids):
                    for ptid in tax.path_to_root(tid):
                        if tax.rank.get(ptid, "") == target_rank:
                            self.strain2spec.setdefault(tid, ptid)
                self.clst.append(tid)

    # -- per-read k-mer accumulation ---------------------------------------

    def process_out_file(self, path: str):
        opts = self.opts
        tax = self.tax
        rank_check = set(opts.rank_check)
        with open(path) as f:
            for raw in f:
                line = raw.rstrip("\n")
                read, call = _parse_call_field(line)
                if call[:1] in ("N", "R"):
                    continue
                toks = call.split()
                taxid, score = 0, F(0)
                ok = True
                if toks:
                    try:
                        taxid = int(toks[0])
                        if taxid < 0:
                            taxid &= 0xFFFFFFFF  # C++ unsigned wrap
                    except ValueError:
                        taxid, ok = 0, False
                    if ok and len(toks) > 1:
                        try:
                            score = F(toks[1])
                        except ValueError:
                            score = F(0)
                if is_human(taxid) and opts.skip_human:
                    continue
                if score < opts.threshold:
                    continue
                use_tid = taxid
                if taxid in self.strain2spec and not is_plasmid(taxid, opts.low_num_plasmids):
                    use_tid = self.strain2spec[taxid]
                rnk = tax.rank.get(use_tid, "undef") if use_tid in tax.rank else "undef"
                if rnk in rank_check or is_plasmid(taxid, opts.low_num_plasmids):
                    self._store_kmers(read, use_tid)

    # flush granularity: the row tag must fit alongside the 2k k-mer bits in
    # 64 bits; 16k reads per flush keeps every k <= 24 safe and the padded
    # [N, Lmax] work matrices small
    _FLUSH = 1 << 14

    def _store_kmers(self, read: str, use_tid: int):
        # buffer the read; the multi-k distinct-k-mer counting runs batched
        # over thousands of reads at once (content_summ.cpp:116-155 does this
        # per read per k in an OpenMP loop — here the batches are vectorized
        # passes dispatched to a thread pool: NumPy releases the GIL, so the
        # flushes parallelize across cores like the reference's OpenMP loop)
        self._pending.append((use_tid, read.encode()))
        if len(self._pending) >= self._FLUSH:
            self._dispatch_flush()

    def _dispatch_flush(self):
        pending, self._pending = self._pending, []
        if not pending:
            return
        if self._flusher is not None:
            # device flushes run synchronously: the TPU serializes batches
            # anyway, and dispatch overlaps the next file read
            self._device_chunks.extend(self._flusher.flush(pending))
            return
        if self._pool is None:
            import os as _os
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=_os.cpu_count() or 2)
            self._futures = []
        self._futures.append(self._pool.submit(self._flush_batch, pending))

    def _flush(self):
        """Collect all dispatched flushes into kmer_track (main thread)."""
        self._dispatch_flush()
        for k, tid_val, chunk in self._device_chunks:
            self.kmer_track[k].setdefault(tid_val, []).append(chunk)
        self._device_chunks = []
        if self._pool is None:
            return
        for fut in self._futures:
            for k, tid_val, chunk in fut.result():
                self.kmer_track[k].setdefault(tid_val, []).append(chunk)
        self._futures = []

    def _flush_batch(self, pending):
        """Batched multi-k distinct-k-mer extraction over one read buffer.

        One padded [N, Lmax] code matrix; kmax windows are built once by
        doubling (log2(kmax) combine steps); each smaller k is a shift/mask
        of the kmax window.  A single tagged np.unique
        ((read_row << 2k) | kmer) per k performs the within-read dedup that
        the reference's per-read set insertion does (content_summ.cpp:130-147).
        Pure function: returns [(k, tid, kmer_array)] for the main thread.
        """
        # group rows by taxid up front: unique's sorted output is then
        # already taxid-grouped (row is the tag's high bits), no argsort
        pending.sort(key=lambda p: p[0])
        tids = np.array([t for t, _ in pending], np.int64)
        reads = [r for _, r in pending]
        N = len(reads)
        lens = np.array([len(r) for r in reads], np.int64)
        Lmax = int(lens.max()) if N else 0
        kmax = max(self.opts.k_list)
        mat = np.zeros((N, Lmax + kmax), np.uint8)  # 0-pad decodes as invalid
        for i, r in enumerate(reads):
            mat[i, : lens[i]] = np.frombuffer(r, np.uint8)
        codes = _CODE_LUT[mat]
        valid = codes != 255
        c = (codes & np.uint8(3)).astype(np.uint64)
        cs = np.zeros((N, Lmax + kmax + 1), np.int64)
        np.cumsum(valid, axis=1, out=cs[:, 1:])

        # kmax-wide windows by doubling: W_{j+s}(p) = W_j(p)<<2s | W_s(p+j)
        # where W_s is a prefix (fwd: >> 2(j-s); rev: & mask(2s)) — O(log k)
        # combine steps instead of k per-base passes
        L2 = Lmax + kmax
        fwd = c.copy()
        rev = c ^ np.uint64(3)
        width = 1
        while width < kmax:
            s = min(width, kmax - width)
            # W_s is a prefix of the current width-wide window
            pf = fwd if s == width else (fwd >> np.uint64(2 * (width - s)))
            pr = rev if s == width else (rev & np.uint64((1 << (2 * s)) - 1))
            nf = fwd << np.uint64(2 * s)  # fresh buffers: pf/pr view the old
            nf[:, : L2 - width] |= pf[:, width:]
            nr = rev.copy()
            nr[:, : L2 - width] |= pr[:, width:] << np.uint64(2 * width)
            fwd, rev = nf, nr
            width += s
        P = Lmax
        fwd = fwd[:, :P]
        rev = rev[:, :P]

        out = []
        for k in self.opts.k_list:
            if Lmax - k + 1 <= 0:
                continue
            # k-mer at p = first k bases of the kmax window at p
            fk = fwd >> np.uint64(2 * (kmax - k))
            rk = rev & np.uint64((1 << (2 * k)) - 1)
            can = np.minimum(fk, rk)
            wv = (cs[:, k : k + P] - cs[:, :P]) == k
            # the (row << 2k | kmer) tag must fit u64: for large k, process
            # the row axis in chunks small enough for the remaining tag bits
            # (k=26 -> 4096 rows/chunk; 2k >= 64 -> one read at a time,
            # tag = bare k-mer)
            max_rows = max(1 << max(64 - 2 * k, 0), 1)
            for base in range(0, N, max_rows):
                n_rows = min(max_rows, N - base)
                canc = can[base : base + n_rows]
                wvc = wv[base : base + n_rows]
                if 2 * k < 64:
                    row = np.broadcast_to(
                        np.arange(n_rows, dtype=np.uint64)[:, None]
                        << np.uint64(2 * k),
                        canc.shape,
                    )
                    tagged = row | canc
                else:
                    tagged = canc
                uniq = np.unique(tagged[wvc])
                if 2 * k < 64:
                    rows = (uniq >> np.uint64(2 * k)).astype(np.int64) + base
                    kmers = uniq & np.uint64((1 << (2 * k)) - 1)
                else:
                    rows = np.full(uniq.shape, base, np.int64)
                    kmers = uniq
                # rows ascend and tids[rows] is non-decreasing (pending
                # sorted): taxid group boundaries via diff, no sort needed
                t = tids[rows]
                bounds = np.nonzero(np.diff(t))[0] + 1
                starts = np.concatenate([[0], bounds]) if t.size else []
                for st, chunk in zip(starts, np.split(kmers, bounds)):
                    out.append((k, int(t[st]), chunk))
        return out

    # -- output (content_summ.cpp:442-571) ---------------------------------

    def write_summ(self, ofbase: str):
        self._flush()
        tax = self.tax
        opts = self.opts
        seen = set()
        child: dict[int, list[int]] = {}
        for tid in self.clst:
            ptor = tax.path_to_root(tid)
            child_node = tid
            for ptid in ptor:
                if child_node not in seen:
                    seen.add(child_node)
                    child.setdefault(ptid, []).append(child_node)
                child_node = ptid

        with open(ofbase, "w") as ofs:
            ofs.write("Name\tTaxID\tReads\tWReads\n")
            tab_lst: dict[int, str] = {}
            open_lst = [1]
            rank_files: dict[str, object] = {}
            while open_lst:
                tid = open_lst.pop(0)
                chk = tab_lst.get(tid, "") + "\t"
                for ch in child.get(tid, []):
                    tab_lst[ch] = chk
                    open_lst.insert(0, ch)
                tot_read_cnt = self.read_cnts.get(tid, 0)
                wrdc = F(0)
                if tot_read_cnt > 0:
                    wrdc = self.weighted[tid]
                    rank = tax.rank.get(tid, "")
                    if rank != "no_rank":
                        if is_plasmid(tid, opts.low_num_plasmids):
                            rank = "plasmid"
                        kos = None
                        if rank in rank_files:
                            kos = rank_files[rank]
                        else:
                            # reference bug: the newly created stream shadows
                            # the outer variable, so the first taxid of each
                            # rank opens the file but writes nothing
                            rank_files[rank] = open(f"{ofbase}.{rank}_kmer_cov", "w")
                        if kos is not None and tot_read_cnt > 1:
                            self._comp_kmer_cov(tid, kos)
                name = tax.names.get(tid, "")
                ofs.write(
                    f"{tab_lst.get(tid, '')}{name}\t{tid}\t{tot_read_cnt}\t{fmt_float(wrdc)}\n"
                )
            for fobj in rank_files.values():
                fobj.close()

    def _comp_kmer_cov(self, tid: int, ofs):
        import numpy as np

        for k in self.opts.k_list:
            chunks = self.kmer_track[k].get(tid, [])
            # host chunks are bare per-read-distinct k-mer arrays (weight 1
            # each); device chunks are (kmers, read-counts) pairs — merge to
            # per-k-mer totals either way
            kms, wts = [], []
            for c in chunks:
                if isinstance(c, tuple):
                    kms.append(c[0])
                    wts.append(c[1])
                else:
                    kms.append(c)
                    wts.append(np.ones(len(c), np.int64))
            arr = np.concatenate(kms) if kms else np.zeros(0, np.uint64)
            w = np.concatenate(wts) if wts else np.zeros(0, np.int64)
            order = np.argsort(arr, kind="stable")
            sa, sw = arr[order], w[order]
            bounds = np.nonzero(np.diff(sa))[0] + 1
            counts = (
                np.add.reduceat(sw, np.concatenate([[0], bounds]))
                if sa.size
                else np.zeros(0, np.int64)
            )
            kmer_cnt = int(counts.shape[0])
            kcnt_sum = int(counts.sum())
            cnt_vals, cnt_freq = np.unique(counts, return_counts=True)
            ofs.write(
                f"taxid={tid} distinct_kmer_cnt={kmer_cnt} k_size={k} "
                f"tot_kmer_cnt={kcnt_sum}\n"
            )
            for cnt, freq in zip(cnt_vals.tolist(), cnt_freq.tolist()):
                ofs.write(f"{tid} {k} {cnt} {freq}\n")
