"""CLI driver for classification — host-index version.

Produces the same files as the reference run:
  <ofbase>0.out                       per-read lines
  <ofbase>.<min_score>.<min_kmer>.fastsummary
  <ofbase>.<min_score>.<min_kmer>.nomatchsum
"""

from __future__ import annotations

import argparse
import os

from ..core.index import KmerIndex
from ..core.taxonomy import Taxonomy
from ..io.cppfmt import fmt_float
from ..io.fasta import iter_reads_lmat
from .read_label_host import Classifier, ScoreOptions


def run(args) -> Classifier:
    tax = Taxonomy.from_lmat_file(args.tax_tree)
    tax.load_depth_file(args.depth)
    if args.rank_file:
        tax.load_rank_file(args.rank_file)
    if os.path.isdir(args.db):
        index = KmerIndex.load(args.db)
    else:
        # native SortedDb PERM image (run_rl.sh -d on a published .db file);
        # -f conv map resolves 16-bit compacted ids back to 32-bit
        from ..io.permdb import load_conv_map, load_perm_db

        cm_path = getattr(args, "conv_map", None)
        cm = load_conv_map(cm_path) if cm_path else None
        index = load_perm_db(args.db, conv_map=cm)
    null = None
    if args.null_list:
        from ..core.nullmodel import NullModel

        null = NullModel.load(args.null_list, lmat_dir=args.lmat_dir)
    opts = ScoreOptions(
        min_score=args.min_score,
        min_kmer=args.min_kmer,
        diff_thresh=args.sdiff,
        diff_thresh2=args.hbias,
        prn_all=True,
        permissive=getattr(args, "permissive", False),
    )
    mode = getattr(args, "mode", "exact") or "exact"
    dist = getattr(args, "distributed", None)
    if dist and mode != "fast":
        # exact mode under --distributed: fast mode initializes the runtime
        # inside _make_fast; do it here too so jax.process_count()/index()
        # below see the real topology and every process classifies only its
        # own input shard (instead of N duplicate writers on one path)
        from ..parallel.multihost import init_distributed

        coord, nproc, pid = dist.rsplit(",", 2)
        init_distributed(coord, int(nproc), int(pid))
    if mode == "fast":
        clf = _make_fast(tax, index, args, null)
        # graceful overflow degrade: reads whose candidate set exceeds the
        # device table reroute through the exact host path (which has no
        # cap, like the reference — read_label.cpp:693-726)
        clf.set_fallback(Classifier(tax, index, opts, null_model=null))
    else:
        clf = Classifier(tax, index, opts, null_model=null)
    n_shards = getattr(args, "shards", 1) or 1
    shard_id = getattr(args, "shard_id", 0) or 0
    if getattr(args, "distributed", None):
        # per-host outputs: the reference's per-thread .out files one level
        # up; summaries merge via `report merge-fastsummary`
        import jax

        n_shards = jax.process_count()
        shard_id = jax.process_index()
    base = f"{args.output}.{fmt_float(args.min_score) if args.min_score else '0'}.{args.min_kmer}"
    if n_shards > 1:
        # per-shard summaries; combine with `lmat-tpu report merge-fastsummary`
        base += f".shard{shard_id}"
    out_file = f"{args.output}{shard_id}.out"
    if (
        not getattr(args, "overwrite", False)
        and os.path.exists(out_file)
        and os.path.exists(base + ".fastsummary")
    ):
        # run_rl.sh --overwrite guard: restart skips completed shards
        print(f"skip existing {out_file} (use --overwrite to redo)")
        return clf
    n = 0
    with open(out_file, "w") as f:
        if mode == "fast":
            n = _run_fast(clf, args, f, n_shards, shard_id)
        else:
            for i, (hdr, seq) in enumerate(iter_reads_lmat(args.reads, fastq=args.fastq)):
                if n_shards > 1 and i % n_shards != shard_id:
                    continue
                if not hdr:
                    hdr = f"unknown_hdr:{i + 1}"
                line = clf.classify(hdr, seq)
                # reference quirk: reads rejected inside construct_labels leave
                # the header/read prefix without a newline (read_label.cpp:727-733)
                f.write(line if line.endswith("\t") else line + "\n")
                n += 1
    clf.write_fastsummary(base + ".fastsummary", args.rank_ids)
    clf.write_nomatchsum(base + ".nomatchsum")
    print(f"classified {n} reads -> {out_file}")
    return clf


def _make_fast(tax, index, args, null):
    """Device (TPU) classifier — the batched jitted pipeline.  With --mesh
    "data,db" the k-mer table is sharded over the db axis and queries route
    via all_to_all (multi-chip mode)."""
    from .read_label_fast import FastClassifier
    from .read_label_score_device import DeviceScorer, DeviceScorerConfig

    cfg = DeviceScorerConfig(
        max_candidates=getattr(args, "max_candidates", 0) or 128,
        min_kmer=args.min_kmer,
        diff_thresh=args.sdiff,
        diff_thresh2=args.hbias,
        permissive=getattr(args, "permissive", False),
    )
    mesh_spec = getattr(args, "mesh", None)
    dist = getattr(args, "distributed", None)
    if dist:
        # multi-host: "coordinator:port,num_processes,process_id"; --mesh
        # gives the GLOBAL (data, db) shape over all processes' devices
        from ..parallel.multihost import (
            init_distributed,
            make_global_mesh,
            make_multihost_classifier,
        )

        coord, nproc, pid = dist.rsplit(",", 2)
        init_distributed(coord, int(nproc), int(pid))
        data, db = (int(x) for x in (mesh_spec or "0,0").split(","))
        if not data:
            import jax

            db = len(jax.local_devices())
            data = len(jax.devices()) // db
        mesh = make_global_mesh(data, db)
        maxlen = 1
        for _, seq in iter_reads_lmat(args.reads, fastq=args.fastq):
            maxlen = max(maxlen, len(seq))
        read_len = 128
        while read_len < maxlen:
            read_len *= 2
        _, clf = make_multihost_classifier(
            mesh, index, tax, cfg, null_model=null, k=index.k,
            min_score=args.min_score, batch=getattr(args, "batch", 0) or 512,
            read_len=read_len, layout=getattr(args, "layout", "auto") or "auto",
        )
        return clf
    if mesh_spec:
        from ..parallel.mesh import make_mesh
        from .read_label_sharded import make_sharded_classifier

        data, db = (int(x) for x in mesh_spec.split(","))
        mesh = make_mesh(data=data, db=db)
        # fixed [B, L] step shape: size L to the longest read in the input
        maxlen = 1
        for _, seq in iter_reads_lmat(args.reads, fastq=args.fastq):
            maxlen = max(maxlen, len(seq))
        read_len = 128
        while read_len < maxlen:
            read_len *= 2
        _, clf = make_sharded_classifier(
            mesh, index, tax, cfg, null_model=null, k=index.k,
            min_score=args.min_score, batch=getattr(args, "batch", 0) or 512,
            read_len=read_len, layout=getattr(args, "layout", "auto") or "auto",
        )
        return clf
    scorer = DeviceScorer(tax, cfg, null_model=null)
    dev = scorer.remap_index_tids(index).to_device(
        layout=getattr(args, "layout", "auto") or "auto"
    )
    return FastClassifier(dev, scorer, k=index.k, min_score=args.min_score,
                          dedup_frac=getattr(args, "dedup", None) or None)


def _run_fast(clf, args, f, n_shards, shard_id) -> int:
    """Stream reads through the device pipeline in fixed-row batches with
    per-batch ladder pad lengths (bounded compiled shapes, bounded memory —
    the input file is never loaded whole).  The Python FASTA parser streams
    at ~1.5M reads/s, well above the device pipeline."""
    import jax
    from concurrent.futures import ThreadPoolExecutor

    from ..io.native_writer import native_available

    B = getattr(args, "batch", 0) or 512

    def ladder(n_bases: int) -> int:
        """Pad length from a doubling ladder: keeps input order and bounds
        the number of compiled step shapes, without letting one long read
        (contig) pad every batch to the global max."""
        L = 128
        while L < n_bases:
            L *= 2
        return L

    multihost = getattr(clf, "is_multihost", False)
    B_rows = clf.local_rows if multihost else B

    def gen_batches():
        if multihost:
            # every process walks the same stream and keeps its contiguous
            # row-block of each global batch; EVERY global batch must yield
            # on every process (possibly an empty local block) because all
            # processes must execute the same jitted steps in lockstep
            per = clf.local_rows
            lo, hi = shard_id * per, (shard_id + 1) * per
            buf, r = [], -1
            for i, (hdr, seq) in enumerate(iter_reads_lmat(args.reads, fastq=args.fastq)):
                r = i % B
                if r == 0 and i > 0:
                    yield buf
                    buf = []
                if lo <= r < hi:
                    buf.append((hdr or f"unknown_hdr:{i + 1}", seq))
            if r >= 0:
                yield buf
            return
        long_thr = getattr(clf, "LONG_READ_THRESHOLD", 0) or 0
        buf = []
        for i, (hdr, seq) in enumerate(iter_reads_lmat(args.reads, fastq=args.fastq)):
            if n_shards > 1 and i % n_shards != shard_id:
                continue
            if not hdr:
                hdr = f"unknown_hdr:{i + 1}"
            if long_thr and len(seq) > long_thr:
                # contig: flush the short-read buffer (order!) then emit a
                # long-read marker for the position-axis chunked path
                if buf:
                    yield buf
                    buf = []
                yield ("long", hdr, seq)
                continue
            buf.append((hdr, seq))
            if len(buf) == B:
                yield buf
                buf = []
        if buf:
            yield buf

    use_native = native_available()
    sink = getattr(f, "buffer", f) if use_native else None
    n = 0
    # three overlapped stages (see FastClassifier.classify_stream): dispatch,
    # threaded result fetch, host formatting (the tail batch is padded with
    # empty reads, which never reach the formatter or the summaries)
    with ThreadPoolExecutor(max_workers=1) as pool:
        fetch = None
        done = False
        it = gen_batches()
        while not done or fetch is not None:
            nxt = None
            if not done:
                b = next(it, None)
                if b is None:
                    done = True
                elif isinstance(b, tuple) and b and b[0] == "long":
                    # contig: drain the in-flight batch first (file order),
                    # then classify through the position-axis chunked path
                    if fetch is not None:
                        p_b, fut = fetch
                        data = clf.format_native(p_b, fut.result()) if use_native else None
                        if data is not None:
                            sink.write(data)
                        else:
                            lines = clf._format(p_b, fut.result())
                            text = "".join(l if l.endswith("\t") else l + "\n" for l in lines)
                            (sink.write(text.encode()) if use_native else f.write(text))
                        n += len(p_b)
                        fetch = None
                    line = clf.long_read_line(b[1], b[2])
                    line = line if line.endswith("\t") else line + "\n"
                    # write through the active channel: text writes to f and
                    # binary writes to its .buffer must not interleave
                    if use_native:
                        sink.write(line.encode())
                    else:
                        f.write(line)
                    n += 1
                    continue
                else:
                    pad_to = ladder(max((len(s) for _, s in b), default=128))
                    dev_out = clf.step(clf.pad(b, pad_to=pad_to, fixed_rows=B_rows))
                    nxt = (b, pool.submit(clf._fetch, dev_out))
            if fetch is not None:
                p_b, fut = fetch
                data = clf.format_native(p_b, fut.result()) if use_native else None
                if data is not None:
                    sink.write(data)
                else:
                    # format_native returns None when the native formatter
                    # can't handle this batch (or the batch has overflow
                    # reads) — Python path; bytes go through the SAME channel
                    # as the native writes so buffers never interleave
                    lines = clf._format(p_b, fut.result())
                    text = "".join(l if l.endswith("\t") else l + "\n" for l in lines)
                    (sink.write(text.encode()) if use_native else f.write(text))
                n += len(p_b)
            fetch = nxt
    return n


def main(argv=None):
    ap = argparse.ArgumentParser(description="lmat_tpu read_label (host)")
    ap.add_argument("-d", "--db", required=True)
    ap.add_argument("-i", "--reads", required=True)
    ap.add_argument("-c", "--tax-tree", required=True)
    ap.add_argument("-e", "--depth", required=True)
    ap.add_argument("-w", "--rank-file", default=None)
    ap.add_argument("-u", "--rank-ids", required=True)
    ap.add_argument("-n", "--null-list", default=None)
    ap.add_argument("--lmat-dir", default=None)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-x", "--min-score", type=float, default=0.0)
    ap.add_argument("-j", "--min-kmer", type=int, default=30)
    ap.add_argument("-b", "--sdiff", type=float, default=1.0)
    ap.add_argument("-l", "--hbias", type=float, default=0.0)
    ap.add_argument("-q", "--fastq", action="store_true")
    ap.add_argument("-s", "--permissive", action="store_true")
    ap.add_argument("--mode", choices=("exact", "fast"), default="exact")
    ap.add_argument("--mesh", default=None, help='"data,db" multi-chip mesh for fast mode')
    ap.add_argument(
        "--distributed", default=None,
        help='multi-host: "coordinator:port,num_processes,process_id" '
             '(launch one process per host; --mesh is the GLOBAL shape)',
    )
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--max-candidates", type=int, default=128)
    ap.add_argument("--shards", type=int, default=1, help="round-robin input sharding")
    ap.add_argument("--shard-id", type=int, default=0)
    ap.add_argument("--overwrite", action="store_true")
    run(ap.parse_args(argv))


if __name__ == "__main__":
    main()
