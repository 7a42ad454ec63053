"""lmat-tpu command line.

Subcommands mirror the reference's binaries and pipeline scripts
(bin/run_rl.sh, run_gl.sh, run_cs.sh): a runtime-input directory (--lmat-dir,
or $LMAT_DIR) anchors the taxonomy/depth/rank/null-model files using the same
naming conventions, and output files follow the reference layout so the
downstream tooling interoperates.
"""

from __future__ import annotations

import argparse
import os
import sys


def _lmat_dir(args):
    d = args.lmat_dir or os.environ.get("LMAT_DIR")
    if not d:
        sys.exit("set --lmat-dir or $LMAT_DIR")
    return d


def _load_runtime(args):
    """Resolve the runtime-input bundle (run_rl.sh:50-58 conventions, with
    fallbacks to generic names)."""
    from ..core.taxonomy import Taxonomy

    d = _lmat_dir(args)

    def find(*names):
        for n in names:
            p = os.path.join(d, n)
            if os.path.exists(p):
                return p
        return None

    tree = args.tax_tree or find(
        "ncbi_taxonomy.segment.pruned.dat.nohl", "taxtree.dat"
    )
    depth = args.depth or find("depth_for_ncbi_taxonomy.segment.pruned.dat", "depth.dat")
    rank = args.rank_file or find("ncbi_taxid_to_rank.pruned.txt", "ranks.dat")
    rank_ids = args.rank_ids or find("ncbi_taxonomy_rank.segment.pruned.txt", "taxids.info")
    tax = Taxonomy.from_lmat_file(tree)
    if depth:
        tax.load_depth_file(depth)
    if rank:
        tax.load_rank_file(rank)
    conv = find("m9.32To16.map", "m32to16.map")
    return tax, {"tree": tree, "depth": depth, "rank": rank, "rank_ids": rank_ids,
                 "conv": conv, "dir": d}


def cmd_make_db(args):
    from ..apps import make_db
    from ..core.taxonomy import Taxonomy

    if args.tax_histo:
        idx = make_db.build_from_tax_histo(args.inputs, k=args.k, max_tids=args.max_tids)
    else:
        tax = Taxonomy.from_lmat_file(args.tax_tree)
        idx = make_db.build_native(
            args.inputs[0], tax, k=args.k, max_tids=args.max_tids,
            tid_cutoff=args.tid_cutoff,
        )
    idx.save(args.output)
    print(f"db: {idx.n_kmers} k-mers -> {args.output}")


def cmd_read_label(args):
    from ..apps.run_read_label import run as rl_run

    rl_run(args)


def cmd_run_rl(args):
    """Pipeline step 1 (run_rl.sh): classify + lineage + rank reports."""
    from ..apps.run_read_label import run as rl_run
    from ..reporting.fsreport import TaxFiles, fsreport
    from ..reporting.tolineage import tolineage

    tax, files = _load_runtime(args)
    qname = os.path.basename(args.reads)
    dbname = os.path.basename(args.db.rstrip("/"))
    rlofile = os.path.join(args.odir, f"{qname}.{dbname}.lo.rl_output")
    ns = argparse.Namespace(
        db=args.db, reads=args.reads, tax_tree=files["tree"], depth=files["depth"],
        rank_file=files["rank"], rank_ids=files["rank_ids"],
        null_list=args.nullm, lmat_dir=files["dir"], output=rlofile,
        min_score=args.min_score, min_kmer=args.min_read_kmer,
        sdiff=args.sdiff, hbias=args.hbias, fastq=args.reads.endswith((".fq", ".fastq")),
        mode=args.mode, batch=args.batch, max_candidates=args.max_candidates,
        conv_map=None if os.path.isdir(args.db) else files["conv"],
    )
    rl_run(ns)
    fastsum = f"{rlofile}.{args.min_score if args.min_score else '0'}.{args.min_read_kmer}.fastsummary"
    tolineage(files["rank_ids"], fastsum, fastsum + ".lineage", 10, 0.0)
    d = files["dir"]
    tf = TaxFiles(
        files["tree"], files["rank"],
        os.path.join(d, "low_numid_plasmids.txt"),
        os.path.join(d, "plasmid.names.txt"),
    )
    fsreport(fastsum, "plasmid,species,genus", args.odir, tf)
    print(f"pipeline outputs at {rlofile}*")


def cmd_batch_run(args):
    from ..apps.batch_run import batch_run

    done = batch_run(args)
    print(f"batch-run complete: {len(done)} samples under {args.odir}")


def cmd_gene_label(args):
    from ..apps.gene_label import GeneLabeler, GeneLabelOptions
    from ..apps.make_db import build_from_kpc
    from ..core.index import KmerIndex

    if os.path.isdir(args.db):
        gidx = KmerIndex.load(args.db)
    else:
        gidx = build_from_kpc(args.db, k=args.k, max_tids=args.max_tids)
    gl = GeneLabeler(
        gidx,
        GeneLabelOptions(
            min_score=args.min_score, min_kmer=args.min_kmer,
            min_tax_score=args.min_tax_score, k=args.k,
        ),
    )
    gl.run_files(args.inputs, args.output, device=args.mode == "fast")
    gl.write_summaries(args.gene_table, args.output)
    print(f"gene summaries at {args.output}*")


def cmd_content_summ(args):
    from ..apps.content_summ import ContentSummarizer, ContentSummOptions

    tax, files = _load_runtime(args)
    k_list = tuple(int(x) for x in args.k_list.split(","))
    cs = ContentSummarizer(
        tax, ContentSummOptions(
            k_list=k_list, rank_check=tuple(args.ranks.split(",")),
            device=getattr(args, "device", False),
        ),
    )
    cs.load_fastsummary(args.fastsummary)
    for p in args.inputs:
        cs.process_out_file(p)
    cs.write_summ(args.output)
    from ..reporting.summary import Summary

    d = files["dir"]
    plas = os.path.join(d, "low_numid_plasmids.txt")
    if os.path.exists(plas) and files["rank"]:
        s = Summary(files["rank"], args.fastsummary, plas)
        s.run(args.output, args.output + ".ordered", args.ranks)
    print(f"content summary at {args.output}*")


def cmd_rand_read_label(args):
    from ..apps.make_db import build_from_tax_histo
    from ..apps.rand_read_label import RandReadLabeler
    from ..core.index import KmerIndex

    tax, files = _load_runtime(args)
    idx = KmerIndex.load(args.db)
    rrl = RandReadLabeler(tax, idx, device=args.mode == "fast",
                          batch=args.batch, max_candidates=args.max_candidates)
    rrl.run(num_reads=args.num_reads, read_len=args.read_len, seed=args.seed)
    rrl.write_rand_lst(args.output + ".rand_lst")
    print(f"null observations at {args.output}.rand_lst")


def cmd_report(args):
    """Reporting/rescore utilities over classifier outputs."""
    t = args.tool
    if t == "losummary":
        from ..reporting.losummary import losummary, read_rank_lineages

        lineages = read_rank_lineages(args.rank_ids or _load_runtime(args)[1]["rank_ids"])
        for f in args.inputs:
            losummary(f, lineages, args.min_score, args.min_kmer)
            print(f"rescored {f}")
    elif t == "gsummary":
        from ..reporting.gsummary import gsummary

        gsummary(args.inputs, args.min_score, args.min_kmer, args.output)
        print(f"gene re-bin -> {args.output}")
    elif t == "pull-reads":
        from ..reporting.pull_reads import pull_reads

        for f in args.inputs:
            pull_reads(f, args.id_file, args.min_score, args.min_kmer, args.output)
        print(f"pulled reads under {args.output}")
    elif t == "merge-fastsummary":
        from ..reporting.multi_table import merge_fastsummary

        merge_fastsummary(args.inputs, args.output)
        print(f"merged fastsummary -> {args.output}")
    elif t == "multi-table":
        from ..reporting.multi_table import multi_table

        samples = []
        for spec in args.inputs:
            name, path, total = spec.split(":")
            samples.append((name, path, int(total)))
        multi_table(samples, args.output, min_score=args.min_score)
        print(f"multi-sample table -> {args.output}")
    elif t == "biom":
        from ..reporting.biom import fastsummary_to_biom

        samples = []
        for spec in args.inputs:
            name, path = spec.split(":")[:2]
            samples.append((name, path))
        fastsummary_to_biom(samples, args.output)
        print(f"BIOM table -> {args.output}")
    elif t == "phyloseq":
        from ..reporting.phyloseq import phyloseq_tables, species_file_samples

        if all(":" in spec for spec in args.inputs):
            samples = [tuple(spec.split(":")[:2]) for spec in args.inputs]
        else:
            samples = species_file_samples(args.inputs)
        tax = None
        if args.tax_tree:
            from ..core.taxonomy import Taxonomy

            tax = Taxonomy.from_lmat_file(args.tax_tree)
            if args.rank_file:
                tax.load_rank_file(args.rank_file)
        paths = phyloseq_tables(samples, args.output, threshold=args.min_score,
                                taxonomy=tax)
        print("phyloseq tables -> " + ", ".join(paths))
    elif t == "pull-reads-fq":
        from ..reporting.pull_reads import pull_reads_fq_pipeline

        out = pull_reads_fq_pipeline(
            args.inputs, args.id_file, args.fastq_file, args.min_score,
            args.min_kmer, args.output,
        )
        print(f"pulled FASTQ records -> {out}")
    elif t == "html":
        from ..reporting.html_report import report_html

        report_html(args.inputs[0], args.inputs[1], args.output)
        print(f"HTML report -> {args.output}")
    elif t == "tolineage":
        from ..reporting.tolineage import tolineage

        rank_ids = args.rank_ids or _load_runtime(args)[1]["rank_ids"]
        tolineage(rank_ids, args.inputs[0], args.output, 10, 0.0)
        print(f"lineage table -> {args.output}")


def cmd_gen_null_model(args):
    """Null-model pipeline (bin/gen_rand_mod.sh): loop read lengths, score
    random GC-binned reads, roll up sparse taxids (merge_cnts), emit the
    null_lst.txt index."""
    import gzip as _gzip
    import shutil

    from ..apps.frequency_counter import count_tax_histo
    from ..apps.null_model_gen import merge_cnts, write_null_lst
    from ..apps.rand_read_label import RandReadLabeler
    from ..core.index import KmerIndex

    tax, files = _load_runtime(args)
    idx = KmerIndex.load(args.db)
    if args.read_len:
        beg = end = args.read_len
        step = 100
    else:
        beg, end, step = (int(x) for x in args.read_range.split(":"))
    os.makedirs(args.odir, exist_ok=True)
    dbname = os.path.basename(args.db.rstrip("/"))
    kcnt = count_tax_histo(args.tax_histo_cnt) if args.tax_histo_cnt else None
    entries = []
    rl = beg
    while rl <= end:
        num_reads = max(1, args.num_bases // rl)
        rrl = RandReadLabeler(tax, idx, device=args.mode == "fast",
                              batch=args.batch,
                              max_candidates=args.max_candidates)
        rrl.run(num_reads=num_reads, read_len=rl, seed=args.seed)
        oname = f"{dbname}.{rl}.{args.num_bases}.rl_output"
        raw = os.path.join(args.odir, oname + ".rand_lst")
        rrl.write_rand_lst(raw)
        merged = os.path.join(args.odir, f"null.bin.{args.bins}.{oname}.rand_lst")
        merge_cnts(raw, tax, files["rank"], args.min_sample_size, kcnt,
                   merged, args.bins)
        with open(merged, "rb") as fin, _gzip.open(merged + ".gz", "wb") as fout:
            shutil.copyfileobj(fin, fout)
        os.remove(merged)
        entries.append((rl, os.path.basename(merged) + ".gz"))
        print(f"read_len {rl}: {num_reads} reads -> {merged}.gz")
        rl += step
    lst = write_null_lst(args.odir, entries, k=idx.k)
    print(f"null model index at {lst}")


def cmd_get_db(args):
    from ..apps import get_db

    if args.list:
        for name, desc, size in get_db.list_catalog():
            print(f"{name:28s} {size:>9s}  {desc}")
        return
    if not args.name:
        import sys

        sys.exit("--name required (or --list)")
    if args.dtype == "inputs":
        d = get_db.fetch_inputs(args.name, args.outdir)
        print(f"runtime inputs at {d}; set LMAT_DIR={d}")
    else:
        get_db.fetch(args.name, args.outdir)


def cmd_db_prep(args):
    from ..apps import db_prep
    from ..core.taxonomy import Taxonomy

    t = args.tool
    if t == "taxid-list":
        n = db_prep.tid16_get_32bit_taxids(args.inputs[0], args.output)
        print(f"{n} taxids -> {args.output}")
    elif t == "tid16-map":
        tax = Taxonomy.from_lmat_file(args.tax_tree)
        mp = db_prep.tid16_mapping(args.inputs[0], tax, args.output)
        print(f"{len(mp)} ids -> {args.output}")
    elif t == "numeric-ranks":
        db_prep.build_numeric_rank_table(args.inputs[0], args.output)
        print(f"rank table -> {args.output}")
    elif t == "gi-numbers":
        out = db_prep.get_gi_numbers(args.inputs[0], args.output)
        print(f"GIs -> {out}")
    elif t == "header-table":
        int_p, gi_tab, tid_tab, miss = db_prep.build_header_table(
            args.inputs[0], args.gi_map, args.output
        )
        print(f"{int_p} ({miss} headers without taxid)")
    elif t == "combine-fast":
        db_prep.combine_fast(args.inputs, args.output)
        print(f"combined -> {args.output}")
    elif t == "combine-counts":
        db_prep.combine_counts(args.inputs, args.output)
        print(f"combined -> {args.output}")
    elif t == "species-map":
        tax = Taxonomy.from_lmat_file(args.tax_tree)
        if args.rank_file:
            tax.load_rank_file(args.rank_file)
        db_prep.write_map(db_prep.species_level_map(tax), args.output)
        print(f"species map -> {args.output}")
    elif t == "merge-pairs":
        db_prep.merge_paired_reads(args.inputs[0], args.inputs[1], args.output)
        print(f"merged -> {args.output}")


def _enable_compile_cache():
    """Persist compiled XLA programs across CLI invocations.  Cold compiles
    over a remote device link run minutes per program shape; the cache makes
    every later invocation with the same shapes start in seconds."""
    try:
        import jax

        cache = os.environ.get(
            "LMAT_TPU_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "lmat_tpu", "jax"),
        )
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def main(argv=None):
    _enable_compile_cache()
    ap = argparse.ArgumentParser(prog="lmat-tpu")
    ap.add_argument("--lmat-dir", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("make-db", help="build a k-mer index")
    p.add_argument("-i", "--inputs", nargs="+", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-k", type=int, default=20)
    p.add_argument("--tax-tree")
    p.add_argument("--tax-histo", action="store_true", help="inputs are tax_histo binaries")
    p.add_argument("--max-tids", type=int, default=16)
    p.add_argument("--tid-cutoff", type=int, default=0)
    p.set_defaults(fn=cmd_make_db)

    p = sub.add_parser("read-label", help="classify reads")
    p.add_argument("-d", "--db", required=True)
    p.add_argument("-i", "--reads", required=True)
    p.add_argument("-c", "--tax-tree", required=True)
    p.add_argument("-e", "--depth", required=True)
    p.add_argument("-w", "--rank-file")
    p.add_argument("-u", "--rank-ids", required=True)
    p.add_argument("-n", "--null-list")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-x", "--min-score", type=float, default=0.0)
    p.add_argument("-j", "--min-kmer", type=int, default=30)
    p.add_argument("-b", "--sdiff", type=float, default=1.0)
    p.add_argument("-l", "--hbias", type=float, default=0.0)
    p.add_argument("-q", "--fastq", action="store_true")
    p.add_argument("-s", "--permissive", action="store_true",
                   help="register every observed taxid (read_label -s)")
    p.add_argument("--mode", choices=("exact", "fast"), default="exact",
                   help="exact = host epilogue (bit-identical); fast = full "
                        "device scorer (TPU throughput path)")
    p.add_argument("--batch", type=int, default=512, help="fast-mode batch size")
    p.add_argument("--layout", choices=("auto", "fused", "paged", "window"),
                   default="auto",
                   help="device index layout: fused (small DBs, 1 gather), "
                        "paged (capacity speed tier, 2 gathers), window "
                        "(minimum memory)")
    p.add_argument("--dedup", type=float, default=None,
                   help="cross-read k-mer dedup cap as a fraction of batch "
                        "windows (fast mode, single chip).  Wins ~30%% at "
                        "sequencing coverage (reads share k-mers); leave off "
                        "for low-duplication inputs — undersized caps reroute "
                        "whole batches through the exact host path")
    p.add_argument("--mesh", default=None,
                   help='"data,db" device mesh: shard the DB over chips with '
                        "all_to_all query routing (fast mode)")
    p.add_argument("--distributed", default=None,
                   help='multi-host: "coordinator:port,num_processes,process_id"; '
                        "--mesh gives the GLOBAL shape over all hosts")
    p.add_argument("--max-candidates", type=int, default=128)
    p.add_argument("--shards", type=int, default=1)
    p.add_argument("--shard-id", type=int, default=0)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("-f", "--conv-map", default=None,
                   help="32<->16-bit taxid map (run_rl.sh -f) for 16-bit native .db images")
    p.set_defaults(fn=cmd_read_label)

    p = sub.add_parser("run-rl", help="pipeline: classify + reports (run_rl.sh)")
    p.add_argument("--db_file", dest="db", required=True)
    p.add_argument("--query_file", dest="reads", required=True)
    p.add_argument("--odir", default=".")
    p.add_argument("--min_score", dest="min_score", type=float, default=0.0)
    p.add_argument("--min_read_kmer", type=int, default=30)
    p.add_argument("--sdiff", type=float, default=1.0)
    p.add_argument("--hbias", type=float, default=0.0)
    p.add_argument("--nullm", default=None)
    p.add_argument("--mode", choices=("exact", "fast"), default="exact")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--max-candidates", type=int, default=128)
    p.add_argument("--tax-tree"), p.add_argument("--depth")
    p.add_argument("--rank-file"), p.add_argument("--rank-ids")
    p.set_defaults(fn=cmd_run_rl)

    p = sub.add_parser(
        "batch-run",
        help="multi-sample pipeline launcher (pyLMAT_rl/gl capability): "
             "run-rl (+optional gene-label) per sample, one outdir each",
    )
    p.add_argument("--path", required=True,
                   help="directory of FASTA/FASTQ samples, or a sample "
                        "sheet of name<TAB>reads rows")
    p.add_argument("--db_file", dest="db", required=True)
    p.add_argument("--odir", default=".")
    p.add_argument("--min_score", type=float, default=0.0)
    p.add_argument("--min_read_kmer", type=int, default=30)
    p.add_argument("--sdiff", type=float, default=1.0)
    p.add_argument("--hbias", type=float, default=0.0)
    p.add_argument("--nullm", default=None)
    p.add_argument("--mode", choices=("exact", "fast"), default="exact")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--max-candidates", type=int, default=128)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--gene-db", default=None,
                   help="optional gene DB: run the gene_label pass per sample")
    p.add_argument("--gene-table", default=None)
    p.add_argument("--tax-tree"), p.add_argument("--depth")
    p.add_argument("--rank-file"), p.add_argument("--rank-ids")
    p.set_defaults(fn=cmd_batch_run)

    p = sub.add_parser("gene-label", help="gene annotation pass (run_gl.sh)")
    p.add_argument("-l", "--inputs", nargs="+", required=True)
    p.add_argument("-d", "--db", required=True)
    p.add_argument("-g", "--gene-table", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-x", "--min-score", type=float, default=0.1)
    p.add_argument("--mode", choices=("exact", "fast"), default="exact",
                   help="fast = batched device gene-candidate step")
    p.add_argument("-q", "--min-kmer", type=int, default=20)
    p.add_argument("-b", "--min-tax-score", type=float, default=0.0)
    p.add_argument("-k", type=int, default=20)
    p.add_argument("--max-tids", type=int, default=32)
    p.set_defaults(fn=cmd_gene_label)

    p = sub.add_parser("content-summ", help="content summarization (run_cs.sh)")
    p.add_argument("-f", "--inputs", nargs="+", required=True)
    p.add_argument("-l", "--fastsummary", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-k", "--k-list", default="8,10,12,14,17")
    p.add_argument("-a", "--ranks", default="plasmid,species,genus")
    p.add_argument("--tax-tree"), p.add_argument("--depth")
    p.add_argument("--rank-file"), p.add_argument("--rank-ids")
    p.add_argument("--device", action="store_true",
                   help="TPU k-mer counting data plane (host fallback on overflow)")
    p.set_defaults(fn=cmd_content_summ)

    p = sub.add_parser("rand-read-label", help="null model observations")
    p.add_argument("-d", "--db", required=True)
    p.add_argument("-g", "--num-reads", type=int, required=True)
    p.add_argument("-i", "--read-len", type=int, required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mode", choices=("exact", "fast"), default="exact",
                   help="fast = batched device presence pipeline (recommended on TPU)")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--max-candidates", type=int, default=128)
    p.add_argument("--tax-tree"), p.add_argument("--depth")
    p.add_argument("--rank-file"), p.add_argument("--rank-ids")
    p.set_defaults(fn=cmd_rand_read_label)

    p = sub.add_parser("report", help="reporting/rescore utilities")
    p.add_argument("tool", choices=("losummary", "gsummary", "pull-reads",
                                    "pull-reads-fq", "multi-table",
                                    "merge-fastsummary", "biom", "phyloseq",
                                    "html", "tolineage"))
    p.add_argument("-i", "--inputs", nargs="+", required=True,
                   help="input files; multi-table/biom/phyloseq take "
                        "name:path[:total] specs")
    p.add_argument("--fastq-file", default=None,
                   help="pull-reads-fq: the original FASTQ to pull records from")
    p.add_argument("-o", "--output", default=".")
    p.add_argument("-x", "--min-score", type=float, default=0.0)
    p.add_argument("-j", "--min-kmer", type=int, default=30)
    p.add_argument("--id-file", default=None)
    p.add_argument("--tax-tree"), p.add_argument("--depth")
    p.add_argument("--rank-file"), p.add_argument("--rank-ids")
    p.set_defaults(fn=cmd_report)

    p = sub.add_parser("gen-null-model", help="null-model pipeline (gen_rand_mod.sh)")
    p.add_argument("-d", "--db", required=True)
    p.add_argument("--read-len", type=int, default=0)
    p.add_argument("--read-range", default="", help="beg:end:step")
    p.add_argument("--num-bases", type=int, default=10_000_000_000)
    p.add_argument("--min-sample-size", type=int, default=100)
    p.add_argument("--bins", type=int, default=10)
    p.add_argument("--tax-histo-cnt", default=None,
                   help="tax_histo binary for per-taxid k-mer counts")
    p.add_argument("-o", "--odir", default=".")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mode", choices=("exact", "fast"), default="exact")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--max-candidates", type=int, default=128)
    p.add_argument("--tax-tree"), p.add_argument("--depth")
    p.add_argument("--rank-file"), p.add_argument("--rank-ids")
    p.set_defaults(fn=cmd_gen_null_model)

    p = sub.add_parser("get-db", help="download databases/runtime inputs (get_db.sh)")
    p.add_argument("--list", action="store_true")
    p.add_argument("--name", default=None)
    p.add_argument("--dtype", choices=("db", "inputs"), default="db")
    p.add_argument("--outdir", default=".")
    p.set_defaults(fn=cmd_get_db)

    p = sub.add_parser("db-prep", help="DB preparation utilities")
    p.add_argument("tool", choices=(
        "taxid-list", "tid16-map", "numeric-ranks", "gi-numbers",
        "header-table", "combine-fast", "combine-counts", "species-map",
        "merge-pairs"))
    p.add_argument("-i", "--inputs", nargs="+", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--tax-tree"), p.add_argument("--rank-file")
    p.add_argument("--gi-map")
    p.set_defaults(fn=cmd_db_prep)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
