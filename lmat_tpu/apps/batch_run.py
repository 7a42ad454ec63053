"""Multi-sample pipeline launcher — the generic capability behind the
reference's pyLMAT site launchers.

pyLMAT_rl/gl/cs (/root/reference/Supplementary_Tools/pyLMAT/pyLMAT_rl.py:
111-144 and siblings) walk a directory of sample files and invoke
run_rl.sh / run_gl.sh / run_cs.sh per sample with per-sample output
directories.  Those scripts hard-code LLNL paths, module loads and SLURM
conventions; this port keeps the capability (one command fans the full
pipeline out over N samples, one output directory per sample, restartable)
and drops the site specifics.

Samples come from a directory scan (every FASTA/FASTQ under --path, the
pyLMAT convention) or an explicit sample sheet (``name<TAB>reads_path``
rows).
"""

from __future__ import annotations

import argparse
import os

_SEQ_EXT = (".fa", ".fna", ".fasta", ".fq", ".fastq", ".fa.gz", ".fna.gz",
            ".fasta.gz", ".fq.gz", ".fastq.gz")


def discover_samples(path: str):
    """[(sample_name, reads_path)] — directory walk (pyLMAT_rl.py:111-114:
    every file under the tree, named by its extension-less basename) or a
    ``name\treads`` sample sheet when ``path`` is a file."""
    if os.path.isfile(path):
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split("\t")
                if len(parts) == 1:
                    parts = [os.path.splitext(os.path.basename(parts[0]))[0],
                             parts[0]]
                out.append((parts[0], parts[1]))
        return out
    out = []
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if fn.lower().endswith(_SEQ_EXT):
                name = fn
                for ext in _SEQ_EXT:
                    if name.lower().endswith(ext):
                        name = name[: -len(ext)]
                        break
                out.append((name, os.path.join(root, fn)))
    return out


def batch_run(args) -> list[tuple[str, str]]:
    """Run the run-rl pipeline (and optional second passes) per sample.

    Returns [(sample, outdir)].  Per-sample outputs land in
    ``<odir>/<sample>/`` (the pyLMAT outdir-per-sample layout); an existing
    completed fastsummary skips the sample unless --overwrite (run_rl.sh's
    restart guard, one level up)."""
    from ..cli.main import cmd_gene_label, cmd_run_rl

    if args.gene_db and not args.gene_table:
        # the standalone gene-label command rejects this at argparse time;
        # fail here too instead of after the expensive classify pass
        raise SystemExit("--gene-db requires --gene-table")
    samples = discover_samples(args.path)
    if not samples:
        raise SystemExit(f"no samples found under {args.path}")
    names = [n for n, _ in samples]
    if len(set(names)) != len(names):
        dups = sorted({n for n in names if names.count(n) > 1})
        raise SystemExit(
            "duplicate sample names from different directories would share "
            f"one outdir (and the restart guard would silently skip the "
            f"later ones): {', '.join(dups)} — use a sample sheet with "
            "unique names"
        )
    done = []
    for name, reads in samples:
        outdir = os.path.join(args.odir, name)
        os.makedirs(outdir, exist_ok=True)
        qname = os.path.basename(reads)
        dbname = os.path.basename(args.db.rstrip("/"))
        ms = args.min_score if args.min_score else "0"
        fastsum = os.path.join(
            outdir,
            f"{qname}.{dbname}.lo.rl_output.{ms}.{args.min_read_kmer}"
            ".fastsummary",
        )
        if os.path.exists(fastsum) and not args.overwrite:
            print(f"[batch-run] skip {name} (exists: {fastsum})")
            done.append((name, outdir))
            continue
        print(f"[batch-run] {name}: {reads} -> {outdir}")
        ns = argparse.Namespace(
            db=args.db, reads=reads, odir=outdir, min_score=args.min_score,
            min_read_kmer=args.min_read_kmer, sdiff=args.sdiff,
            hbias=args.hbias, nullm=args.nullm, mode=args.mode,
            batch=args.batch, max_candidates=args.max_candidates,
            lmat_dir=args.lmat_dir, tax_tree=args.tax_tree, depth=args.depth,
            rank_file=args.rank_file, rank_ids=args.rank_ids,
        )
        cmd_run_rl(ns)
        if args.gene_db:
            outs = [
                os.path.join(outdir, f)
                for f in sorted(os.listdir(outdir))
                if f.endswith(".out")
            ]
            # thresholds match the standalone gene-label command and
            # run_gl.sh (-x 0.1 gene score, -q 20 gene k-mers — a separate
            # knob from read-label's min_read_kmer — max_tids 32), so
            # batch-run and the manual two-step flow produce identical
            # gene summaries
            gns = argparse.Namespace(
                inputs=outs, db=args.gene_db, gene_table=args.gene_table,
                output=os.path.join(outdir, qname + ".gl"),
                min_score=0.1, min_kmer=20,
                min_tax_score=args.min_score, k=20, max_tids=32,
                mode=args.mode,
            )
            cmd_gene_label(gns)
        done.append((name, outdir))
    return done
