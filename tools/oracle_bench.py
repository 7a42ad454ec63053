#!/usr/bin/env python3
"""Apples-to-apples CPU baseline for BASELINE.md.

Runs the oracle-built reference ``read_label`` (tools/oracle/build_oracle.sh)
on EXACTLY the synthetic DB and reads that bench.py measures the TPU pipeline
with: same 4M-kmer index (exported as a native SortedDb PERM image via
io.permdb.save_perm_db), same taxonomy, same reads.

The measurement host matters: this box has few cores, so the headline
32-core number is reported as measured-per-core x 32 (linear-scaling upper
bound for the reference's embarrassingly parallel OpenMP read loop,
read_label.cpp:1637-1756).  Both raw and extrapolated numbers are printed.

Usage: python tools/oracle_bench.py [--oracle /tmp/lmat_oracle]
       [--outdir /tmp/oracle_bench] [--reads 102400] [--threads 1 2]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def write_tax_files(tax, outdir):
    """Write the LMAT runtime-input files (tree/depth/ranks/rank-ids) for the
    bench taxonomy (format: TaxNode.hpp:131-147 / run_rl.sh -e/-w/-u)."""
    tids = sorted(tax.parent)
    with open(os.path.join(outdir, "taxtree.dat"), "w") as f:
        f.write("#bench taxonomy\n#LMAT tree format\n")
        f.write(f"{len(tids)}\n")
        for t in tids:
            kids = sorted(tax.children.get(t, ()))
            ks = " ".join(map(str, kids))
            f.write(f"{t} {len(kids)} {ks}{' ' if kids else ''}{tax.parent[t]}\n")
            f.write(f"{tax.names.get(t, f'node{t}')}\n")
    with open(os.path.join(outdir, "depth.dat"), "w") as f:
        for t in tids:
            f.write(f"{t} {tax.depth.get(t, 0)}\n")
    with open(os.path.join(outdir, "ranks.dat"), "w") as f:
        for t in tids:
            f.write(f"{t} {tax.rank.get(t, 'no_rank')}\n")
    with open(os.path.join(outdir, "taxids.info"), "w") as f:
        for t in tids:
            r = tax.rank.get(t, "no_rank").replace("no_rank", "no rank")
            f.write(
                f"ktaxid={t},rank={r},taxid={t}\t{r},{tax.names.get(t, f'node{t}')}\n"
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--oracle", default="/tmp/lmat_oracle")
    ap.add_argument("--outdir", default="/tmp/oracle_bench")
    ap.add_argument("--reads", type=int, default=102_400)
    ap.add_argument("--threads", type=int, nargs="+", default=[1, 2])
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # export path needs no TPU
    os.makedirs(args.outdir, exist_ok=True)

    import numpy as np

    import bench
    from lmat_tpu.io.permdb import save_perm_db

    print("building synthetic taxonomy + 4M-kmer index ...", file=sys.stderr)
    tax, leaves = bench.build_taxonomy()
    idx, kmers, groups = bench.build_index(tax, leaves)
    write_tax_files(tax, args.outdir)

    db = os.path.join(args.outdir, "bench.db")
    if not os.path.exists(db):
        t0 = time.time()
        save_perm_db(idx, db)
        print(f"exported PERM image in {time.time() - t0:.1f}s", file=sys.stderr)

    reads_fa = os.path.join(args.outdir, "reads.fa")
    if not os.path.exists(reads_fa):
        rng = np.random.default_rng(99)
        n_b = args.reads // bench.B
        with open(reads_fa, "w") as f:
            for _ in range(n_b):
                for hdr, seq in bench.make_reads(kmers, groups, rng, bench.B):
                    f.write(f">{hdr}\n{seq}\n")
        print(f"wrote {n_b * bench.B} reads", file=sys.stderr)

    n_reads = sum(1 for line in open(reads_fa) if line.startswith(">"))
    results = {}
    for t in args.threads:
        out = os.path.join(args.outdir, f"rl_t{t}")
        cmd = [
            os.path.join(args.oracle, "bin", "read_label"),
            "-e", os.path.join(args.outdir, "depth.dat"),
            "-c", os.path.join(args.outdir, "taxtree.dat"),
            "-d", db, "-i", reads_fa, "-t", str(t),
            "-p", "-x", "0", "-j", "30", "-l", "0", "-b", "1.0",
            "-u", os.path.join(args.outdir, "taxids.info"),
            "-w", os.path.join(args.outdir, "ranks.dat"),
            "-o", out,
        ]
        t0 = time.time()
        r = subprocess.run(cmd, capture_output=True, text=True)
        dt = time.time() - t0
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"oracle read_label -t {t} failed")
        rps = n_reads / dt
        results[t] = {"wall_s": round(dt, 2), "reads_per_sec": round(rps, 1)}
        print(f"t={t}: {n_reads} reads in {dt:.1f}s = {rps:.0f} reads/s",
              file=sys.stderr)

    per_core = max(v["reads_per_sec"] for v in results.values())
    print(json.dumps({
        "metric": "oracle_reads_per_sec",
        "n_reads": n_reads,
        "per_thread": results,
        "per_core_best": per_core,
        "x32_linear_upper_bound": round(per_core * 32, 0),
    }))


if __name__ == "__main__":
    main()
