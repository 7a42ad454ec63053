#!/bin/bash
# Golden outputs for the reporting scripts (tolineage.py, fsreport.py) by
# running the reference's own pure-python scripts under python3.
set -euo pipefail
FIX=$(cd "${1:?fixture dir}" && pwd)
REF=/root/reference
WORK=$FIX/work

# fsreport resolves hard-coded filenames under $LMAT_DIR
LMATDIR=$FIX/lmatdir
mkdir -p "$LMATDIR"
cp "$FIX"/taxtree.dat "$LMATDIR"/ncbi_taxonomy.segment.pruned.dat.nohl
cp "$FIX"/ranks.dat "$LMATDIR"/ncbi_taxid_to_rank.pruned.txt
cp "$FIX"/low_numid_plasmids.txt "$LMATDIR"/
cp "$FIX"/plasmid.names.txt "$LMATDIR"/

FS=$WORK/rl_nonull.0.30.fastsummary

# tolineage: min_reads=10, min_avg=0 (run_rl.sh:248-251)
python3 "$REF"/bin/tolineage.py "$FIX"/taxids.info "$FS" "$WORK"/rl_nonull.lineage 10 0 \
    > "$WORK"/tolineage.log 2>&1

# fsreport without gene file (run_rl.sh:252)
rm -rf "$WORK"/fsreport && mkdir -p "$WORK"/fsreport
LMAT_DIR=$LMATDIR python3 "$REF"/bin/fsreport.py "$FS" plasmid,species,genus \
    "$WORK"/fsreport > "$WORK"/fsreport.log 2>&1

# fsreport with gene summary (run_gl.sh:163-165): sorted genesummary
sort -k1gr,1gr "$WORK"/gl_out.0.1.20.genesummary.min_tax_score.0 > "$WORK"/gl_sorted.genesummary
rm -rf "$WORK"/fsreport_genes && mkdir -p "$WORK"/fsreport_genes
LMAT_DIR=$LMATDIR python3 "$REF"/bin/fsreport.py "$FS" plasmid,species,genus \
    "$WORK"/fsreport_genes "$WORK"/gl_sorted.genesummary 10 > "$WORK"/fsreport_genes.log 2>&1

echo "report goldens:"
ls "$WORK"/fsreport "$WORK"/fsreport_genes; head -2 "$WORK"/rl_nonull.lineage
