#!/bin/bash
# Build the gene k-mer DB and golden gene_label outputs with the oracle.
# Requires gen_golden.sh to have produced work/rl_nonull0.out first.
set -euo pipefail

FIX=$(cd "${1:?fixture dir}" && pwd)
ORACLE=${2:-/tmp/lmat_oracle}
BIN=$ORACLE/bin
WORK=$FIX/work
K=20

python3 "$(dirname "$0")"/make_gene_fixture.py "$FIX"

# gene DB: kmerPrefixCounter output ingested directly (-h = not tax_histo)
"$BIN"/kmerPrefixCounter -k $K -l 0 -f 0 -i "$FIX"/genes.fa -o "$WORK"/genekmers \
    > "$WORK"/gkpc.log 2>&1
rm -f "$WORK"/gene.db
"$BIN"/make_db_table -h -k $K -i "$WORK"/genekmers.0 -o "$WORK"/gene.db -s 4 \
    > "$WORK"/gene_db.log 2>&1

# input list: the classified read file(s)
echo "$WORK/rl_nonull0.out" > "$WORK"/gl_input.flst

"$BIN"/gene_label -b 0 -q 20 -x 0.1 -p -l "$WORK"/gl_input.flst \
    -d "$WORK"/gene.db -o "$WORK"/gl_out -g "$FIX"/gene_names.txt.gz \
    > "$WORK"/gene_label.log 2>&1

echo "gene goldens:"
ls "$WORK" | grep -E "gl_out|genesummary"
