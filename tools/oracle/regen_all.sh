#!/bin/bash
# Regenerate the fixture and every golden output in dependency order.
set -euo pipefail
HERE=$(cd "$(dirname "$0")" && pwd)
FIX=${1:-/root/repo/tests/fixtures/golden_small}

python3 "$HERE"/make_fixture.py "$FIX"
python3 "$HERE"/make_null_fixture.py "$FIX"
"$HERE"/gen_golden.sh "$FIX"
"$HERE"/gen_gene_golden.sh "$FIX"
"$HERE"/gen_cs_golden.sh "$FIX"
"$HERE"/gen_report_golden.sh "$FIX"

# content_summ ordered tables (reference summary.py is plain python3)
WORK=$FIX/work
python3 /root/reference/bin/summary.py "$WORK"/cs_out.summ "$FIX"/ranks.dat \
    "$WORK"/rl_nonull.0.30.fastsummary "$FIX"/low_numid_plasmids.txt \
    "$WORK"/cs_ordered plasmid,species,genus > "$WORK"/summary.log

# pruning / feed / edge-case goldens
ORACLE=${ORACLE:-/tmp/lmat_oracle}
RL="LD_PRELOAD=$ORACLE/efence.so $ORACLE/bin/read_label -e $FIX/depth.dat \
  -c $FIX/taxtree.dat -i $FIX/reads.fa -t 1 -p -x 0 -j 30 -l 0 -b 1.0 \
  -u $FIX/taxids.info -w $FIX/ranks.dat"
eval "$RL -d $WORK/fixture.db -g 2 -m $FIX/numeric_ranks -o $WORK/rl_prune" \
    > "$WORK"/rl_prune.log 2>&1

rm -f "$WORK"/feed.db
"$ORACLE"/bin/make_db_table -k 20 -i "$WORK"/taxhisto.bin -o "$WORK"/feed.db -s 4 \
    -j "$FIX"/human_kmers.txt -c "$(wc -l < "$FIX"/human_kmers.txt)" \
    -u "$FIX"/adaptor_kmers.txt > "$WORK"/make_db_feed.log 2>&1
eval "$RL -d $WORK/feed.db -o $WORK/rl_feed" > "$WORK"/rl_feed.log 2>&1

python3 "$HERE"/make_edge_fixture.py "$FIX"
eval "LD_PRELOAD=$ORACLE/efence.so $ORACLE/bin/read_label -e $FIX/depth.dat \
  -c $FIX/taxtree.dat -d $WORK/fixture.db -i $FIX/edge_reads.fa -t 1 -p -x 0 \
  -j 30 -l 0 -b 1.0 -u $FIX/taxids.info -w $FIX/ranks.dat -o $WORK/rl_edge" \
    > "$WORK"/rl_edge.log 2>&1
eval "LD_PRELOAD=$ORACLE/efence.so $ORACLE/bin/read_label -e $FIX/depth.dat \
  -c $FIX/taxtree.dat -d $WORK/fixture.db -i $FIX/edge_reads.fq -q -t 1 -p -x 0 \
  -j 30 -l 0 -b 1.0 -u $FIX/taxids.info -w $FIX/ranks.dat -o $WORK/rl_edgefq" \
    > "$WORK"/rl_edgefq.log 2>&1

# 18-mer geometry golden: the reference needs an IDX_CONFIG=1827 build
# (9-bit suffix blocks) for 18-mer SortedDb lookups; output files are
# geometry-independent so they compare against our SUF_BITS=20 layout.
O18=/tmp/lmat_oracle18
if [ ! -x "$O18/bin/read_label" ]; then
    IDX_CONFIG=1827 "$HERE"/build_oracle.sh "$O18"
fi
"$O18"/bin/kmerPrefixCounter -k 18 -l 0 -f 0 -i "$FIX"/genomes.fa \
    -o "$WORK"/k18mers > "$WORK"/k18.log 2>&1
"$O18"/bin/tax_histo -f 32 -t "$FIX"/taxtree.dat -d "$WORK"/k18mers.0 \
    -o "$WORK"/taxhisto18.bin >> "$WORK"/k18.log 2>&1
"$O18"/bin/make_db_table -k 18 -i "$WORK"/taxhisto18.bin -o "$WORK"/fixture18.db \
    -s 4 >> "$WORK"/k18.log 2>&1
"$O18"/bin/read_label -e "$FIX"/depth.dat -c "$FIX"/taxtree.dat \
    -d "$WORK"/fixture18.db -i "$FIX"/reads.fa -t 1 -p -x 0 -j 30 -l 0 -b 1.0 \
    -u "$FIX"/taxids.info -w "$FIX"/ranks.dat -k 18 -o "$WORK"/rl_k18 \
    > "$WORK"/rl_k18.log 2>&1
rm -f "$WORK"/k18mers.0 "$WORK"/fixture18.db

# native PERM .db images for the importer tests (kept outside the repo)
"$HERE"/gen_perm_golden.sh "$FIX"

echo "regen complete"
