#!/bin/bash
# Drive the oracle (reference binaries built by build_oracle.sh) over the
# synthetic fixture to produce golden outputs for bit-identical testing.
#
# Usage: gen_golden.sh <fixture_dir> [oracle_dir]
set -euo pipefail

FIX=$(cd "${1:?fixture dir}" && pwd)
ORACLE=${2:-/tmp/lmat_oracle}
BIN=$ORACLE/bin
WORK=$FIX/work
mkdir -p "$WORK"

K=20

# 1. extract k-mers (single shard: prefix length 0)
"$BIN"/kmerPrefixCounter -k $K -l 0 -f 0 -i "$FIX"/genomes.fa -o "$WORK"/kmers \
    > "$WORK"/kpc.log 2>&1
# output: $WORK/kmers.0

# 2. LCA collapse
"$BIN"/tax_histo -f 32 -t "$FIX"/taxtree.dat -d "$WORK"/kmers.0 \
    -o "$WORK"/taxhisto.bin > "$WORK"/tax_histo.log 2>&1

# 3. build the mmap DB (1 GB reservation is plenty)
rm -f "$WORK"/fixture.db
"$BIN"/make_db_table -k $K -i "$WORK"/taxhisto.bin -o "$WORK"/fixture.db -s 4 \
    > "$WORK"/make_db.log 2>&1

# 4. classify (single thread => deterministic single .out0)
RL_FLAGS="-e $FIX/depth.dat -c $FIX/taxtree.dat -d $WORK/fixture.db \
  -i $FIX/reads.fa -t 1 -p -x 0 -j 30 -l 0 -b 1.0 \
  -u $FIX/taxids.info -w $FIX/ranks.dat"

# 4a. without null models (score = label_prob)
"$BIN"/read_label $RL_FLAGS -o "$WORK"/rl_nonull > "$WORK"/rl_nonull.log 2>&1

# 4b. with null models, if they exist (see gen_null.sh)
if [ -f "$FIX"/null_lst.txt ]; then
    # guard-page allocator: the reference has a latent wild-free that can
    # corrupt later allocations under the stock allocator (slow but safe;
    # needs a raised vm.max_map_count)
    sysctl -w vm.max_map_count=8000000 >/dev/null 2>&1 || true
    LMAT_DIR=$FIX LD_PRELOAD=$ORACLE/efence.so "$BIN"/read_label $RL_FLAGS \
        -n "$FIX"/null_lst.txt -o "$WORK"/rl_null > "$WORK"/rl_null.log 2>&1
fi

echo "golden outputs in $WORK"
ls -la "$WORK" | grep -v log
