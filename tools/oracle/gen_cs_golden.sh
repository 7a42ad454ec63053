#!/bin/bash
# Golden content_summ outputs (requires gen_golden.sh to have run).
set -euo pipefail
FIX=$(cd "${1:?fixture dir}" && pwd)
ORACLE=${2:-/tmp/lmat_oracle}
BIN=$ORACLE/bin
WORK=$FIX/work

echo "$WORK/rl_nonull0.out" > "$WORK"/cs_input.flst
rm -f "$WORK"/cs_out.summ*
LD_PRELOAD=$ORACLE/efence.so "$BIN"/content_summ -c "$FIX"/taxtree.dat -l "$WORK"/rl_nonull.0.30.fastsummary \
    -k 8,10,12,14,17 -f "$WORK"/cs_input.flst -r "$FIX"/ranks.dat \
    -a plasmid,species,genus -o "$WORK"/cs_out.summ > "$WORK"/content_summ.log 2>&1
echo "content_summ goldens:"
ls "$WORK" | grep cs_out
