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

echo "regen complete"
