#!/bin/bash
# Produce native SortedDb PERM `.db` images with the oracle's make_db_table
# for the permdb importer tests (tests/test_permdb.py).  The images are ~1-4
# GB heap files, so they live under /tmp and are regenerated on demand rather
# than committed; tests skip when absent.
#
# Usage: gen_perm_golden.sh <fixture_dir> [workdir]
set -euo pipefail

FIX=$(cd "${1:?fixture dir}" && pwd)
PT=${2:-/tmp/permtest}
HERE=$(cd "$(dirname "$0")" && pwd)
mkdir -p "$PT"

# three oracle variants: default k=20/32-bit, 18-mer geometry, 16-bit tids
[ -x /tmp/lmat_oracle/bin/make_db_table ] || "$HERE"/build_oracle.sh /tmp/lmat_oracle
[ -x /tmp/lmat_oracle18/bin/make_db_table ] || IDX_CONFIG=1827 "$HERE"/build_oracle.sh /tmp/lmat_oracle18
[ -x /tmp/lmat_oracle16/bin/make_db_table ] || TID_SIZE=16 "$HERE"/build_oracle.sh /tmp/lmat_oracle16

rm -f "$PT"/fixture.db "$PT"/fixture18.db "$PT"/fixture16.db
/tmp/lmat_oracle/bin/make_db_table -k 20 -i "$FIX"/work/taxhisto.bin \
    -o "$PT"/fixture.db -s 4 > "$PT"/mdb20.log 2>&1
/tmp/lmat_oracle18/bin/make_db_table -k 18 -i "$FIX"/work/taxhisto18.bin \
    -o "$PT"/fixture18.db -s 4 > "$PT"/mdb18.log 2>&1
# 16-bit: -f converts ids through the 32->16 map at build time
/tmp/lmat_oracle16/bin/make_db_table -k 20 -i "$FIX"/work/taxhisto.bin \
    -f "$FIX"/m32to16.map -o "$PT"/fixture16.db -s 4 > "$PT"/mdb16.log 2>&1

ls -la "$PT"/*.db
