#!/bin/bash
# Build the reference LMAT binaries locally as a validation oracle.
# The reference build normally fetches perm-je and gzstream from the network;
# we substitute local shims (perm_shim.cpp, pallocator.h, gzstream.h).
#
# Usage: build_oracle.sh [outdir]   (default /tmp/lmat_oracle)
set -euo pipefail

REF=/root/reference
OUT=${1:-/tmp/lmat_oracle}
HERE=$(cd "$(dirname "$0")" && pwd)

mkdir -p "$OUT"/include/jemalloc "$OUT"/bin "$OUT"/obj
cp "$HERE"/pallocator.h "$OUT"/include/jemalloc/
cp "$HERE"/gzstream.h "$OUT"/include/

# Generate all_headers.hpp the way the reference CMake does.
{
    echo "#ifndef __KMERDB_ALL_HEADERS__"
    echo "#define __KMERDB_ALL_HEADERS__"
    for hpp in "$REF"/src/kmerdb/*.hpp; do
        echo "#include \"$hpp\""
    done
    echo "#include \"jemalloc/pallocator.h\""
    echo "#endif"
} > "$OUT"/include/all_headers.hpp

CXX=${CXX:-g++}
# IDX_CONFIG=1827 builds the 18-mer geometry; TID_SIZE=16 the compacted-id
# variant (CMakeLists.txt:76-122 equivalents)
IDX_CONFIG=${IDX_CONFIG:-2027}
TID_SIZE=${TID_SIZE:-32}
DBTID_T=uint32_t
[ "$TID_SIZE" = 16 ] && DBTID_T=uint16_t
FLAGS="-O2 -g -fopenmp -std=gnu++17 -Wno-deprecated -DIDX_CONFIG=$IDX_CONFIG \
  -DTID_SIZE=$TID_SIZE -DDBTID_T=$DBTID_T -DUSE_SORTED_DB=1 -DWITH_PJMALLOC=1 \
  -I$OUT/include -I$REF/include -I$REF/src/kmerdb -I$REF/src"

# library objects
for src in SortedDb TaxNode TaxTree Utils KmerFileMetaData; do
    if [ ! -f "$OUT/obj/$src.o" ] || [ "$REF/src/kmerdb/$src.cpp" -nt "$OUT/obj/$src.o" ]; then
        $CXX $FLAGS -c "$REF/src/kmerdb/$src.cpp" -o "$OUT/obj/$src.o"
    fi
done
$CXX $FLAGS -c "$HERE/perm_shim.cpp" -o "$OUT/obj/perm_shim.o"

LIBOBJS="$OUT/obj/SortedDb.o $OUT/obj/TaxNode.o $OUT/obj/TaxTree.o \
  $OUT/obj/Utils.o $OUT/obj/KmerFileMetaData.o $OUT/obj/perm_shim.o"

for app in kmerPrefixCounter tax_histo make_db_table read_label \
    gene_label content_summ rand_read_label frequency_counter partition_fasta; do
    echo "building $app"
    $CXX $FLAGS "$REF/src/$app.cpp" $LIBOBJS -lz -o "$OUT/bin/$app"
done

# guard-page allocator: quarantines every freed chunk so the reference's
# latent wild-free (omp-region teardown) cannot poison later allocations
gcc -shared -fPIC -O1 "$HERE/efence.c" -o "$OUT/efence.so" -ldl

echo "oracle binaries in $OUT/bin"
