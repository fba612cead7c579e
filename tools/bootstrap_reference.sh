#!/bin/bash
# Builds everything the golden/interop test tiers need from the read-only
# reference mount:
#   /tmp/refbuild/{HipSTR,DenovoFinder,PhasingChecker}  (golden oracles)
#   /tmp/cramgen/{bam2cram,tbxgen,tbxq}                 (htslib interop helpers)
#
# The image has no libbz2, so the COPY's htslib build config is patched to
# drop the bz2 codec (CRAM bz2 blocks are not exercised by any fixture).
# Sources under /root/reference are never modified.
set -euo pipefail

REF=${REF:-/root/reference}
BUILD=${BUILD:-/tmp/refbuild}
REPO=$(cd "$(dirname "$0")/.." && pwd)

if [ ! -x "$BUILD/HipSTR" ]; then
    rm -rf "$BUILD"
    cp -r "$REF" "$BUILD"
    sed -i 's/#define HAVE_LIBBZ2 1//' "$BUILD/lib/htslib/config.h"
    sed -i "s/echo '#define HAVE_LIBBZ2 1' >> \$@/true/" "$BUILD/lib/htslib/Makefile"
    sed -i 's/-lbz2 -llzma/-llzma/' "$BUILD/lib/htslib/Makefile"
    sed -i 's/-llzma -lbz2/-llzma/' "$BUILD/Makefile"
    touch "$BUILD/lib/htslib/config.h"
    make -C "$BUILD" -j"$(nproc)"
    make -C "$BUILD" PhasingChecker
fi

make -C "$REPO/tools/htslib_helpers" HTS="$BUILD/lib/htslib"
echo "reference oracles + interop helpers ready"
