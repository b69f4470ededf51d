#!/usr/bin/env bash
# Build the native components of geo4d_tpu.
#
#   ./build.sh              release build (portable flags)
#   ./build.sh --sanitize   ASAN+UBSAN instrumented build (for the fuzz-ish
#                           corruption tests; SURVEY.md §5 sanitizer item)
set -euo pipefail
cd "$(dirname "$0")"

CXXFLAGS="-O3 -fPIC -shared -std=c++17"
SUFFIX=""
if [[ "${1:-}" == "--sanitize" ]]; then
    # -O1 keeps stack traces honest; no -march flags in either mode so the
    # artifact is portable across build hosts
    CXXFLAGS="-O1 -g -fPIC -shared -std=c++17 \
        -fsanitize=address,undefined -fno-omit-frame-pointer"
    SUFFIX=".asan"
fi

g++ $CXXFLAGS \
    video_decoder.cpp \
    -o "libgeo4d_video${SUFFIX}.so" \
    $(pkg-config --cflags --libs libavformat libavcodec libavutil libswscale)
echo "built native/libgeo4d_video${SUFFIX}.so"

g++ $CXXFLAGS \
    mesh_raster.cpp \
    -o "libgeo4d_raster${SUFFIX}.so"
echo "built native/libgeo4d_raster${SUFFIX}.so"
