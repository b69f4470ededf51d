#!/usr/bin/env bash
# ASAN/UBSAN pass over the native components (SURVEY.md §5): compiles the
# decoder + rasterizer sources together with sanitize_harness.cpp into one
# instrumented binary and runs the corruption/degenerate-input cases.
#
# Usage: native/sanitize_check.sh [valid_video.mp4]
#   With a video argument the decoder truncation/bit-flip cases run too;
#   without one only the static corruption + rasterizer cases run.
set -euo pipefail
cd "$(dirname "$0")"

g++ -O1 -g -std=c++17 -fsanitize=address,undefined -fno-omit-frame-pointer \
    -fno-sanitize-recover=all \
    sanitize_harness.cpp video_decoder.cpp mesh_raster.cpp \
    -o sanitize_harness \
    $(pkg-config --cflags --libs libavformat libavcodec libavutil libswscale)

./sanitize_harness "${1:-}"
