#!/usr/bin/env bash
# Build the native components of geo4d_tpu.
set -euo pipefail
cd "$(dirname "$0")"

g++ -O3 -fPIC -shared -std=c++17 \
    video_decoder.cpp \
    -o libgeo4d_video.so \
    $(pkg-config --cflags --libs libavformat libavcodec libavutil libswscale)

echo "built native/libgeo4d_video.so"

g++ -O3 -fPIC -shared -std=c++17 -march=native \
    mesh_raster.cpp \
    -o libgeo4d_raster.so

echo "built native/libgeo4d_raster.so"
