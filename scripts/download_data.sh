#!/usr/bin/env bash
# Download evaluation datasets + published checkpoints.
#
# Usage: bash scripts/download_data.sh <target> [root_dir]
#   targets: ckpt | sintel | bonn | kitti | tum | scannet | davis | nyuv2 | all
#
# Counterpart of the reference's data/download_*.sh + download_ckpt.sh
# (same public endpoints; ensure you hold the datasets' licenses).
# After downloading, build the eval subsets with geo4d_tpu.data.preprocess:
#   python -c "from geo4d_tpu.data.preprocess import prepare_bonn; prepare_bonn('data/bonn')"
# (see data/evaluation_script.md for the full per-dataset walkthrough).
set -euo pipefail

TARGET="${1:?usage: download_data.sh <ckpt|sintel|bonn|kitti|tum|scannet|davis|nyuv2|all> [root]}"
ROOT="${2:-data}"
mkdir -p "$ROOT"
cd "$ROOT"

fetch_unzip_all() {  # unzip every archive in cwd, then delete the zips
    find . -maxdepth 1 -name "*.zip" -exec unzip -o -q {} \; -exec rm {} \;
}

dl_ckpt() {
    mkdir -p checkpoints
    # main diffusion ckpt + fine-tuned pointmap VAE (Google Drive ids from
    # the reference README.md:29-30 / data/download_ckpt.sh)
    gdown --fuzzy "https://drive.google.com/file/d/1Z1jO_JmfZj0z3bgMvCwqfUhyZ1bIbc9E/view?usp=sharing" -O checkpoints/
    echo ">> convert with: python -m geo4d_tpu.cli.infer --ckpt_path checkpoints/<name>.ckpt ..."
}

dl_sintel() {
    mkdir -p sintel && cd sintel
    wget --no-proxy http://files.is.tue.mpg.de/sintel/MPI-Sintel-training_images.zip
    wget --no-proxy http://files.is.tue.mpg.de/jwulff/sintel/MPI-Sintel-depth-training-20150305.zip
    wget --no-proxy http://files.is.tue.mpg.de/sintel/MPI-Sintel-training_extras.zip
    fetch_unzip_all
    cd ..
}

dl_bonn() {
    mkdir -p bonn && cd bonn
    wget https://www.ipb.uni-bonn.de/html/projects/rgbd_dynamic2019/rgbd_bonn_dataset.zip
    fetch_unzip_all
    cd ..
}

dl_kitti() {
    mkdir -p kitti && cd kitti
    wget https://s3.eu-central-1.amazonaws.com/avg-kitti/data_depth_selection.zip
    wget https://s3.eu-central-1.amazonaws.com/avg-kitti/data_depth_annotated.zip
    fetch_unzip_all
    cd ..
}

dl_tum() {
    mkdir -p tum && cd tum
    for seq in freiburg3_sitting_static freiburg3_sitting_xyz \
               freiburg3_sitting_halfsphere freiburg3_sitting_rpy \
               freiburg3_walking_static freiburg3_walking_xyz \
               freiburg3_walking_halfsphere freiburg3_walking_rpy; do
        wget "https://cvg.cit.tum.de/rgbd/dataset/freiburg3/rgbd_dataset_${seq}.tgz"
        tar -xzf "rgbd_dataset_${seq}.tgz" && rm "rgbd_dataset_${seq}.tgz"
    done
    cd ..
}

dl_scannet() {
    echo "ScanNet requires accepting the terms of use:"
    echo "  http://www.scan-net.org/ (run their download script, v2)"
    echo "then extract with geo4d_tpu.data.preprocess.prepare_scannet"
}

dl_davis() {
    mkdir -p davis && cd davis
    wget https://data.vision.ee.ethz.ch/csergi/share/davis/DAVIS-2017-trainval-480p.zip
    fetch_unzip_all
    cd ..
}

dl_nyuv2() {
    mkdir -p nyu-v2/val && cd nyu-v2/val
    # official labeled val split repackaged as h5 (densedepth distribution)
    wget http://horatio.cs.nyu.edu/mit/silberman/nyu_depth_v2/nyu_depth_v2_labeled.mat || \
        echo ">> if the official mirror is down, any nyu_depth_v2 val .h5 dump works"
    cd ../..
}

case "$TARGET" in
    ckpt) dl_ckpt ;;
    sintel) dl_sintel ;;
    bonn) dl_bonn ;;
    kitti) dl_kitti ;;
    tum) dl_tum ;;
    scannet) dl_scannet ;;
    davis) dl_davis ;;
    nyuv2) dl_nyuv2 ;;
    all) dl_ckpt; dl_sintel; dl_bonn; dl_kitti; dl_tum; dl_davis; dl_nyuv2 ;;
    *) echo "unknown target: $TARGET" >&2; exit 1 ;;
esac
echo ">> done: $TARGET -> $ROOT"
