#!/usr/bin/env bash
# Download evaluation datasets + published checkpoints.
#
# Usage: bash scripts/download_data.sh <target> [root_dir]
#   eval targets:     ckpt | sintel | bonn | kitti | tum | scannet | davis | nyuv2 | all
#   training targets: spring | tartanair | pointodyssey | dynamic_replica |
#                     waymo | scannetv2 | train_all
#
# Counterpart of the reference's data/download_*.sh + download_ckpt.sh +
# download_training_zipfiles.txt (same public endpoints; ensure you hold the
# datasets' licenses). Training sets feed geo4d_tpu.data.preprocess_train.
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

# ---------------- training sets (ref data/download_*.sh) ----------------

dl_spring() {
    # ref data/download_spring.sh: public Google Drive folder, zips inside
    mkdir -p spring && \
    gdown --folder \
      "https://drive.google.com/drive/folders/1oJqS7YOqtgO6l4WI_fdCZ-Jvp2RUvHZz" \
      -O spring
    ( cd spring
      find . -name "*.zip" -exec unzip -o -q {} \; -exec rm {} \;
      # flatten the nested spring/spring layout the archive unpacks to
      if [ -d spring ]; then mv spring/* . && rmdir spring; fi )
}

dl_tartanair() {
    # ref data/download_tartanair.sh: left-camera RGB + depth, Hard only,
    # fetched from the TartanAir project's public Cloudflare-R2 bucket
    mkdir -p tartanair
    python "$(dirname "${BASH_SOURCE[0]}")/download_tartanair.py" \
        --output-dir tartanair --rgb --depth --only-left --only-hard
    find tartanair -type f -name "*.zip" -print0 | \
    while IFS= read -r -d '' z; do
        unzip -o -q "$z" -d "$(dirname "$z")" && rm "$z"
    done
}

dl_pointodyssey() {
    # ref data/download_pointodyssey.sh: three gdrive tarballs (train/test/sample)
    mkdir -p point_odyssey && cd point_odyssey
    for id in 1ivaHRZV6iwxxH4qk8IAIyrOF9jrppDIP \
              1jn8l28BBNw9f9wYFmd5WOCERH48-GsgB \
              1dnl9XMImdwKX2KcZCTuVDhcy5h8qzQIO; do
        gdown --id "$id"
    done
    find . -name "*.tar.gz" -exec tar -zxf {} \; -exec rm {} \;
    cd ..
}

dl_dynamic_replica() {
    # ref data/download_dynamic_replica.sh: 86 train shards; the right-eye
    # directories are dropped (the pipeline is monocular)
    mkdir -p dynamic_replica && cd dynamic_replica
    for i in $(seq -w 000 085); do
        f="train_${i}.zip"
        wget -q "https://dl.fbaipublicfiles.com/dynamic_replica_v2/train/${f}"
        unzip -o -q "$f" && rm "$f"
        find . -maxdepth 1 -type d -name '*right' -exec rm -rf {} +
        echo ">> dynamic_replica shard $i done"
    done
    if [ -f frame_annotations_train.jgz ]; then
        mv frame_annotations_train.jgz frame_annotations_train.gz
        gunzip frame_annotations_train.gz
        mv frame_annotations_train frame_annotations_train.json
    fi
    cd ..
}

dl_waymo() {
    # ref data/download_waymo.sh: raw tfrecords (gsutil; needs Waymo ToS
    # acceptance) + the DUSt3R pair list; extraction is the documented
    # external-SDK step (geo4d_tpu.data.preprocess_train waymo_*).
    mkdir -p waymo && cd waymo
    gsutil -m cp -r gs://waymo_open_dataset_v_1_4_2/individual_files/training/ . || \
        echo ">> gsutil failed: accept the Waymo ToS + authenticate first"
    wget --no-proxy https://download.europe.naverlabs.com/ComputerVision/DUSt3R/waymo_pairs.npz
    cd ..
}

dl_scannetv2() {
    # ref data/download_scannetv2.sh: scenes 0707-0806 .sens streams,
    # exported with the streaming reader then deleted
    mkdir -p scannetv2 && cd scannetv2
    for i in $(seq 707 806); do
        s="scene0${i}_00"
        wget -q "http://kaldir.vc.in.tum.de/scannet/v2/scans/${s}/${s}.sens" || {
            echo ">> $s download failed (ScanNet ToS signup required)"; continue; }
        python -m geo4d_tpu.data.sens_reader \
            --filename "${s}.sens" --output_path "$s"
        rm -f "${s}.sens"
    done
    cd ..
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
    spring) dl_spring ;;
    tartanair) dl_tartanair ;;
    pointodyssey) dl_pointodyssey ;;
    dynamic_replica) dl_dynamic_replica ;;
    waymo) dl_waymo ;;
    scannetv2) dl_scannetv2 ;;
    train_all) dl_spring; dl_tartanair; dl_pointodyssey; dl_dynamic_replica; dl_waymo; dl_scannetv2 ;;
    *) echo "unknown target: $TARGET" >&2; exit 1 ;;
esac
echo ">> done: $TARGET -> $ROOT"
