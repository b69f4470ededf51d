#!/usr/bin/env bash
# Benchmark evaluation preset (parity: reference scripts/eval_geo4d.sh).
# Usage: bash scripts/eval_geo4d.sh <dataset> <data_root> [savedir] [ckpt] [vae]
set -euo pipefail
DATASET=${1:?usage: eval_geo4d.sh <dataset> <data_root> [savedir] [ckpt] [vae]}
DATA_ROOT=${2:?need data_root}
SAVEDIR=${3:-eval_results/$DATASET}
CKPT=${4:-checkpoints/geo4d/model.ckpt}
VAE=${5:-checkpoints/geo4d/vae.ckpt}
ARGS=(--dataset "$DATASET" --data_root "$DATA_ROOT" --savedir "$SAVEDIR"
      --seed 123 --ddim_steps 5 --ddim_eta 0.0
      --unconditional_guidance_scale 1.0
      --timestep_spacing uniform_trailing --guidance_rescale 0.7
      --video_length 16 --stride 4 --n_iter 500)
[ -f "$CKPT" ] && ARGS+=(--ckpt_path "$CKPT")
[ -f "$VAE" ] && ARGS+=(--vae_path "$VAE")
python -m geo4d_tpu.cli.evaluate "${ARGS[@]}"
