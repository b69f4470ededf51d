#!/usr/bin/env bash
# Demo inference preset (parity: reference scripts/infer_geo4d.sh —
# seed 123, 5-step DDIM, eta 0, cfg 1.0, uniform_trailing,
# guidance_rescale 0.7, 16-frame windows, stride 4).
# Usage: bash scripts/infer_geo4d.sh <video.mp4> [savedir] [ckpt] [vae_ckpt]
set -euo pipefail
VIDEO=${1:?usage: infer_geo4d.sh <video.mp4> [savedir] [ckpt] [vae]}
SAVEDIR=${2:-results}
CKPT=${3:-checkpoints/geo4d/model.ckpt}
VAE=${4:-checkpoints/geo4d/vae.ckpt}
ARGS=(--video_path "$VIDEO" --savedir "$SAVEDIR"
      --seed 123 --ddim_steps 5 --ddim_eta 0.0
      --unconditional_guidance_scale 1.0
      --timestep_spacing uniform_trailing --guidance_rescale 0.7
      --video_length 16 --stride 4 --height 320 --width 512)
[ -f "$CKPT" ] && ARGS+=(--ckpt_path "$CKPT")
[ -f "$VAE" ] && ARGS+=(--vae_path "$VAE")
python -m geo4d_tpu.cli.infer "${ARGS[@]}"
