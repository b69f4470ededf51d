"""Benchmark evaluation CLI: dataset -> depth + pose metrics.

Parity target: reference scripts/eval_geo4d.sh + scripts/evaluation/
infer_geo4d.py `run_evaluation` (:314-648): per-sequence sliding-window
inference + alignment, depth eval with GT-resolution resize (kitti: no
max-depth clamp + lad2; others: max 70m + lad2 with point-validity align
mask, :537-540), per-sequence ATE/RPE on the Sintel pose subset (:574),
valid-pixel-weighted metric averaging (:614-622), append-mode error logs
(_error_log*.txt) and time_cost.txt (:640-648).

Usage:
  python -m geo4d_tpu.cli.evaluate --dataset sintel --data_root ./data/sintel \
      --savedir eval_out [--ckpt_path model.ckpt --vae_path vae.ckpt]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="geo4d_tpu benchmark evaluation")
    p.add_argument("--dataset", type=str, required=True,
                   choices=["sintel", "bonn", "kitti", "tum", "scannet", "davis"])
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--config", type=str, default=None,
                   help="reference-layout YAML; drives model + postprocess")
    p.add_argument("--clean_pointcloud", action="store_true")
    p.add_argument("--savedir", type=str, default="eval_results")
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--vae_path", type=str, default=None)
    p.add_argument("--bpe_path", type=str, default=None)
    p.add_argument("--seq_list", type=str, nargs="*", default=None)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--ddim_steps", type=int, default=5)
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--unconditional_guidance_scale", type=float, default=1.0)
    p.add_argument("--timestep_spacing", type=str, default="uniform_trailing")
    p.add_argument("--guidance_rescale", type=float, default=0.7)
    p.add_argument("--stride", type=int, default=4)
    p.add_argument("--video_length", type=int, default=16)
    p.add_argument("--n_iter", type=int, default=500)
    p.add_argument("--window_batch", type=int, default=1)
    p.add_argument("--max_frames", type=int, default=-1)
    p.add_argument("--use_gt_focal", action="store_true")
    p.add_argument("--full_seq", action="store_true")
    p.add_argument("--perframe_ae", action="store_true")  # compat no-op
    p.add_argument("--tiny", action="store_true",
                   help="tiny random model at 96x64 (pipeline smoke test)")
    return p


def resize_depth_to_gt(pred_depth: np.ndarray, gt_hw) -> np.ndarray:
    """Bicubic resize predicted depth to GT resolution (infer_geo4d.py:519-529)."""
    import cv2

    out = np.stack(
        [
            cv2.resize(d, (gt_hw[1], gt_hw[0]), interpolation=cv2.INTER_CUBIC)
            for d in pred_depth
        ]
    )
    return out


def main(argv=None):
    args = get_parser().parse_args(argv)
    from geo4d_tpu.alignment.optimizer import AlignerConfig
    from geo4d_tpu.cli.common import build_model_and_params, prepare_inference_params
    from geo4d_tpu.data.datasets import (
        DATASET_FPS,
        DATASET_RESOLUTION,
        DEFAULT_PROMPT,
        SINTEL_POSE_SEQS,
        list_sequences,
        load_eval_sequence,
    )
    from geo4d_tpu.evals.depth import depth_evaluation
    from geo4d_tpu.evals.trajectory import Trajectory, eval_metrics
    from geo4d_tpu.pipeline.export import save_results_dir, save_time_cost
    from geo4d_tpu.pipeline.inference import InferenceConfig, reconstruct

    w, h = (96, 64) if args.tiny else DATASET_RESOLUTION[args.dataset]
    postprocess = None
    if args.tiny:
        import jax

        from geo4d_tpu.models.presets import init_params, tiny

        model = tiny(temporal_length=args.video_length)
        params = init_params(
            model, jax.random.PRNGKey(args.seed), (h, w),
            temporal_length=args.video_length,
        )
    elif args.config:
        from geo4d_tpu.cli.common import build_model_from_config

        model, params, postprocess = build_model_from_config(
            args.config, args.ckpt_path, args.vae_path, (h, w), args.seed
        )
    else:
        model, params = build_model_and_params(
            args.ckpt_path, args.vae_path, (h, w), args.seed
        )
    params, text_ctx, uncond_text_ctx = prepare_inference_params(
        model, params, DEFAULT_PROMPT, args.bpe_path
    )

    icfg = InferenceConfig(
        window=args.video_length, stride=args.stride,
        ddim_steps=args.ddim_steps, ddim_eta=args.ddim_eta,
        cfg_scale=args.unconditional_guidance_scale,
        timestep_spacing=args.timestep_spacing,
        guidance_rescale=args.guidance_rescale,
        window_batch=args.window_batch,
        sky_eps=0.1,  # eval-path mask eps (infer_geo4d.py:479); demo uses 0.35
    )
    if postprocess is not None:
        from geo4d_tpu.cli.common import aligner_config_from_postprocess

        acfg = aligner_config_from_postprocess(postprocess, n_iter=args.n_iter)
    else:
        acfg = AlignerConfig(n_iter=args.n_iter)

    seqs = args.seq_list or list_sequences(args.dataset, args.data_root)
    os.makedirs(args.savedir, exist_ok=True)
    depth_log = os.path.join(args.savedir, "_error_log_depth.txt")
    pose_log = os.path.join(args.savedir, "_error_log.txt")

    depth_rows = []   # (metrics dict, weight)
    pose_rows = []    # (ate, rpe_t, rpe_r)
    total_time = {"diffusion_s": 0.0, "alignment_s": 0.0, "frames": 0.0}

    for seq in seqs:
        sample = load_eval_sequence(
            args.dataset, args.data_root, seq, max_frames=args.max_frames,
            resolution=(w, h) if args.tiny else None,
        )
        if sample.frames.shape[0] < args.video_length:
            print(f"[eval] skip {seq}: too short")
            continue
        print(f"[eval] {seq}: {sample.frames.shape[0]} frames")
        intr = sample.intrinsics if args.use_gt_focal else None
        # fs conditioning at eval is 24 regardless of dataset fps — the
        # reference passes 24 // sl.step with step=1 (infer_geo4d.py:439)
        scene, preds, timing = reconstruct(
            model, params, sample.frames, text_ctx, fps=24,
            inference_config=icfg, aligner_config=acfg, seed=args.seed,
            intrinsics=intr, uncond_text_ctx=uncond_text_ctx,
        )
        for k in ("diffusion_s", "alignment_s", "frames"):
            total_time[k] += timing[k]
        if args.clean_pointcloud:
            scene.apply_cleanup()
        seq_dir = os.path.join(args.savedir, seq)
        save_results_dir(seq_dir, scene, rgb_frames=sample.frames, save_glb=False)

        # cross-window point-validity mask: AND of every window's sky/far
        # validity at each frame (infer_geo4d.py:422,483 pnt_valid_mask)
        n_frames = sample.frames.shape[0]
        from geo4d_tpu.data.video import sliding_windows

        groups = sliding_windows(n_frames, args.video_length, args.stride)
        valid_np = np.asarray(preds["valid"])  # one fetch (device-resident preds)
        pnt_valid = np.ones((n_frames,) + valid_np.shape[2:], bool)
        for g, idx in enumerate(groups):
            pnt_valid[idx] &= valid_np[g]

        # ---- depth metrics ----
        if sample.gt_depth is not None:
            import cv2

            n = min(len(sample.gt_depth), scene.N)
            gt_hw = sample.gt_depth.shape[1:]
            pred_d = resize_depth_to_gt(scene.get_depthmaps()[:n], gt_hw)
            gt_d = sample.gt_depth[:n]
            if args.dataset == "kitti":
                # kitti: no max-depth clamp, no align mask (infer_geo4d.py:538)
                res, err_map = depth_evaluation(
                    pred_d, gt_d, max_depth=None, align="lad2",
                    return_error_map=True,
                )
            else:
                # others: max 70 m + validity align-mask + lr 1e-2 / 5000
                # iters + post-clip 70 (infer_geo4d.py:535-540)
                amask = np.stack([
                    cv2.resize(m.astype(np.float32), (gt_hw[1], gt_hw[0]),
                               interpolation=cv2.INTER_CUBIC) > 0.8
                    for m in pnt_valid[:n]
                ])
                res, err_map = depth_evaluation(
                    pred_d, gt_d, max_depth=70.0, align="lad2",
                    align_mask=amask, lr=1e-2, max_iters=5000,
                    post_clip_max=70.0, return_error_map=True,
                )
            # per-frame relative-error map PNGs (infer_geo4d.py:541-544)
            for i in range(err_map.shape[0]):
                cv2.imwrite(
                    os.path.join(seq_dir, f"error_{i}.png"),
                    np.clip(err_map[i] * 255, 0, 255).astype(np.uint8),
                )
            depth_rows.append(res)
            with open(depth_log, "a") as f:
                f.write(f"{seq}: {res}\n")
            print(f"[eval] {seq} AbsRel {res['Abs Rel']:.4f} "
                  f"δ<1.25 {res['δ < 1.25']:.4f}")

        # ---- pose metrics ----
        eval_pose = sample.gt_traj is not None and (
            args.dataset != "sintel" or seq in SINTEL_POSE_SEQS
        )
        if eval_pose:
            try:
                pred_traj = Trajectory.from_tum(scene.get_tum_poses())
                gt = Trajectory.from_tum(sample.gt_traj[: scene.N])
                n = min(len(pred_traj.positions), len(gt.positions))
                pred_traj = Trajectory(
                    pred_traj.positions[:n], pred_traj.rotations[:n],
                    pred_traj.timestamps[:n],
                )
                gt = Trajectory(gt.positions[:n], gt.rotations[:n], gt.timestamps[:n])
                ate, rpe_t, rpe_r = eval_metrics(pred_traj, gt)
                # per-sequence trajectory plot (infer_geo4d.py:587)
                try:
                    from geo4d_tpu.evals.plots import plot_trajectory

                    plot_trajectory(
                        os.path.join(args.savedir, f"{seq}.png"),
                        pred_traj, gt, title=seq,
                    )
                except Exception as e:
                    print(f"[eval] trajectory plot failed for {seq}: {e}")
                pose_rows.append((ate, rpe_t, rpe_r))
                with open(pose_log, "a") as f:
                    f.write(f"{seq}: ATE {ate:.5f} RPE_t {rpe_t:.5f} "
                            f"RPE_r {rpe_r:.5f}\n")
                print(f"[eval] {seq} ATE {ate:.4f} RPE_t {rpe_t:.4f} "
                      f"RPE_r {rpe_r:.4f}")
            except Exception as e:  # one bad sequence must not kill the run
                # reference appends zeros on failure and reports the
                # nonzero mean (infer_geo4d.py:592-596,627-634)
                pose_rows.append((0.0, 0.0, 0.0))
                print(f"[eval] pose eval failed for {seq}: {e}")

    # ---- aggregate (valid-pixel-weighted means, infer_geo4d.py:614-625) ----
    summary_path = os.path.join(args.savedir, "_error_log_all.txt")
    with open(summary_path, "w") as f:
        if depth_rows:
            weights = np.asarray([r["valid_pixels"] for r in depth_rows], np.float64)
            weights /= weights.sum()
            for key in ("Abs Rel", "Sq Rel", "RMSE", "Log RMSE",
                        "δ < 1.25", "δ < 1.25^2", "δ < 1.25^3"):
                val = float(sum(w * r[key] for w, r in zip(weights, depth_rows)))
                f.write(f"{key}: {val:.5f}\n")
                print(f"[eval] weighted {key}: {val:.5f}")
        if pose_rows:
            # nonzero mean — failed sequences (recorded as 0) are excluded
            # (infer_geo4d.py:627-634)
            arr = np.asarray(pose_rows)
            for i, name in enumerate(["ATE", "RPE_trans", "RPE_rot"]):
                col = arr[:, i]
                nz = col[np.nonzero(col)]
                val = float(nz.mean()) if nz.size else 0.0
                f.write(f"{name}: {val:.5f}\n")
                print(f"[eval] mean {name}: {val:.5f}")
    if total_time["frames"]:
        total_time["sec_per_frame"] = (
            total_time["diffusion_s"] + total_time["alignment_s"]
        ) / total_time["frames"]
        save_time_cost(os.path.join(args.savedir, "time_cost.txt"), total_time)
        print(f"[eval] {total_time['sec_per_frame']:.3f} sec/frame")


if __name__ == "__main__":
    main()
