"""Demo inference CLI: video file -> 4D reconstruction results dir.

Parity target: reference scripts/infer_geo4d.sh + scripts/evaluation/
test_geo4d.py (run_inference :314-534, arg surface :571-604). Defaults
match the shipped preset: seed 123, 5 DDIM steps, eta 0, cfg 1.0,
uniform_trailing spacing, guidance_rescale 0.7, window 16 / stride 4.

Usage:
  python -m geo4d_tpu.cli.infer --video_path video.mp4 --savedir results \
      [--ckpt_path model.ckpt --vae_path vae.ckpt --bpe_path bpe.txt.gz]
"""

from __future__ import annotations

import argparse
import os
import time


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="geo4d_tpu video -> 4D inference")
    p.add_argument("--video_path", type=str, required=True)
    p.add_argument("--savedir", type=str, default="results")
    p.add_argument("--config", type=str, default=None,
                   help="reference-layout YAML (configs/inference_geo4d.yaml); "
                        "drives model tree + postprocess knobs")
    p.add_argument("--clean_pointcloud", action="store_true",
                   help="cross-view consistency confidence filter "
                        "(base_opt_group.py:630-666)")
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--vae_path", type=str, default=None)
    p.add_argument("--bpe_path", type=str, default=None)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--ddim_steps", type=int, default=5)
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--unconditional_guidance_scale", type=float, default=1.0)
    p.add_argument("--cfg_img", type=float, default=None)
    p.add_argument("--multiple_cond_cfg", action="store_true")
    p.add_argument("--timestep_spacing", type=str, default="uniform_trailing")
    p.add_argument("--guidance_rescale", type=float, default=0.7)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--video_length", type=int, default=16)
    p.add_argument("--stride", type=int, default=4)
    p.add_argument("--frame_sampling_stride", type=int, default=1)
    p.add_argument("--max_video_frames", type=int, default=-1)
    p.add_argument("--n_iter", type=int, default=500, help="alignment iters")
    p.add_argument("--window_batch", type=int, default=1)
    p.add_argument(
        "--prompt",
        type=str,
        default="Output a video that assigns each 3D location in the world a consistent color.",
    )
    p.add_argument("--text_input", action="store_true", default=True)
    # accepted for reference-CLI compatibility; XLA manages memory itself
    p.add_argument("--perframe_ae", action="store_true")
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--tiny", action="store_true",
                   help="smoke-test with a miniature model (random weights)")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    from geo4d_tpu.alignment.optimizer import AlignerConfig
    from geo4d_tpu.cli.common import build_model_and_params, prepare_inference_params
    from geo4d_tpu.data.video import load_image_dir, load_video
    from geo4d_tpu.pipeline.export import save_results_dir, save_time_cost
    from geo4d_tpu.pipeline.inference import InferenceConfig, reconstruct

    seq = os.path.splitext(os.path.basename(args.video_path.rstrip("/")))[0]
    out_dir = os.path.join(args.savedir, seq, seq)

    if os.path.isdir(args.video_path):
        # image-directory input (reference: dust3r/utils/image.py:301
        # load_images_with_near_aspect_ratio feeds the same pipeline)
        # raw_uint8: frames stay uint8 on host; the pipeline normalizes
        # in-jit — the host->device upload (slow on a remote chip) is 4x
        # smaller than f32 with bit-identical results
        frames, _names = load_image_dir(
            args.video_path, (args.width, args.height),
            max_frames=args.max_video_frames, raw_uint8=True,
        )
        frames = frames[:: args.frame_sampling_stride]
        fps = 24 // args.frame_sampling_stride
    else:
        frames, fps = load_video(
            args.video_path,
            frame_stride=args.frame_sampling_stride,
            video_size=(args.height, args.width),
            max_frames=args.max_video_frames,
            raw_uint8=True,
        )
    print(f"[infer] {frames.shape[0]} frames @ {fps} fps, {frames.shape[1:3]}")

    postprocess = None
    if args.tiny:
        import jax

        from geo4d_tpu.models.presets import init_params, tiny

        model = tiny(temporal_length=args.video_length)
        params = init_params(
            model, jax.random.PRNGKey(args.seed),
            (args.height, args.width), temporal_length=args.video_length,
        )
    elif args.config:
        from geo4d_tpu.cli.common import build_model_from_config

        model, params, postprocess = build_model_from_config(
            args.config, args.ckpt_path, args.vae_path,
            (args.height, args.width), args.seed,
        )
    else:
        model, params = build_model_and_params(
            args.ckpt_path, args.vae_path, (args.height, args.width), args.seed
        )
    if args.ckpt_path is None:
        print("[infer] WARNING: no checkpoint given — random weights")
    params, text_ctx, uncond_text_ctx = prepare_inference_params(
        model, params, args.prompt if args.text_input else "", args.bpe_path
    )

    icfg = InferenceConfig(
        window=args.video_length,
        stride=args.stride,
        ddim_steps=args.ddim_steps,
        ddim_eta=args.ddim_eta,
        cfg_scale=args.unconditional_guidance_scale,
        cfg_img=args.cfg_img if args.multiple_cond_cfg else None,
        timestep_spacing=args.timestep_spacing,
        guidance_rescale=args.guidance_rescale,
        window_batch=args.window_batch,
    )
    if postprocess is not None:
        from geo4d_tpu.cli.common import aligner_config_from_postprocess

        acfg = aligner_config_from_postprocess(postprocess, n_iter=args.n_iter)
    else:
        acfg = AlignerConfig(n_iter=args.n_iter)
    scene, preds, timing = reconstruct(
        model, params, frames, text_ctx, fps=fps,
        inference_config=icfg, aligner_config=acfg, seed=args.seed, verbose=True,
        uncond_text_ctx=uncond_text_ctx,
    )
    if args.clean_pointcloud:
        scene.apply_cleanup()
    save_results_dir(out_dir, scene, rgb_frames=frames)
    save_time_cost(os.path.join(args.savedir, seq, "time_cost.txt"), timing)
    print(f"[infer] results -> {out_dir} "
          f"({timing['sec_per_frame']:.2f}s/frame)")


if __name__ == "__main__":
    main()
