"""Incremental initialization of the group aligner.

Parity target: reference dust3r/cloud_opt/init_im_poses.py —
`init_from_group` (:61-80) -> `align_group_prefix` (:226-405) ->
`init_from_pts3d_group` (:569-633):

 1. MoGe focal recovery on every window's FIRST frame, batched, with
    outlier clamping to the group mean (:244-277). TPU-first: the
    reference loops scipy-LM per window on CPU; here one jitted batched
    Gauss-Newton call solves all windows at once (geometry/moge.py).
 2. Window 0 defines the world frame; each of its frames gets a RANSAC-PnP
    pose with previous-frame focal warm start (:296-321).
 3. Every later window is sim3-registered (weighted Umeyama, replacing
    roma) onto its frames already placed, then its frames get PnP poses
    (:330-393). PnP failure falls back to identity (:391-393).
 4. init_from_pts3d_group: per-window sim3 pw_poses via Umeyama, global
    scale normalization, per-frame depth init from world points with
    sky-mask depth fill (:588-629).

Host/device split: PnP + bookkeeping on host (tiny tensors, C++ OpenCV),
focal solve + Umeyama on device (batched).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from geo4d_tpu.alignment.optimizer import GroupAligner
from geo4d_tpu.geometry.moge import point_map_to_depth
from geo4d_tpu.geometry.pnp import fast_pnp
from geo4d_tpu.geometry.se3 import umeyama_sim3
from geo4d_tpu.geometry.utils import inv_se3


def recover_group_focals(
    ref_pointmaps: np.ndarray,   # (G, H, W, 3) first frame of each window
    ref_conf: np.ndarray,        # (G, H, W) weights
    outlier_rel_err: float = 0.6,
) -> np.ndarray:
    """Batched MoGe focal per window, outliers clamped to the mean
    (init_im_poses.py:244-277). Returns per-window focal in pixels."""
    g, h, w, _ = ref_pointmaps.shape
    pts = ref_pointmaps.copy()
    # shift z to be positive (reference: z - z.min() + 1)
    pts[..., 2] = pts[..., 2] - pts[..., 2].min() + 1.0
    mask = ref_conf > 0.5
    _, fov_x, fov_y, _ = point_map_to_depth(
        jnp.asarray(pts, jnp.float32), jnp.asarray(mask), downsample_size=(h, w)
    )
    # normalized focal -> pixel focal, averaged over axes
    # (reference builds K from fov then f_px = (fx*W + fy*H)/2)
    fx = 0.5 / np.tan(np.asarray(fov_x) / 2)
    fy = 0.5 / np.tan(np.asarray(fov_y) / 2)
    focal = (fx * w + fy * h) / 2

    good = focal > 30
    mean_focal = focal[good].mean() if good.any() else float(max(h, w))
    rel_err = np.abs(focal - mean_focal) / (mean_focal + 1e-12)
    focal = np.where(rel_err > outlier_rel_err, mean_focal, focal)
    return focal.astype(np.float64)


def init_from_group(
    aligner: GroupAligner,
    pred_pts: np.ndarray,     # (G, S, H, W, 3)
    conf: np.ndarray,         # (G, S, H, W)
    niter_pnp: int = 10,      # inference preset (base_opt_group.py:496)
    verbose: bool = False,
) -> None:
    """Full init chain; mutates the aligner's params in place."""
    cfg = aligner.cfg
    groups = aligner.groups
    G, S = groups.shape
    H, W = aligner.H, aligner.W
    N = aligner.N

    focal_group = recover_group_focals(pred_pts[:, 0], conf[:, 0])

    pts3d: List[Optional[np.ndarray]] = [None] * N
    conf_list: List[Optional[np.ndarray]] = [None] * N
    im_poses: List[Optional[np.ndarray]] = [None] * N
    im_focals: List[Optional[float]] = [None] * N
    done = set()

    def pnp_frame(img_idx: int, warm_focal: Optional[float]):
        msk = conf_list[img_idx] > 0.5
        res = fast_pnp(
            pts3d[img_idx], msk, focal=warm_focal, niter=niter_pnp
        )
        if res is not None:
            im_focals[img_idx], im_poses[img_idx] = res
        if im_poses[img_idx] is None:
            if verbose:
                print(f"[init] PnP failed for frame {img_idx}; identity fallback")
            im_poses[img_idx] = np.eye(4)

    # ---- window 0 defines the world frame ----
    for s_idx, img_idx in enumerate(groups[0]):
        pts3d[img_idx] = np.asarray(pred_pts[0, s_idx], np.float64)
        conf_list[img_idx] = np.asarray(conf[0, s_idx])
        if s_idx == 0:
            im_focals[img_idx] = focal_group[0]
        warm = im_focals[img_idx - 1] if img_idx > 0 else im_focals[img_idx]
        pnp_frame(img_idx, warm)
        done.add(img_idx)

    # ---- later windows: sim3 register on the overlap, then PnP ----
    for g in range(1, G):
        overlap_pred, overlap_pts, overlap_conf = [], [], []
        for s_idx, img_idx in enumerate(groups[g]):
            if img_idx in done:
                overlap_pred.append(pred_pts[g, s_idx].reshape(-1, 3))
                overlap_pts.append(pts3d[img_idx].reshape(-1, 3))
                overlap_conf.append(
                    (conf[g, s_idx] * conf_list[img_idx]).reshape(-1)
                )
        assert overlap_pred, "windows must overlap (stride < window size)"
        src = jnp.asarray(np.concatenate(overlap_pred), jnp.float32)
        dst = jnp.asarray(np.concatenate(overlap_pts), jnp.float32)
        wts = jnp.asarray(np.concatenate(overlap_conf), jnp.float32)
        s, R, t = umeyama_sim3(src, dst, wts)
        s, R, t = float(s), np.asarray(R, np.float64), np.asarray(t, np.float64)

        for s_idx, img_idx in enumerate(groups[g]):
            # frames nearer window-start are assumed more accurate; later
            # windows overwrite (init_im_poses.py:373-379)
            pts = np.asarray(pred_pts[g, s_idx], np.float64).reshape(-1, 3)
            pts3d[img_idx] = (s * pts @ R.T + t).reshape(H, W, 3)
            conf_list[img_idx] = np.asarray(conf[g, s_idx])
            done.add(img_idx)
            warm = focal_group[g] if s_idx == 0 else im_focals[img_idx - 1]
            pnp_frame(img_idx, warm)

    im_poses_arr = np.stack(im_poses)

    # ---- init_from_pts3d_group ----
    # per-window sim3 pw_poses from window preds -> placed world points
    pw_scales = []
    for g in range(G):
        src = jnp.asarray(
            pred_pts[g].reshape(-1, 3), jnp.float32
        )
        dst = jnp.asarray(
            np.stack([pts3d[i] for i in groups[g]]).reshape(-1, 3), jnp.float32
        )
        wts = jnp.asarray(
            np.stack(
                [conf[g, s_idx] * conf_list[i] for s_idx, i in enumerate(groups[g])]
            ).reshape(-1),
            jnp.float32,
        )
        s, R, t = umeyama_sim3(src, dst, wts)
        aligner.set_pw_pose(g, float(s), np.asarray(R), np.asarray(t))
        pw_scales.append(float(s))

    # global scale normalization so mean window scale == base_scale
    scales = np.clip(np.asarray(pw_scales), 1e-6, 1e6)
    s_factor = float(np.exp(np.log(cfg.base_scale) - np.mean(np.log(scales))))
    if not np.isfinite(s_factor):
        s_factor = 1.0
    im_poses_arr[:, :3, 3] *= s_factor
    for i in range(N):
        pts3d[i] = pts3d[i] * s_factor

    # per-frame depth init from world points + sky fill
    sky_distance = None
    for i in range(N):
        c2w = im_poses_arr[i]
        w2c = np.asarray(inv_se3(jnp.asarray(c2w, jnp.float32)))
        depth = (pts3d[i].reshape(-1, 3) @ w2c[:3, :3].T + w2c[:3, 3])[:, 2]
        sky = conf_list[i].reshape(-1) < 1e-4
        if i == 0:
            sky_distance = depth.max()
        depth[sky] = sky_distance
        aligner.set_depthmap(i, depth)
        aligner.set_pose(i, c2w)

    if cfg.shared_focal:
        vals = [f for f in im_focals if f is not None]
        aligner.params["focal"] = jnp.asarray(
            [cfg.focal_break * np.log(np.mean(vals))], jnp.float32
        )
    else:
        f = np.asarray(
            [fv if fv is not None else focal_group[0] for fv in im_focals],
            np.float32,
        )
        aligner.params["focal"] = jnp.asarray(cfg.focal_break * np.log(f))

    if verbose:
        init_loss = float(aligner.loss_fn(aligner.params, False))
        print(f"[init] loss = {init_loss:.5f}")


def init_from_known_poses(
    aligner: GroupAligner,
    poses_c2w: np.ndarray,        # (N, 4, 4) known cameras
    focals: np.ndarray,           # (N,) or scalar known focal(s)
    pred_pts: np.ndarray,         # (G, S, H, W, 3)
    conf: np.ndarray,             # (G, S, H, W)
) -> None:
    """Init with ground-truth cameras (reference init='known_poses' path,
    base_opt_group.py:509-512 + init_im_poses init_from_known_poses):
    poses and focal preset (frozen focal), per-window sim3 from Umeyama
    onto the known-pose point placement, depths from the window preds."""
    groups = aligner.groups
    G, S = groups.shape
    h, w = aligner.H, aligner.W
    aligner.preset_focal(np.atleast_1d(focals), requires_grad=False)
    for i in range(aligner.N):
        aligner.set_pose(i, poses_c2w[i])

    f = float(np.atleast_1d(focals)[0])
    # place each window into world via its first frame's known camera
    for g in range(G):
        c2w0 = poses_c2w[groups[g, 0]]
        s, R, t = 1.0, c2w0[:3, :3], c2w0[:3, 3]
        aligner.set_pw_pose(g, s, R, t)

    # depth init: z of window preds in their own (first-frame) camera frame
    seen = {}
    for g in range(G):
        for s_idx, img_idx in enumerate(groups[g]):
            if img_idx in seen:
                continue
            depth = np.asarray(pred_pts[g, s_idx, ..., 2]).reshape(-1)
            aligner.set_depthmap(img_idx, np.clip(depth, 1e-4, None))
            seen[img_idx] = True
