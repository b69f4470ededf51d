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

Host/device split: the WHOLE init chain runs on host (numpy + C++ OpenCV
PnP — mirroring the reference, whose roma/scipy/cv2 init is CPU-side too)
except the one batched MoGe focal solve, which downsamples on host first
so only (G, 64, 64, 3) crosses to the device. Rationale: init touches
multi-megapoint overlap tensors but does only means/3x3-SVDs on them —
per-call transfer to a (possibly remote) device costs orders of magnitude
more than the math; measured 1024 s -> ~10 s for a 32-frame sequence on a
tunneled TPU by keeping it host-side.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from geo4d_tpu.alignment.optimizer import GroupAligner
from geo4d_tpu.geometry.moge import point_map_to_depth
from geo4d_tpu.geometry.pnp import fast_pnp, fast_pnp_points
from geo4d_tpu.geometry.se3 import pose_to_params, umeyama_sim3, umeyama_sim3_np
from geo4d_tpu.geometry.utils import inv_se3


def _inv_se3_np(T: np.ndarray) -> np.ndarray:
    """Host inverse of a rigid 4x4 (R.T | -R.T t)."""
    R = T[:3, :3]
    t = T[:3, 3]
    out = np.eye(4)
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ t
    return out


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
    # threshold matches the reference exactly (init_im_poses.py:256
    # `mask = ref_conf > 0.5` on the same inverse-softplus weights)
    mask = ref_conf > 0.5
    # deliberate divergence: the reference solves at FULL resolution
    # (init_im_poses.py:261 passes downsample_size=(H,W)); we use MoGe's
    # own recommended 64x64 downsample (utils/geometry.py:173 "downsampling
    # produces approximate solution and is efficient for large maps") —
    # ~60 s/sequence cheaper, and focal is refined by the optimizer anyway.
    # The downsample happens HERE on host so only (G, 64, 64) tensors cross
    # to the device for the batched Gauss-Newton solve.
    dh = dw = 64
    yi = (np.arange(dh) * h) // dh
    xi = (np.arange(dw) * w) // dw
    pts_lr = pts[:, yi][:, :, xi]
    mask_lr = mask[:, yi][:, :, xi]
    _, fov_x, fov_y, _ = point_map_to_depth(
        jnp.asarray(pts_lr, jnp.float32), jnp.asarray(mask_lr),
        downsample_size=(dh, dw), image_size=(h, w),
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


# ---------------------------------------------------------------------------
# device-resident init (predictions stay on device; host sees only the
# small PnP inputs)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("dh", "dw", "H", "W", "N"))
def _init_gather_dev(pred_flat, conf_flat, groups_dev, sel,
                     dh: int, dw: int, H: int, W: int, N: int):
    """The ENTIRE pre-PnP device init as one launch: MoGe focal prep,
    sequential sim3 window registration (init_im_poses.py:330-393), the
    host-PnP point subsample, and the batched per-window sim3
    (init_from_pts3d_group). One dispatch + one batched fetch replace
    ~12 eager round trips — on a remote-device tunnel (~30-50 ms each)
    that was most of the measured 1.3-1.8 s init tail."""
    G, S, P, _ = pred_flat.shape

    # ---- focal prep (downsample + z-shift on first frames) ----
    ref_pts = pred_flat[:, 0].reshape(G, H, W, 3)
    conf0 = conf_flat[:, 0].reshape(G, H, W)
    yi = (jnp.arange(dh) * H) // dh
    xi = (jnp.arange(dw) * W) // dw
    z_shift = 1.0 - jnp.min(ref_pts[..., 2])
    pts_lr = ref_pts[:, yi][:, :, xi].at[..., 2].add(z_shift)
    mask_lr = conf0[:, yi][:, :, xi] > 0.5
    _, fov_x, fov_y, _ = point_map_to_depth(
        pts_lr, mask_lr, downsample_size=(dh, dw), image_size=(H, W)
    )

    # ---- sequential window registration (window 0 = world frame) ----
    idx0 = groups_dev[0]
    pts_acc = jnp.zeros((N, P, 3), jnp.float32).at[idx0].set(pred_flat[0])
    conf_acc = jnp.zeros((N, P), jnp.float32).at[idx0].set(conf_flat[0])
    done = jnp.zeros((N,), jnp.float32).at[idx0].set(1.0)

    def body(g, carry):
        pts_acc, conf_acc, done = carry
        idx_g = jax.lax.dynamic_index_in_dim(groups_dev, g, keepdims=False)
        pred_g = jax.lax.dynamic_index_in_dim(pred_flat, g, keepdims=False)
        conf_g = jax.lax.dynamic_index_in_dim(conf_flat, g, keepdims=False)
        # non-overlap frames contribute zero weight to the Umeyama —
        # identical math to the host path's overlap-only concatenation
        w = conf_g * conf_acc[idx_g] * done[idx_g][:, None]      # (S, P)
        s, R, t = umeyama_sim3(
            pred_g.reshape(-1, 3), pts_acc[idx_g].reshape(-1, 3), w.reshape(-1)
        )
        moved = s * pred_g @ R.T + t
        return (pts_acc.at[idx_g].set(moved),
                conf_acc.at[idx_g].set(conf_g),
                done.at[idx_g].set(1.0))

    pts_acc, conf_acc, done = jax.lax.fori_loop(
        1, G, body, (pts_acc, conf_acc, done)
    )

    # ---- host-PnP subsample: f16 points + bool mask (~4 MB -> ~3.7 MB
    # fetch; pose quality is RANSAC-bound far above f16 quantization).
    # Clamp BEFORE the cast: per-window sim3 scale is unbounded here, and
    # |coord| > 65504 would overflow to inf — passing fast_pnp's np.ptp
    # degeneracy guard but making cv2.solvePnPRansac fail, silently
    # degrading those frames to identity-pose init. ----
    sub = jnp.clip(pts_acc[:, sel], -6e4, 6e4).astype(jnp.float16)  # (N,p,3)
    sub_mask = conf_acc[:, sel] > 0.5                            # (N, p_sub)

    # ---- per-window sim3 vs the FINAL placements, batched ----
    def one(pred_g, idx_g, conf_g):
        return umeyama_sim3(
            pred_g.reshape(-1, 3),
            pts_acc[idx_g].reshape(-1, 3),
            (conf_g * conf_acc[idx_g]).reshape(-1),
        )

    s_all, R_all, t_all = jax.vmap(one)(pred_flat, groups_dev, conf_flat)
    return (fov_x, fov_y, sub, sub_mask, s_all, R_all, t_all,
            pts_acc, conf_acc)


@partial(jax.jit, static_argnames=("n_real",))
def _init_write_dev(pts_acc, conf_acc, poses_c2w, s_factor, s_clip, R_all,
                    t_all, log_depth, poses_p, pw_poses_p, n_real: int):
    """Post-PnP device init as one launch: depth init from scaled world
    points + sky fill (init_im_poses.py:588-629), the 7D pose codec for
    all frame poses, and the 8D sim3 codec for all window pw_poses —
    written straight into the (padded) parameter tensors."""
    pts = pts_acc * s_factor                                     # (N, P, 3)
    w2c = inv_se3(poses_c2w)
    cam = jnp.einsum("nij,npj->npi", w2c[:, :3, :3], pts) + w2c[:, None, :3, 3]
    depth = cam[..., 2]                                          # (N, P)
    sky_distance = jnp.max(depth[0])
    depth = jnp.where(conf_acc < 1e-4, sky_distance, depth)
    d = jnp.nan_to_num(depth, nan=1.0, posinf=1e4, neginf=1e-6)
    log_depth = log_depth.at[:n_real].set(
        jnp.log(jnp.clip(d, 1e-6, 1e6))
    )

    poses_p = poses_p.at[:n_real].set(pose_to_params(poses_c2w))

    G = R_all.shape[0]
    T = jnp.tile(jnp.eye(4, dtype=jnp.float32), (G, 1, 1))
    T = T.at[:, :3, :3].set(R_all).at[:, :3, 3].set(t_all)
    rows = jnp.concatenate(
        [pose_to_params(T), jnp.log(s_clip)[:, None]], axis=-1
    )
    pw_poses_p = pw_poses_p.at[:G].set(rows)
    return log_depth, poses_p, pw_poses_p


def _init_from_group_device(
    aligner: GroupAligner,
    pred_pts,                 # (G, S, H, W, 3) device array
    conf,                     # (G, S, H, W) device array
    niter_pnp: int = 10,
    verbose: bool = False,
) -> None:
    """Device-resident init: the multi-megapoint registration math runs
    where the diffusion outputs already live; the host fetches only a
    seeded ~16k-pixel point subsample for OpenCV RANSAC-PnP (deliberate
    divergence: the reference solves PnP on every masked pixel — RANSAC
    pose quality saturates far below that, and the subsample cuts the
    device->host fetch ~5x on a remote link).

    Second documented divergence: the reference re-solves PnP each time a
    later window overwrites a frame; here one PnP pass runs over the FINAL
    placements (the reference's retained result is also the final visit's).
    """
    import os
    import sys
    import time

    profile = bool(os.environ.get("GEO4D_PROFILE_INIT"))
    marks = [("start", time.time())]

    def mark(label):
        if profile:
            marks.append((label, time.time()))

    cfg = aligner.cfg
    groups = aligner.groups
    G, S = groups.shape
    H, W = aligner.H, aligner.W
    N = aligner.N
    P = H * W

    pred_flat = pred_pts.reshape(G, S, P, 3)
    conf_flat = conf.reshape(G, S, P)

    # ---- everything before PnP: ONE device launch + ONE batched fetch ----
    p_sub = min(4 * 4096, P)
    sel = np.random.default_rng(0).choice(P, size=p_sub, replace=False)
    dh = dw = 64
    out = _init_gather_dev(
        pred_flat, conf_flat, jnp.asarray(groups), jnp.asarray(sel),
        dh, dw, H, W, N,
    )
    (fov_x, fov_y, sub, sub_conf_mask, s_all, R_all, t_all) = jax.device_get(
        out[:7]
    )
    pts_acc, conf_acc = out[7], out[8]            # stay device-resident
    mark("gather+fetch")

    fx = 0.5 / np.tan(fov_x / 2)
    fy = 0.5 / np.tan(fov_y / 2)
    focal = (fx * W + fy * H) / 2
    good = focal > 30
    mean_focal = focal[good].mean() if good.any() else float(max(H, W))
    rel_err = np.abs(focal - mean_focal) / (mean_focal + 1e-12)
    focal_group = np.where(rel_err > 0.6, mean_focal, focal)

    sub = np.asarray(sub, np.float32)                            # (N, p_sub, 3)
    x_pix = (sel % W).astype(np.float64)
    y_pix = (sel // W).astype(np.float64)
    sub_pix = np.stack([x_pix, y_pix], -1)                       # (p_sub, 2)
    mark("focal")
    im_poses = np.tile(np.eye(4), (N, 1, 1))
    im_focals: List[Optional[float]] = [None] * N
    window_start = {int(groups[g, 0]): g for g in range(G)}
    # warm start per frame: window-start frames get their window's MoGe
    # focal; other frames the nearest preceding window-start focal.
    # (Divergence from the reference's frame-(i-1) chain — which is
    # inherently sequential — so all N solves run in parallel; focals
    # within a window are near-constant, making the two warm starts
    # equivalent in practice.) cv2's RANSAC releases the GIL, so a thread
    # pool gives real parallelism on multi-core hosts.
    warm_of = np.empty(N)
    cur = None
    for i in range(N):
        if i in window_start:
            cur = focal_group[window_start[i]]
        warm_of[i] = cur if cur is not None else np.nan

    def solve(i):
        warm = None if np.isnan(warm_of[i]) else float(warm_of[i])
        m = sub_conf_mask[i]
        return i, fast_pnp_points(
            sub[i][m], sub_pix[m], (W, H), focal=warm, niter=niter_pnp,
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, N)) as pool:
        for i, res in pool.map(solve, range(N)):
            if res is not None:
                f, pose = res
                im_focals[i] = f
                im_poses[i] = pose
            elif verbose:
                print(f"[init] PnP failed for frame {i}; identity fallback")

    mark("pnp")

    # ---- everything after PnP: ONE device launch writes the params ----
    s_np = np.clip(s_all, 1e-6, 1e6)
    s_factor = float(np.exp(np.log(cfg.base_scale) - np.mean(np.log(s_np))))
    if not np.isfinite(s_factor):
        s_factor = 1.0
    im_poses[:, :3, 3] *= s_factor

    log_depth, poses_p, pw_poses_p = _init_write_dev(
        pts_acc, conf_acc, jnp.asarray(im_poses, jnp.float32),
        jnp.asarray(s_factor, jnp.float32), jnp.asarray(s_np, jnp.float32),
        jnp.asarray(R_all), jnp.asarray(t_all),
        aligner.params["log_depth"], aligner.params["poses"],
        aligner.params["pw_poses"], aligner.N,
    )
    aligner.params["log_depth"] = log_depth
    aligner.params["poses"] = poses_p
    aligner.params["pw_poses"] = pw_poses_p

    if cfg.shared_focal:
        vals = [f for f in im_focals if f is not None]
        mean_f = np.mean(vals) if vals else float(max(H, W))
        aligner.params["focal"] = jnp.asarray(
            [cfg.focal_break * np.log(mean_f)], jnp.float32
        )
    else:
        f = np.asarray(
            [fv if fv is not None else focal_group[0] for fv in im_focals],
            np.float32,
        )
        aligner.params["focal"] = jnp.asarray(cfg.focal_break * np.log(f))

    mark("sim3+depth+write")
    if profile:
        total = marks[-1][1] - marks[0][1]
        parts = " ".join(
            f"{label} {t1 - t0:.2f}s"
            for (_, t0), (label, t1) in zip(marks, marks[1:])
        )
        print(f"[init profile] total {total:.2f}s: {parts}", file=sys.stderr)

    if verbose:
        init_loss = float(aligner.loss_fn(aligner.params, False))
        print(f"[init] loss = {init_loss:.5f}")


def init_from_group(
    aligner: GroupAligner,
    pred_pts,                 # (G, S, H, W, 3) numpy OR device array
    conf,                     # (G, S, H, W)
    niter_pnp: int = 10,      # inference preset (base_opt_group.py:496)
    verbose: bool = False,
) -> None:
    """Full init chain; mutates the aligner's params in place.

    Device arrays take the device-resident path (registration math where
    the data lives); numpy inputs run the host chain below."""
    if isinstance(pred_pts, jax.Array) and not isinstance(pred_pts, np.ndarray):
        return _init_from_group_device(
            aligner, pred_pts, jnp.asarray(conf), niter_pnp, verbose=verbose
        )
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
        pts3d[img_idx] = np.asarray(pred_pts[0, s_idx], np.float32)
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
        s, R, t = umeyama_sim3_np(
            np.concatenate(overlap_pred),
            np.concatenate(overlap_pts),
            np.concatenate(overlap_conf),
        )

        for s_idx, img_idx in enumerate(groups[g]):
            # frames nearer window-start are assumed more accurate; later
            # windows overwrite (init_im_poses.py:373-379)
            pts = np.asarray(pred_pts[g, s_idx], np.float32).reshape(-1, 3)
            # f32 storage: the sim3 apply in f32 keeps ~1e-6 relative error,
            # far below what the 500-iter optimizer corrects anyway
            pts3d[img_idx] = (
                s * pts @ R.T.astype(np.float32) + t.astype(np.float32)
            ).reshape(H, W, 3)
            conf_list[img_idx] = np.asarray(conf[g, s_idx])
            done.add(img_idx)
            warm = focal_group[g] if s_idx == 0 else im_focals[img_idx - 1]
            pnp_frame(img_idx, warm)

    im_poses_arr = np.stack(im_poses)

    # ---- init_from_pts3d_group ----
    # per-window sim3 pw_poses from window preds -> placed world points
    pw_scales, pw_R, pw_t = [], [], []
    for g in range(G):
        s, R, t = umeyama_sim3_np(
            pred_pts[g].reshape(-1, 3),
            np.stack([pts3d[i] for i in groups[g]]).reshape(-1, 3),
            np.stack(
                [conf[g, s_idx] * conf_list[i] for s_idx, i in enumerate(groups[g])]
            ).reshape(-1),
        )
        pw_scales.append(s)
        pw_R.append(R)
        pw_t.append(t)
    aligner.set_pw_poses_all(
        np.asarray(pw_scales), np.stack(pw_R), np.stack(pw_t)
    )

    # global scale normalization so mean window scale == base_scale
    scales = np.clip(np.asarray(pw_scales), 1e-6, 1e6)
    s_factor = float(np.exp(np.log(cfg.base_scale) - np.mean(np.log(scales))))
    if not np.isfinite(s_factor):
        s_factor = 1.0
    im_poses_arr[:, :3, 3] *= s_factor
    for i in range(N):
        pts3d[i] = pts3d[i] * s_factor

    # per-frame depth init from world points + sky fill (host, batched write)
    sky_distance = None
    depths = np.empty((N, H * W), np.float32)
    for i in range(N):
        w2c = _inv_se3_np(im_poses_arr[i])
        depth = (pts3d[i].reshape(-1, 3) @ w2c[:3, :3].T + w2c[:3, 3])[:, 2]
        sky = conf_list[i].reshape(-1) < 1e-4
        if i == 0:
            sky_distance = depth.max()
        depth[sky] = sky_distance
        depths[i] = depth
    aligner.set_depthmaps_all(depths)
    aligner.set_poses_all(im_poses_arr)

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
    aligner.set_poses_all(np.asarray(poses_c2w, np.float64))

    # place each window into world via its first frame's known camera
    c2w0 = poses_c2w[groups[:, 0]]
    aligner.set_pw_poses_all(
        np.ones((G,)), np.asarray(c2w0[:, :3, :3]), np.asarray(c2w0[:, :3, 3])
    )

    # depth init: z of window preds in their own (first-frame) camera frame
    depths = np.ones((aligner.N, h * w), np.float64)
    seen = set()
    for g in range(G):
        for s_idx, img_idx in enumerate(groups[g]):
            if img_idx in seen:
                continue
            depth = np.asarray(pred_pts[g, s_idx, ..., 2]).reshape(-1)
            depths[img_idx] = np.clip(depth, 1e-4, None)
            seen.add(img_idx)
    aligner.set_depthmaps_all(depths)
