"""Group global-alignment optimizer — fuses sliding-window predictions into
one consistent 4D scene + camera trajectory.

Parity target: reference dust3r/cloud_opt/optimizer_group.py
(`LightPointCloudGroupOptimizer` :31, forward :440-525, `_set_st_depth`
:333-372, `_set_traj` :242-267) + base_opt_group.py (pose codec :260-288,
pw sim3 poses :304-320, `global_alignment_loop` :553-608).

Parameters (stacked arrays, optimized jointly):
  log_depth   (N, P)   per-frame log depth maps
  poses       (N, 7)   per-frame c2w [quat xyzw | signed-log1p t]
  pw_poses    (G, 8)   per-window sim3 [quat | slog1p t | log s]
  traj_align  (G, 8)   per-window SE3(+s) aligning diffusion trajs to poses
  focal       (1 or N,) log-coded: f = exp(p / focal_break)
  s_depth, t_depth (G,) per-window disparity scale/shift

Loss = conf-weighted L1 point-map consistency
     + 2 x inverse-depth consistency to the diffusion disparity (phase 2)
     + 0.005 x trajectory loss to the diffusion cameras (phase 2)
     + temporal pose smoothness.

TPU-first redesign: the reference runs 500 eager torch iterations with
per-iter `empty_cache` (base_opt_group.py:611-622). Here each phase is ONE
jitted `lax.scan` of Adam steps — the whole 500-iteration optimization is
two device launches, with the iter-150 disparity/trajectory calibration
(batched lad2 + per-group origin alignment) between them.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from geo4d_tpu.evals.depth import lad2_align
from geo4d_tpu.evals.trajectory import (
    Trajectory,
    align_trajectory_with_eval,
)
from geo4d_tpu.geometry.se3 import (
    params_to_pose,
    pose_to_params,
    signed_log1p,
)
from geo4d_tpu.geometry.utils import inv_se3


@dataclasses.dataclass(frozen=True)
class AlignerConfig:
    n_iter: int = 500
    lr: float = 0.03
    lr_min: float = 1e-3
    schedule: str = "linear"            # 'linear' | 'cosine'
    temporal_smoothing_weight: float = 0.015
    translation_weight: float = 1.0
    depth_traj_start_iter: int = 150
    depth_loss_weight: float = 2.0       # x2 (optimizer_group.py:488)
    traj_loss_weight: float = 0.005      # (optimizer_group.py:522)
    conf_optimize: bool = True
    conf_clamp: float = 10.0             # weight clamp (optimizer_group.py:446)
    shared_focal: bool = True
    focal_break: float = 20.0
    pw_break: float = 20.0
    base_scale: float = 0.5              # pw scale normalization target
    invdepth_valid_thr: float = 0.05     # (optimizer_group.py:478)
    weight_valid_thr: float = 0.5
    rpe_rot_valid_deg: float = 4.0       # traj group gate (optimizer_group.py:262)
    delta_valid_thr: float = 0.3         # depth group gate (optimizer_group.py:368)
    min_conf_thr: float = 3.0


class GroupAligner:
    """Functional optimizer over stacked window predictions.

    Buffers (all (G, S, ...) where G=windows, S=window size, P=H*W pixels):
      pred_pts (G, S, P, 3)  normalized-world point maps per window
      weights  (G, S, P)     inverse-confidence weights (0 = invalid)
      invdepth (G, S, P)     diffusion inverse depth in [0, 1]
      trajs    (G, S, 4, 4)  diffusion cameras (from Plücker maps)
      groups   (G, S) int    frame index of each window slot
    """

    def __init__(
        self,
        groups: np.ndarray,
        pred_pts: np.ndarray,
        weights: np.ndarray,
        imshape: Tuple[int, int],
        invdepth: Optional[np.ndarray] = None,
        trajs: Optional[np.ndarray] = None,
        config: AlignerConfig = AlignerConfig(),
    ):
        self.cfg = config
        self.groups = np.asarray(groups, np.int32)
        self.G, self.S = self.groups.shape
        self.H, self.W = imshape
        self.P = self.H * self.W
        self.N = int(self.groups.max()) + 1

        self.buf = {
            "pred_pts": jnp.asarray(pred_pts, jnp.float32).reshape(self.G, self.S, self.P, 3),
            "weights": jnp.asarray(weights, jnp.float32).reshape(self.G, self.S, self.P),
            "e_all": jnp.asarray(self.groups.reshape(-1)),
        }
        self.has_depth = invdepth is not None
        self.has_traj = trajs is not None
        if self.has_depth:
            self.buf["invdepth"] = jnp.asarray(invdepth, jnp.float32).reshape(
                self.G, self.S, self.P
            )
        if self.has_traj:
            self.buf["trajs"] = jnp.asarray(trajs, jnp.float32).reshape(
                self.G, self.S, 4, 4
            )
        # per-frame max confidence across windows (base_opt_group.py:236-242)
        im_conf = np.zeros((self.N, self.P), np.float32)
        wnp = np.asarray(self.buf["weights"])
        for g in range(self.G):
            for s in range(self.S):
                im_conf[self.groups[g, s]] = np.maximum(
                    im_conf[self.groups[g, s]], wnp[g, s]
                )
        self.im_conf = im_conf
        self.init_conf = im_conf.copy()

        x, y = np.meshgrid(np.arange(self.W), np.arange(self.H))
        self.grid = jnp.asarray(
            np.stack([x, y], -1).reshape(self.P, 2).astype(np.float32)
        )
        self.pp = jnp.asarray(
            np.tile([[self.W / 2, self.H / 2]], (self.N, 1)).astype(np.float32)
        )
        self.total_area = float(self.G * self.S * self.P)

        n_f = 1 if config.shared_focal else self.N
        self.params = {
            "log_depth": jnp.asarray(
                np.random.default_rng(0).normal(size=(self.N, self.P)) / 10 - 3,
                jnp.float32,
            ),
            "poses": jnp.tile(jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32), (self.N, 1)),
            "pw_poses": jnp.tile(
                jnp.asarray([0, 0, 0, 1, 0, 0, 0, 0], jnp.float32), (self.G, 1)
            ),
            "traj_align": jnp.tile(
                jnp.asarray([0, 0, 0, 1, 0, 0, 0, 0], jnp.float32), (self.G, 1)
            ),
            "focal": jnp.full(
                (n_f,), config.focal_break * np.log(max(self.H, self.W)), jnp.float32
            ),
            "s_depth": jnp.ones((self.G,), jnp.float32),
            "t_depth": jnp.zeros((self.G,), jnp.float32),
        }
        self.focal_frozen = False
        # phase-2 group validity gates (filled by calibration)
        self.valid_depth_group = jnp.ones((self.G,), jnp.float32)
        self.valid_traj_group = jnp.zeros((self.G,), jnp.float32)

    # ---------------- derived quantities ----------------

    def _focals(self, params) -> jnp.ndarray:
        f = jnp.exp(params["focal"] / self.cfg.focal_break)
        if self.cfg.shared_focal:
            f = jnp.broadcast_to(f, (self.N,))
        return f

    def _depth(self, params) -> jnp.ndarray:
        return jnp.exp(params["log_depth"])

    def _im_poses(self, params) -> jnp.ndarray:
        return params_to_pose(params["poses"])

    def _pw_scale(self, params) -> jnp.ndarray:
        logs = params["pw_poses"][:, 7]
        norm = jnp.exp(jnp.log(self.cfg.base_scale) - jnp.mean(logs))
        return jnp.exp(logs) * norm

    def _pw_sim3(self, params) -> jnp.ndarray:
        """Per-window sim3 as 4x4 with rows [:3] scaled (base_opt_group:316-320)."""
        RT = params_to_pose(params["pw_poses"][:, :7])
        s = self._pw_scale(params)
        return RT.at[:, :3].multiply(s[:, None, None])

    def _pts3d_world(self, params) -> jnp.ndarray:
        """(N, P, 3) optimized global points: unproject + pose transform."""
        depth = self._depth(params)                       # (N, P)
        f = self._focals(params)[:, None, None]
        rel = jnp.concatenate(
            [
                depth[..., None] * (self.grid[None] - self.pp[:, None]) / f,
                depth[..., None],
            ],
            axis=-1,
        )
        poses = self._im_poses(params)
        return (
            jnp.einsum("nij,npj->npi", poses[:, :3, :3], rel) + poses[:, None, :3, 3]
        )

    @staticmethod
    def _safe_norm(x, axis=-1):
        """L2 norm with a finite gradient at 0 (jnp.linalg.norm's gradient
        is NaN at exactly 0 — hit by identical adjacent poses / perfectly
        matched points)."""
        return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-12)

    @classmethod
    def _rel_pose_loss(cls, RT1, RT2, translation_weight):
        """Frobenius(R_rel - I) + w*|t_rel| (optimizer_group.py:529-542)."""
        rel = jnp.einsum("nij,njk->nik", inv_se3(RT1), RT2)
        rot = jnp.sqrt(
            jnp.sum((rel[:, :3, :3] - jnp.eye(3)) ** 2, axis=(-2, -1)) + 1e-12
        )
        trans = cls._safe_norm(rel[:, :3, 3])
        return rot + translation_weight * trans

    # ---------------- loss ----------------

    def loss_fn(self, params, use_depth_traj: bool):
        cfg = self.cfg
        proj = self._pts3d_world(params)                       # (N, P, 3)
        pw = self._pw_sim3(params)                             # (G, 4, 4)
        pred = self.buf["pred_pts"]                            # (G, S, P, 3)
        aligned = (
            jnp.einsum("gij,gspj->gspi", pw[:, :3, :3], pred) + pw[:, None, None, :3, 3]
        )
        w = self.buf["weights"]
        if cfg.conf_optimize:
            w = jnp.minimum(w, cfg.conf_clamp)
        proj_e = proj[self.buf["e_all"]].reshape(self.G, self.S, self.P, 3)
        li = (
            jnp.sum(self._safe_norm(proj_e - aligned) * w) / self.total_area
        )

        depth_loss = 0.0
        traj_loss = 0.0
        if use_depth_traj and self.has_depth:
            depth = self._depth(params)
            inv_pred = 1.0 / (depth + 1e-6)
            inv_pred_e = inv_pred[self.buf["e_all"]].reshape(self.G, self.S, self.P)
            dmask = (self.buf["invdepth"] > cfg.invdepth_valid_thr).astype(jnp.float32)
            dmask = dmask * self.valid_depth_group[:, None, None]
            scaled = (
                self.buf["invdepth"] * params["s_depth"][:, None, None]
                + params["t_depth"][:, None, None]
            )
            depth_loss = (
                jnp.sum(jnp.abs(inv_pred_e - scaled) * dmask) / self.total_area
            ) * cfg.depth_loss_weight

        if use_depth_traj and self.has_traj:
            scale = jnp.exp(params["traj_align"][:, 7])        # (G,)
            RT = params_to_pose(params["traj_align"][:, :7])   # (G, 4, 4)
            traj = self.buf["trajs"]                           # (G, S, 4, 4)
            traj = traj.at[:, :, :3, 3].multiply(scale[:, None, None])
            moved = jnp.einsum("gij,gsjk->gsik", RT, traj)
            poses_e = self._im_poses(params)[self.buf["e_all"]].reshape(
                self.G, self.S, 4, 4
            )
            per = self._rel_pose_loss(
                moved.reshape(-1, 4, 4),
                poses_e.reshape(-1, 4, 4),
                cfg.translation_weight,
            ).reshape(self.G, self.S)
            traj_loss = (
                jnp.sum(per * self.valid_traj_group[:, None]) * cfg.traj_loss_weight
            )

        smooth = 0.0
        if cfg.temporal_smoothing_weight > 0:
            poses = self._im_poses(params)
            smooth = cfg.temporal_smoothing_weight * jnp.sum(
                self._rel_pose_loss(poses[:-1], poses[1:], cfg.translation_weight)
            )

        return li + depth_loss + traj_loss + smooth

    # ---------------- optimization ----------------

    def _lr_at(self, step: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        t = step / cfg.n_iter
        if cfg.schedule == "cosine":
            return cfg.lr_min + (cfg.lr - cfg.lr_min) * 0.5 * (1 + jnp.cos(jnp.pi * t))
        return cfg.lr + (cfg.lr_min - cfg.lr) * t  # linear

    def _grad_mask(self) -> Dict[str, jnp.ndarray]:
        """Per-leaf trainability (focal freezing, s/t fixed between calibs)."""
        m = {k: jnp.ones_like(v) for k, v in self.params.items()}
        if self.focal_frozen:
            m["focal"] = jnp.zeros_like(self.params["focal"])
        # s_depth/t_depth are set by calibration, not by gradient
        m["s_depth"] = jnp.zeros_like(self.params["s_depth"])
        m["t_depth"] = jnp.zeros_like(self.params["t_depth"])
        return m

    def run(self, verbose: bool = False) -> float:
        """Two-phase optimization: [0, start) point-map only; calibration;
        [start, n_iter) with disparity + trajectory anchoring."""
        cfg = self.cfg
        start = min(cfg.depth_traj_start_iter, cfg.n_iter)
        opt = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.9),
            optax.scale(-1.0),
        )
        opt_state = opt.init(self.params)
        mask = self._grad_mask()

        def make_phase(use_depth_traj: bool):
            loss = lambda p: self.loss_fn(p, use_depth_traj)
            grad_fn = jax.value_and_grad(loss)

            def step_fn(carry, it):
                params, opt_state = carry
                val, g = grad_fn(params)
                g = jax.tree_util.tree_map(lambda gi, mi: gi * mi, g, mask)
                updates, opt_state = opt.update(g, opt_state)
                lr = self._lr_at(it)
                params = jax.tree_util.tree_map(
                    lambda p, u: p + lr * u, params, updates
                )
                return (params, opt_state), val

            return jax.jit(
                lambda params, opt_state, iters: jax.lax.scan(
                    step_fn, (params, opt_state), iters
                )
            )

        phase1 = make_phase(False)
        (self.params, opt_state), losses1 = phase1(
            self.params, opt_state, jnp.arange(start, dtype=jnp.float32)
        )

        if self.has_depth or self.has_traj:
            self.calibrate()
        if verbose:
            print(f"[aligner] phase1 loss {float(losses1[-1]):.5f}")

        if cfg.n_iter > start:
            phase2 = make_phase(True)
            (self.params, opt_state), losses2 = phase2(
                self.params, opt_state,
                jnp.arange(start, cfg.n_iter, dtype=jnp.float32),
            )
            final = float(losses2[-1])
        else:
            final = float(losses1[-1]) if start > 0 else 0.0
        if verbose:
            print(f"[aligner] final loss {final:.5f}")
        return final

    # ---------------- iter-150 calibration ----------------

    def calibrate(self):
        """Per-group disparity (s,t) via batched lad2 + trajectory origin
        alignment with validity gating (_set_st_depth/_set_traj parity)."""
        cfg = self.cfg
        if self.has_depth:
            depth = np.asarray(self._depth(self.params))
            inv_opt = 1.0 / (depth + 1e-6)
            inv_opt_g = inv_opt[self.groups.reshape(-1)].reshape(self.G, -1)
            pred_g = np.asarray(self.buf["invdepth"]).reshape(self.G, -1)
            w_g = np.asarray(self.buf["weights"]).reshape(self.G, -1)
            mask = (w_g > cfg.weight_valid_thr) & (pred_g > cfg.invdepth_valid_thr)

            s_list, t_list, valid = [], [], []
            for g in range(self.G):
                best = None
                for lr in (1e-2, 1e-4, 1e-3):
                    s, t = lad2_align(
                        jnp.asarray(pred_g[g]), jnp.asarray(inv_opt_g[g]),
                        jnp.asarray(mask[g]), lr=lr, max_iters=3000,
                    )
                    s, t = float(s), float(t)
                    al = pred_g[g] * s + t
                    m = mask[g]
                    ratio = np.maximum(
                        np.clip(al[m], 1e-8, None) / np.clip(inv_opt_g[g][m], 1e-8, None),
                        np.clip(inv_opt_g[g][m], 1e-8, None) / np.clip(al[m], 1e-8, None),
                    )
                    delta = float(np.mean(ratio < 1.25)) if m.any() else 0.0
                    if best is None or delta > best[0]:
                        best = (delta, s, t)
                    if best[0] >= 0.8:
                        break
                delta, s, t = best
                s_list.append(s)
                t_list.append(t)
                valid.append(1.0 if delta >= cfg.delta_valid_thr else 0.0)
            self.params["s_depth"] = jnp.asarray(s_list, jnp.float32)
            self.params["t_depth"] = jnp.asarray(t_list, jnp.float32)
            self.valid_depth_group = jnp.asarray(valid, jnp.float32)

        if self.has_traj:
            im_poses = np.asarray(self._im_poses(self.params))
            pw_scale = np.asarray(self._pw_scale(self.params))
            trajs = np.asarray(self.buf["trajs"])
            ta = np.asarray(self.params["traj_align"]).copy()
            valid = np.zeros((self.G,), np.float32)
            for g in range(self.G):
                traj = trajs[g].copy()
                traj[:, :3, 3] *= pw_scale[g]
                est = Trajectory.from_matrices(traj)
                ref = Trajectory.from_matrices(im_poses[self.groups[g]])
                try:
                    _, _, rpe_rot, P, _ = align_trajectory_with_eval(est, ref)
                except Exception:
                    continue
                p7 = np.asarray(pose_to_params(jnp.asarray(P, jnp.float32)))
                ta[g, :7] = p7
                ta[g, 7] = np.log(max(pw_scale[g], 1e-8))
                if rpe_rot < cfg.rpe_rot_valid_deg:
                    valid[g] = 1.0
            self.params["traj_align"] = jnp.asarray(ta)
            self.valid_traj_group = jnp.asarray(valid)

    # ---------------- presets (known intrinsics/poses) ----------------

    def preset_focal(self, focals, requires_grad: bool = False):
        f = np.asarray(focals, np.float32).reshape(-1)
        if self.cfg.shared_focal:
            f = f[:1]
        self.params["focal"] = jnp.asarray(self.cfg.focal_break * np.log(f))
        self.focal_frozen = not requires_grad

    def set_pose(self, idx: int, c2w: np.ndarray):
        p7 = pose_to_params(jnp.asarray(c2w, jnp.float32))
        self.params["poses"] = self.params["poses"].at[idx].set(p7)

    def set_pw_pose(self, g: int, s: float, R: np.ndarray, t: np.ndarray):
        q7 = pose_to_params(
            jnp.asarray(
                np.block([[R, np.asarray(t).reshape(3, 1)], [np.zeros((1, 3)), 1]]),
                jnp.float32,
            )
        )
        row = jnp.concatenate([q7, jnp.asarray([np.log(max(s, 1e-8))], jnp.float32)])
        self.params["pw_poses"] = self.params["pw_poses"].at[g].set(row)

    def set_depthmap(self, idx: int, depth: np.ndarray):
        d = np.nan_to_num(np.asarray(depth, np.float32).reshape(-1), nan=1.0,
                          posinf=1e4, neginf=1e-6)
        d = np.log(np.clip(d, 1e-6, 1e6))
        self.params["log_depth"] = self.params["log_depth"].at[idx].set(
            jnp.asarray(d)
        )

    # ---------------- outputs (results-dir contract) ----------------

    def get_focals(self) -> np.ndarray:
        return np.asarray(self._focals(self.params))

    def get_intrinsics(self) -> np.ndarray:
        f = self.get_focals()
        K = np.tile(np.eye(3), (self.N, 1, 1)).astype(np.float32)
        K[:, 0, 0] = f
        K[:, 1, 1] = f
        K[:, 0, 2] = self.W / 2
        K[:, 1, 2] = self.H / 2
        return K

    def get_im_poses(self) -> np.ndarray:
        return np.asarray(self._im_poses(self.params))

    def get_depthmaps(self) -> np.ndarray:
        return np.asarray(self._depth(self.params)).reshape(self.N, self.H, self.W)

    def get_pts3d(self) -> np.ndarray:
        return np.asarray(self._pts3d_world(self.params)).reshape(
            self.N, self.H, self.W, 3
        )

    def get_conf(self) -> np.ndarray:
        return self.im_conf.reshape(self.N, self.H, self.W)

    def get_init_conf(self) -> np.ndarray:
        return self.init_conf.reshape(self.N, self.H, self.W)

    def get_masks(self) -> np.ndarray:
        return self.get_conf() > self.cfg.min_conf_thr

    def get_tum_poses(self) -> np.ndarray:
        return Trajectory.from_matrices(self.get_im_poses()).to_tum()
