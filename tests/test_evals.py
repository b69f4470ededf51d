"""Depth + trajectory metric tests on synthetic data."""

import numpy as np
import pytest
import jax.numpy as jnp

from geo4d_tpu.evals.depth import (
    depth_evaluation,
    lad2_align,
    lstsq_align,
    scale_only_irls,
)
from geo4d_tpu.evals import trajectory
from geo4d_tpu.evals.trajectory import (
    Trajectory,
    align_trajectory_with_eval,
    ape_translation_rmse,
    eval_metrics,
    rpe,
    quat_wxyz_to_rotmat,
    rotmat_to_quat_wxyz,
)

pytestmark = pytest.mark.smoke  # CPU-light fast tier


def make_traj(n=20, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    ts = np.arange(n, dtype=np.float64)
    pos = np.cumsum(rng.normal(scale=0.3, size=(n, 3)), axis=0)
    rots = []
    R = np.eye(3)
    for _ in range(n):
        w = rng.normal(scale=0.05, size=3)
        Wx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        from scipy.linalg import expm

        R = R @ expm(Wx)
        rots.append(R.copy())
    if noise:
        pos = pos + rng.normal(scale=noise, size=pos.shape)
    return Trajectory(pos, np.stack(rots), ts)


def test_quat_roundtrip_traj(rng):
    t = make_traj(8)
    q = rotmat_to_quat_wxyz(t.rotations)
    R2 = quat_wxyz_to_rotmat(q)
    assert np.allclose(R2, t.rotations, atol=1e-8)


def test_tum_roundtrip():
    t = make_traj(10)
    t2 = Trajectory.from_tum(t.to_tum())
    assert np.allclose(t2.positions, t.positions, atol=1e-8)
    assert np.allclose(t2.rotations, t.rotations, atol=1e-8)


def test_ate_zero_for_sim3_transformed():
    """ATE with sim3 alignment is invariant to a global sim3."""
    t = make_traj(20)
    T = np.eye(4)
    ang = 0.7
    T[:3, :3] = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    )
    T[:3, 3] = [3, -1, 2]
    t2 = t.transformed(T, scale=2.0)
    ate, rpe_t, rpe_r = eval_metrics(t2, t)
    assert ate == pytest.approx(0.0, abs=1e-6)
    assert rpe_t == pytest.approx(0.0, abs=1e-6)
    assert rpe_r == pytest.approx(0.0, abs=1e-5)


def test_ate_measures_noise():
    t = make_traj(50)
    t_noisy = make_traj(50, noise=0.05)
    ate, _, _ = eval_metrics(t_noisy, t)
    assert 0.005 < ate < 0.2


def test_align_origin():
    t = make_traj(10)
    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]
    t2 = t.transformed(T)
    ate, rpe_t, rpe_r, P, aligned = align_trajectory_with_eval(t2, t)
    assert ate == pytest.approx(0.0, abs=1e-8)
    assert np.allclose(aligned.positions, t.positions, atol=1e-8)
    assert np.allclose(P @ T, np.eye(4), atol=1e-8)


def test_rpe_detects_relative_error():
    t = make_traj(30)
    # corrupt one relative motion
    pos = t.positions.copy()
    pos[15:] += np.array([0.5, 0, 0]) @ np.eye(3)
    t_bad = Trajectory(pos, t.rotations, t.timestamps)
    rpe_t_bad, _ = rpe(t_bad, t, align=False)
    assert rpe_t_bad > 0.05


# ---------------- depth ----------------

def test_lad2_recovers_scale_shift(rng):
    gt = rng.uniform(1, 10, size=2000).astype(np.float32)
    pred = (gt - 0.5) / 2.0
    s, t = lad2_align(jnp.asarray(pred), jnp.asarray(gt),
                      jnp.ones(2000, bool), lr=1e-2, max_iters=3000)
    assert float(s) == pytest.approx(2.0, rel=0.05)
    assert float(t) == pytest.approx(0.5, abs=0.1)


def test_lstsq_align_exact(rng):
    gt = rng.uniform(1, 10, size=500).astype(np.float32)
    pred = (gt - 1.5) / 3.0
    s, t = lstsq_align(jnp.asarray(pred), jnp.asarray(gt), jnp.ones(500, bool))
    assert float(s) == pytest.approx(3.0, rel=1e-4)
    assert float(t) == pytest.approx(1.5, abs=1e-3)


def test_scale_only(rng):
    gt = rng.uniform(1, 10, size=500).astype(np.float32)
    pred = gt / 4.0
    s, t = scale_only_irls(jnp.asarray(pred), jnp.asarray(gt), jnp.ones(500, bool))
    assert float(s) == pytest.approx(4.0, rel=1e-3)


def test_depth_evaluation_perfect(rng):
    gt = rng.uniform(1, 30, size=(4, 16, 16)).astype(np.float32)
    out = depth_evaluation(gt * 2.0 + 1.0, gt, align="lstsq")
    assert out["Abs Rel"] == pytest.approx(0.0, abs=1e-5)
    assert out["δ < 1.25"] == pytest.approx(1.0)


def test_depth_evaluation_masking(rng):
    gt = rng.uniform(1, 30, size=1000).astype(np.float32)
    gt[::3] = 0.0  # invalid
    pred = gt.copy()
    out = depth_evaluation(pred, gt, align="none")
    assert out["valid_pixels"] == int((gt > 0).sum())
    assert out["Abs Rel"] == pytest.approx(0.0, abs=1e-6)


def test_depth_evaluation_post_clip_and_error_map(rng):
    """post_clip_max clamps the aligned prediction before metrics
    (depth_eval.py:291-296); the error parity map is |aligned - gt|/gt on
    valid pixels, zero elsewhere (depth_eval.py:322-340)."""
    gt = rng.uniform(1, 30, size=(2, 8, 8)).astype(np.float32)
    gt[0, 0, 0] = 0.0  # one invalid pixel
    pred = gt.copy()
    pred[1, 3, 3] = 500.0  # an outlier the post-clip must tame
    out, err = depth_evaluation(
        pred, gt, align="none", post_clip_max=70.0, return_error_map=True
    )
    assert err.shape == gt.shape
    assert err[0, 0, 0] == 0.0  # invalid pixel zeroed
    # outlier error present in the (unclipped) map
    assert err[1, 3, 3] > 1.0
    # but metrics saw the clipped value: max error bounded by clip
    n_valid = out["valid_pixels"]
    max_contrib = (70.0 - gt[1, 3, 3]) ** 2 / gt[1, 3, 3]
    assert out["Sq Rel"] <= max_contrib / n_valid * n_valid + 1e-3


def test_depth_evaluation_align_mask_fit_subset(rng):
    """align_mask restricts the alignment fit but NOT the metric pixels
    (infer_geo4d.py:537-540 semantics)."""
    gt = rng.uniform(1, 10, size=4000).astype(np.float32)
    pred = gt / 2.0
    # corrupt the second half of predictions; align only on the clean half
    pred[2000:] *= 10
    amask = np.zeros(4000, bool)
    amask[:2000] = True
    out = depth_evaluation(pred, gt, align="lstsq", align_mask=amask)
    # fit recovered s=2 from the clean half -> clean half has ~0 error,
    # corrupted half has large error; metrics cover ALL pixels
    assert out["valid_pixels"] == 4000
    assert 0.3 < out["Abs Rel"]          # corrupted half included in metrics
    assert out["δ < 1.25"] == pytest.approx(0.5, abs=0.05)


def test_lad_irls_matches_l1_optimum():
    """IRLS reaches the same L1 objective the Adam lad2 sweep approximates,
    and stays robust to asymmetric outliers (where least-squares fails)."""
    import jax.numpy as jnp

    from geo4d_tpu.evals.depth import lad2_align, lad_align_irls, lstsq_align

    rng = np.random.default_rng(0)
    n = 4000
    pred = rng.uniform(0.5, 2.0, n).astype(np.float32)
    gt = (1.7 * pred + 0.3).astype(np.float32)
    # 10% large one-sided outliers
    idx = rng.choice(n, n // 10, replace=False)
    gt[idx] += rng.uniform(5, 10, len(idx)).astype(np.float32)
    mask = np.ones(n, bool)

    def l1(s, t):
        return float(np.abs(float(s) * pred + float(t) - gt).sum())

    s_i, t_i = lad_align_irls(jnp.asarray(pred), jnp.asarray(gt),
                              jnp.asarray(mask))
    s_a, t_a = lad2_align(jnp.asarray(pred), jnp.asarray(gt),
                          jnp.asarray(mask), lr=1e-2, max_iters=3000)
    # IRLS lands at (or below) the Adam approximation of the same optimum
    assert l1(s_i, t_i) <= l1(s_a, t_a) * 1.01
    # and recovers the inlier line despite the outliers
    assert float(s_i) == pytest.approx(1.7, abs=0.05)
    assert float(t_i) == pytest.approx(0.3, abs=0.1)
    # least squares does NOT (sanity that the test is discriminative)
    s_l, t_l = lstsq_align(jnp.asarray(pred), jnp.asarray(gt),
                           jnp.asarray(mask))
    assert abs(float(s_l) - 1.7) + abs(float(t_l) - 0.3) > 0.3


# ---- evo-pinning golden fixtures (VERDICT r2 item 4) -----------------------
# evals/trajectory.py replaces the reference's evo-based vo_eval.py:174-257.
# evo cannot be installed in-env, so these fixtures pin the SEMANTICS with
# synthetic trajectories whose sim3-APE RMSE / delta-1 RPE have closed-form
# values derived independently inside each test (stationarity of the Umeyama
# objective). Any silent statistic change (rmse vs mean, scale handling,
# all-pairs handling) breaks an exact 1e-9 assertion here.

_HEX_DIRS = np.array([
    [1.0, 0, 0], [-1.0, 0, 0], [0, 1.0, 0],
    [0, -1.0, 0], [0, 0, 1.0], [0, 0, -1.0],
])  # zero-mean, covariance = (1/3) I: Umeyama cov is full-rank & isotropic


def _traj(positions, rotations=None):
    n = len(positions)
    R = np.tile(np.eye(3), (n, 1, 1)) if rotations is None else rotations
    return trajectory.Trajectory(
        np.asarray(positions, float), np.asarray(R, float), np.arange(n)
    )


def test_golden_ate_closed_form_residual():
    """est = ref + eps*n with n chosen so (s*, R*, t*) are analytic:
    sum(n)=0 and sum(x n^T)=0 force R*=I, t*=0 and
    s* = tr(cov) / var(est);  ATE^2 = (s-1)^2 mean|x|^2 + s^2 eps^2 mean|n|^2.
    Pins: statistic is RMSE (the mean of |err| differs), alignment is sim3
    with the scale from the SOURCE variance (evo umeyama_alignment)."""
    x = _HEX_DIRS
    n = np.array([
        [0, 0, 1.0], [0, 0, 1.0],      # n1 == n2  (kills e1 row of sum x n^T)
        [0, 0, -1.0], [0, 0, -1.0],    # n3 == n4
        [0, 0, 0], [0, 0, 0],          # n5 == n6; n1+n3+n5 == 0 (sum n = 0)
    ])
    eps = 0.1
    est = _traj(x + eps * n)
    ref = _traj(x)
    # independent closed form
    var_est = np.sum((x + eps * n) ** 2) / len(x)      # 6.04/6
    s = np.sum(x * x) / len(x) / var_est               # tr(D)/sigma^2_src
    expected_sq = ((s - 1) ** 2 * np.mean(np.sum(x**2, 1))
                   + s**2 * eps**2 * np.mean(np.sum(n**2, 1)))
    ate = trajectory.ape_translation_rmse(est, ref)
    assert abs(ate - np.sqrt(expected_sq)) < 1e-9
    # and it is NOT the mean statistic: per-point errors differ in magnitude
    errs = np.linalg.norm(s * (x + eps * n) - x, axis=1)
    assert abs(np.mean(errs) - ate) > 1e-4


def test_golden_rpe_pure_rotation():
    """ref: identity rotations on a non-degenerate position set; est: same
    positions, rotations Rz(i*theta). Positions equal => sim3 alignment is
    exactly identity => every delta-1 pair has rotation error theta and
    translation error |(Rz(-i*theta)-I) dp_i| = 2|sin(i*theta/2)| |dp_xy|."""
    theta = 0.05
    pos = _HEX_DIRS + 0.1 * np.arange(6)[:, None]  # break any symmetry
    n = len(pos)

    def Rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    est_R = np.stack([Rz(i * theta) for i in range(n)])
    est = _traj(pos, est_R)
    ref = _traj(pos)
    rpe_trans, rpe_rot = trajectory.rpe(est, ref, delta=1)
    assert abs(rpe_rot - np.degrees(theta)) < 1e-9  # exact: all pairs equal

    dp = np.diff(pos, axis=0)
    per_pair = [
        np.linalg.norm((Rz(-(i) * theta) - np.eye(3)) @ dp[i])
        for i in range(n - 1)
    ]
    # cross-check the geometric identity used for the closed form
    for i in range(n - 1):
        assert abs(
            per_pair[i]
            - 2 * abs(np.sin(i * theta / 2)) * np.linalg.norm(dp[i][:2])
        ) < 1e-12
    assert abs(rpe_trans - np.sqrt(np.mean(np.square(per_pair)))) < 1e-9


def test_golden_rpe_rmse_not_mean():
    """Alternating step angles theta1/theta2 about z on equal positions:
    RPE-rot must be sqrt(mean(theta_i^2)), not mean(theta_i)."""
    th = np.array([0.02, 0.08, 0.02, 0.08, 0.02])  # 5 deltas, 6 poses
    pos = _HEX_DIRS + 0.1 * np.arange(6)[:, None]

    def Rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    angles = np.concatenate([[0.0], np.cumsum(th)])
    est = _traj(pos, np.stack([Rz(a) for a in angles]))
    ref = _traj(pos)
    _, rpe_rot = trajectory.rpe(est, ref, delta=1)
    rmse = np.degrees(np.sqrt(np.mean(th**2)))
    mean = np.degrees(np.mean(th))
    assert abs(rpe_rot - rmse) < 1e-9
    assert abs(rpe_rot - mean) > 1e-3


def test_golden_align_origin_scale_unfixed():
    """align_trajectory_with_eval (vo_eval.py:266-...) is SE3 origin
    alignment — it must NOT correct scale: est = k*ref =>
    ATE = |k-1| * rms(p_i - p_0)."""
    k = 1.5
    pos = np.cumsum(_HEX_DIRS, axis=0)  # a walk, p_0 != 0
    ref = _traj(pos)
    est = _traj(k * pos)
    ate, _, _, P, aligned = trajectory.align_trajectory_with_eval(est, ref)
    np.testing.assert_allclose(aligned.positions[0], pos[0], atol=1e-12)
    expected = abs(k - 1) * np.sqrt(np.mean(
        np.sum((pos - pos[0]) ** 2, axis=1)
    ))
    assert abs(ate - expected) < 1e-9
