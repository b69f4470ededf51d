"""Cross-check evals/depth.py against the GENUINE reference metric code.

The oracle is /root/reference/dust3r/depth_eval.py `depth_evaluation`
(:147-340) — plain torch+scipy that runs on this box — imported via
tests/_refstubs.py, NOT re-transcribed. Covers all four alignment modes
(lad2 Adam :112-145, lstsq, Weiszfeld scale :232-259, median) and both
benchmark rule sets (kitti: max_depth=None + default-lr lad2; others:
max_depth=70 + post_clip_max=70 + lr=1e-2/5000 iters + pnt-validity
align_mask — scripts/evaluation/infer_geo4d.py:535-540), plus the
error-parity map and the valid-pixel-weighted sequence averaging
(infer_geo4d.py:614-625). VERDICT r4 "next round" item 3: the metric
layer was the last numeric layer pinned only by self-authored fixtures.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
import _refstubs  # noqa: E402

_refstubs.install()

import jax  # noqa: E402

from geo4d_tpu.evals.depth import depth_evaluation  # noqa: E402

pytestmark = pytest.mark.slow

METRIC_KEYS = ("Abs Rel", "Sq Rel", "RMSE", "Log RMSE",
               "δ < 1.25", "δ < 1.25^2", "δ < 1.25^3")


def _ref_depth_evaluation(*args, **kwargs):
    from dust3r.depth_eval import depth_evaluation as ref_fn

    return ref_fn(*args, **kwargs)


def _synthetic(seed=0, t=4, h=24, w=32, scale=0.8, shift=1.5, noise=0.05,
               max_gt=60.0, invalid_frac=0.1, outlier_frac=0.03):
    """GT depth with zeros (invalid) + a few >70 m outliers; prediction is an
    affine remap of GT plus noise — so every alignment mode has a
    well-defined optimum and the δ metrics land strictly inside (0, 1)."""
    rng = np.random.default_rng(seed)
    gt = rng.uniform(0.5, max_gt, size=(t, h, w)).astype(np.float32)
    gt[rng.uniform(size=gt.shape) < invalid_frac] = 0.0
    far = rng.uniform(size=gt.shape) < outlier_frac
    gt[far] = rng.uniform(75.0, 120.0, size=int(far.sum()))
    pred = scale * gt + shift + rng.normal(scale=noise, size=gt.shape)
    pred = np.abs(pred).astype(np.float32)
    return pred, gt


def _assert_metrics_close(ours, ref, rtol, keys=METRIC_KEYS):
    assert ours["valid_pixels"] == ref["valid_pixels"]
    for key in keys:
        a, b = ours[key], ref[key]
        assert a == pytest.approx(b, rel=rtol, abs=rtol), (
            f"{key}: ours {a} vs reference {b}"
        )


def _run_both(pred, gt, align, tol, **kw):
    """Run ours + reference with equivalent flags on CPU, compare."""
    ref_kw = dict(kw)
    if align not in ("lad2", "lstsq"):
        # the reference's return_st path reads s/t that the scale/median
        # branches never define (depth_eval.py:355-357 NameError)
        ref_kw.pop("return_st", None)
    align_flag = {
        "lad2": "align_with_lad2", "lstsq": "align_with_lstsq",
        "scale": "align_with_scale",
    }.get(align)
    ref_flags = {align_flag: True} if align_flag else {}
    ref_out = _ref_depth_evaluation(
        pred.copy(), gt.copy(), use_gpu=False, **ref_flags, **ref_kw
    )
    ref_metrics = ref_out[0]

    our_kw = dict(kw)
    our_kw.pop("return_st", None)
    with jax.default_device(jax.devices("cpu")[0]):
        ours = depth_evaluation(
            pred, gt, align=align, return_st=kw.get("return_st", False),
            **{k: v for k, v in our_kw.items() if k != "return_st"},
        )
    _assert_metrics_close(ours, ref_metrics, tol)
    return ours, ref_out


def test_lad2_kitti_rule():
    """kitti: max_depth=None, lad2 at the default lr/iters, no masks
    (infer_geo4d.py:537-538)."""
    pred, gt = _synthetic(seed=1)
    ours, ref_out = _run_both(
        pred, gt, "lad2", tol=2e-3, max_depth=None, return_st=True,
    )
    ref_metrics = ref_out[0]
    assert ours["s"] == pytest.approx(float(ref_metrics["s"]), rel=5e-3)
    assert ours["t"] == pytest.approx(float(ref_metrics["t"]), abs=5e-3)


def test_lad2_nonkitti_rule_with_align_mask():
    """sintel/bonn/tum rule: max 70 m, post_clip_max=70, lr=1e-2, 5000
    iters, alignment restricted to the pnt-validity mask while metrics use
    every valid GT pixel (infer_geo4d.py:535-540)."""
    import torch

    pred, gt = _synthetic(seed=2)
    rng = np.random.default_rng(3)
    align_mask = rng.uniform(size=gt.shape) > 0.4

    ref_metrics, ref_err, _, _ = _ref_depth_evaluation(
        pred.copy(), gt.copy(), max_depth=70, align_with_lad2=True,
        use_gpu=False, post_clip_max=70, lr=1e-2, max_iters=5000,
        align_mask=torch.from_numpy(
            align_mask.reshape(-1, gt.shape[-1])
        ),
    )
    with jax.default_device(jax.devices("cpu")[0]):
        ours, err = depth_evaluation(
            pred, gt, max_depth=70.0, align="lad2", align_mask=align_mask,
            lr=1e-2, max_iters=5000, post_clip_max=70.0,
            return_error_map=True,
        )
    _assert_metrics_close(ours, ref_metrics, rtol=2e-3)
    # error-parity map (written as PNGs by the eval loop,
    # infer_geo4d.py:541-544): zero outside valid, |s·pred+t − gt|/gt inside
    ref_err = ref_err.numpy().reshape(gt.shape)
    np.testing.assert_allclose(err, ref_err, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("align,tol", [("lstsq", 1e-4), ("median", 1e-4),
                                       ("scale", 5e-3)])
def test_closed_form_alignments(align, tol):
    """lstsq normal equations and torch-convention lower-median scaling
    match to f32 exactness-ish. The 10-step Weiszfeld ('scale') is fp-
    chaotic — IRLS weights 1/|r| amplify f32 summation-order differences
    near zero-crossing residuals — so it gets a looser metric tolerance
    plus an objective-quality gate: our scale must fit the L1 objective as
    well as the reference's (within 0.1%)."""
    pred, gt = _synthetic(seed=4)
    ours, ref_out = _run_both(
        pred, gt, align, tol=tol, max_depth=80, return_st=True,
    )
    if align == "scale":
        valid = (gt > 0) & (gt < 80)
        # ref's fitted scale, recovered from its returned aligned map
        # (predict_depth_map_full = pred_original * s, depth_eval.py:322-330)
        ref_aligned = ref_out[2].numpy().reshape(gt.shape)
        l1_ref = float(np.sum(np.abs(ref_aligned[valid] - gt[valid])))
        l1_ours = float(
            np.sum(np.abs(ours["s"] * pred[valid] - gt[valid]))
        )
        assert l1_ours <= 1.001 * l1_ref


def test_custom_mask_metrics_only():
    """custom_mask restricts METRICS; alignment still fits on all valid
    pixels (reference applies custom_mask after alignment,
    depth_eval.py:296-300). A fit on the masked subset would shift every
    metric here because the mask is depth-biased."""
    import torch

    pred, gt = _synthetic(seed=5)
    mask = gt < 30.0  # depth-biased mask: fit-set choice becomes visible

    ref_metrics, _, _, _ = _ref_depth_evaluation(
        pred.copy(), gt.copy(), max_depth=80, align_with_lad2=True,
        use_gpu=False, custom_mask=torch.from_numpy(
            mask.reshape(-1, gt.shape[-1])
        ),
    )
    with jax.default_device(jax.devices("cpu")[0]):
        ours = depth_evaluation(
            pred, gt, max_depth=80.0, align="lad2", custom_mask=mask,
        )
    _assert_metrics_close(ours, ref_metrics, rtol=2e-3)


def test_weighted_average_rule():
    """Per-dataset aggregation = valid-pixel-weighted mean over sequences
    (infer_geo4d.py:614-625). Fixture pins the exact expression the CLI
    uses (cli/evaluate.py:253-257) against np.average semantics."""
    rows = [
        {"Abs Rel": 0.12, "valid_pixels": 1000},
        {"Abs Rel": 0.30, "valid_pixels": 250},
        {"Abs Rel": 0.05, "valid_pixels": 4000},
    ]
    expected = np.average(
        [r["Abs Rel"] for r in rows],
        weights=[r["valid_pixels"] for r in rows],
    )
    weights = np.asarray([r["valid_pixels"] for r in rows], np.float64)
    weights /= weights.sum()
    ours = float(sum(w * r["Abs Rel"] for w, r in zip(weights, rows)))
    assert ours == pytest.approx(float(expected), rel=1e-12)
    assert ours == pytest.approx(0.07524, abs=1e-4)
