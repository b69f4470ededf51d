"""Import-time stubs that let the GENUINE reference code at /root/reference
run on this CPU-only box as a cross-check oracle.

The reference depends on packages absent here (pytorch_lightning, torchvision,
open_clip, decord, roma, evo, trimesh, omegaconf, pytorch3d, ipdb). For the
end-to-end pipeline cross-check (tests/test_xcheck_pipeline.py) we want to run
the reference's OWN ddpm3d/ddim/test_geo4d code — not a re-transcription — so
this module installs the minimal sys.modules stubs needed to *import* that
code, plus small functional implementations for the few stubbed symbols that
actually execute in the exercised paths:

  * pl.LightningModule        -> torch.nn.Module + .device property
  * roma                      -> quat/rigid-registration math (torch + scipy),
                                 self-tested in test_xcheck_pipeline.py
  * pytorch3d PerspectiveCameras -> plain R/T struct (the reference's
                                 cameras_from_plucker path only reads/writes
                                 .R/.T/.clone()/len(); utils/rays.py:330-366)
  * torchvision.transforms    -> functional ToTensor/Normalize/Compose

Everything else (evo, trimesh, decord, omegaconf, ...) is import-only: the
exercised code paths never call into it, so MagicMock suffices — and any
accidental call becomes a loud MagicMock leak instead of silent wrong math.

This file contains NO reference-derived code; the functional pieces are
textbook math (unit-quaternion <-> rotation matrix, weighted Umeyama).
"""

from __future__ import annotations

import sys
import types
from unittest import mock

REFERENCE_ROOT = "/root/reference"


# --------------------------------------------------------------------------
# functional pieces
# --------------------------------------------------------------------------


def _build_pl_stub():
    import torch

    pl = types.ModuleType("pytorch_lightning")

    class LightningModule(torch.nn.Module):
        @property
        def device(self):
            for p in self.parameters():
                return p.device
            return torch.device("cpu")

        # no-op PL API surface touched by ddpm3d at init/inference time
        def save_hyperparameters(self, *a, **k):
            pass

        def log(self, *a, **k):
            pass

        def log_dict(self, *a, **k):
            pass

    def rank_zero_only(fn):
        return fn

    def seed_everything(seed):
        import numpy as np

        torch.manual_seed(seed)
        np.random.seed(seed)

    pl.LightningModule = LightningModule
    pl.seed_everything = seed_everything
    utilities = types.ModuleType("pytorch_lightning.utilities")
    utilities.rank_zero_only = rank_zero_only
    pl.utilities = utilities
    return pl, utilities


def _build_torchvision_stub():
    import numpy as np
    import torch

    tv = types.ModuleType("torchvision")
    tv_utils = types.ModuleType("torchvision.utils")

    def make_grid(x, *a, **k):  # only used by training-time image logging
        return x

    tv_utils.make_grid = make_grid

    tv_tf = types.ModuleType("torchvision.transforms")

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic, dtype=np.float32)
            if arr.max() > 1.5:
                arr = arr / 255.0
            if arr.ndim == 2:
                arr = arr[..., None]
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, x):
            return (x - self.mean) / self.std

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    class Resize:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    for cls in (ToTensor, Normalize, Compose, Resize):
        setattr(tv_tf, cls.__name__, cls)
    tv.utils = tv_utils
    tv.transforms = tv_tf
    return tv, tv_utils, tv_tf


def _build_roma_stub():
    """Functional subset of roma used by the reference alignment code:
    RigidUnitQuat (differentiable, xyzw quats), rotmat_to_unitquat,
    rigid_points_registration (weighted Umeyama with scaling).

    Conventions follow roma's documented API: quaternions are XYZW;
    rigid_points_registration(x, y, weights, compute_scaling=True) returns
    (R, t, s) such that y ~= s * R @ x + t.
    """
    import torch

    roma = types.ModuleType("roma")

    def quat_normalize(q):
        return q / q.norm(dim=-1, keepdim=True)

    def unitquat_to_rotmat(q):
        # xyzw unit quaternion -> rotation matrix (differentiable)
        x, y, z, w = q.unbind(-1)
        xx, yy, zz = x * x, y * y, z * z
        xy, xz, yz = x * y, x * z, y * z
        wx, wy, wz = w * x, w * y, w * z
        row0 = torch.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1)
        row1 = torch.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1)
        row2 = torch.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1)
        return torch.stack([row0, row1, row2], -2)

    def rotmat_to_unitquat(R):
        from scipy.spatial.transform import Rotation

        arr = R.detach().cpu().numpy()
        q = Rotation.from_matrix(arr).as_quat()  # scipy returns xyzw
        return torch.as_tensor(q, dtype=R.dtype, device=R.device)

    class RigidUnitQuat:
        def __init__(self, linear, translation):
            self.linear = linear           # (..., 4) xyzw
            self.translation = translation  # (..., 3)

        def normalize(self):
            return RigidUnitQuat(quat_normalize(self.linear), self.translation)

        def to_homogeneous(self):
            R = unitquat_to_rotmat(self.linear)
            batch = R.shape[:-2]
            M = torch.zeros(*batch, 4, 4, dtype=R.dtype, device=R.device)
            M[..., :3, :3] = R
            M[..., :3, 3] = self.translation
            M[..., 3, 3] = 1.0
            return M

    def rigid_points_registration(x, y, weights=None, compute_scaling=False):
        """Weighted Umeyama: find (R, t[, s]) minimizing
        sum_i w_i || s R x_i + t - y_i ||^2."""
        x = x.reshape(-1, 3).double()
        y = y.reshape(-1, 3).double()
        if weights is None:
            w = torch.ones(x.shape[0], dtype=torch.float64, device=x.device)
        else:
            w = weights.reshape(-1).double().clamp_min(0)
        wsum = w.sum().clamp_min(1e-12)
        wn = w / wsum
        mx = (wn[:, None] * x).sum(0)
        my = (wn[:, None] * y).sum(0)
        xc = x - mx
        yc = y - my
        cov = (yc * wn[:, None]).T @ xc  # (3,3): sum w y x^T
        U, S, Vt = torch.linalg.svd(cov)
        d = torch.sign(torch.det(U @ Vt))
        D = torch.diag(torch.tensor([1.0, 1.0, d], dtype=torch.float64))
        R = U @ D @ Vt
        if compute_scaling:
            var_x = (wn * (xc**2).sum(-1)).sum()
            s = (S * torch.diag(D)).sum() / var_x.clamp_min(1e-12)
            t = my - s * (R @ mx)
            return (
                R.to(torch.float32),
                t.to(torch.float32),
                s.to(torch.float32),
            )
        t = my - R @ mx
        return R.to(torch.float32), t.to(torch.float32)

    roma.RigidUnitQuat = RigidUnitQuat
    roma.rotmat_to_unitquat = rotmat_to_unitquat
    roma.unitquat_to_rotmat = unitquat_to_rotmat
    roma.quat_normalize = quat_normalize
    roma.rigid_points_registration = rigid_points_registration
    return roma


def _build_pytorch3d_stub():
    import torch

    p3d = types.ModuleType("pytorch3d")
    renderer = types.ModuleType("pytorch3d.renderer")
    transforms = types.ModuleType("pytorch3d.transforms")

    class PerspectiveCameras:
        """Struct-only stand-in: the reference's cameras_from_plucker path
        (utils/rays.py:330-366) uses PerspectiveCameras purely as an R/T
        container (identity-initialized), never its projection math."""

        def __init__(self, focal_length=(1.0,), device="cpu", R=None, T=None):
            if isinstance(focal_length, (int, float)):
                focal_length = [focal_length]
            n = len(focal_length)
            self.focal_length = torch.as_tensor(
                [[f, f] if not hasattr(f, "__len__") else list(f) for f in focal_length],
                dtype=torch.float32, device=device,
            )
            self.R = (
                R if R is not None
                else torch.eye(3, device=device).expand(n, 3, 3).clone()
            )
            self.T = (
                T if T is not None
                else torch.zeros(n, 3, device=device)
            )
            self.device = torch.device(device)

        def __len__(self):
            return self.R.shape[0]

        def clone(self):
            c = PerspectiveCameras(device=self.device)
            c.focal_length = self.focal_length.clone()
            c.R = self.R.clone()
            c.T = self.T.clone()
            return c

    class RayBundle:  # imported, never constructed in the exercised path
        pass

    class Rotate:
        def __init__(self, *a, **k):
            raise NotImplementedError("pytorch3d stub: Rotate is import-only")

    class Translate:
        def __init__(self, *a, **k):
            raise NotImplementedError("pytorch3d stub: Translate is import-only")

    renderer.PerspectiveCameras = PerspectiveCameras
    renderer.RayBundle = RayBundle
    transforms.Rotate = Rotate
    transforms.Translate = Translate
    p3d.renderer = renderer
    p3d.transforms = transforms
    return p3d, renderer, transforms


class AttrDict(dict):
    """Minimal OmegaConf-like config node: dict + attribute access, used to
    feed the reference's instantiate_from_config / `cfg.params.x` idioms."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return AttrDict({k: AttrDict.wrap(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return [AttrDict.wrap(v) for v in obj]
        return obj


_installed = False


def install():
    """Install stubs + sys.path entries. Idempotent."""
    global _installed
    if _installed:
        return
    _installed = True

    pl, pl_utils = _build_pl_stub()
    tv, tv_utils, tv_tf = _build_torchvision_stub()
    p3d, p3d_renderer, p3d_transforms = _build_pytorch3d_stub()

    stubs = {
        "pytorch_lightning": pl,
        "pytorch_lightning.utilities": pl_utils,
        "torchvision": tv,
        "torchvision.utils": tv_utils,
        "torchvision.transforms": tv_tf,
        "roma": _build_roma_stub(),
        "pytorch3d": p3d,
        "pytorch3d.renderer": p3d_renderer,
        "pytorch3d.transforms": p3d_transforms,
    }
    # import-only stubs (never called in the exercised paths)
    for name in [
        "ipdb",
        "decord",
        "omegaconf",
        "trimesh",
        "evo",
        "evo.main_ape",
        "evo.main_rpe",
        "evo.core",
        "evo.core.sync",
        "evo.core.metrics",
        "evo.core.trajectory",
        "evo.core.geometry",
        "evo.tools",
        "evo.tools.file_interface",
        "evo.tools.plot",
        "open_clip",
        "kornia",
    ]:
        stubs[name] = mock.MagicMock(name=f"stub:{name}")

    for name, module in stubs.items():
        sys.modules.setdefault(name, module)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # make tests/ importable as top-level modules for instantiate_from_config
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    if here not in sys.path:
        sys.path.insert(0, here)


def patch_ddim_sampler_cpu():
    """The reference DDIMSampler.register_buffer force-moves buffers to CUDA
    (lvdm/models/samplers/ddim.py:19-22); retarget to plain attribute set so
    the sampler runs on CPU."""
    from lvdm.models.samplers import ddim, ddim_multiplecond

    def register_buffer(self, name, attr):
        setattr(self, name, attr)

    ddim.DDIMSampler.register_buffer = register_buffer
    ddim_multiplecond.DDIMSampler.register_buffer = register_buffer


def patch_vae_sample_to_mode():
    """Make the reference's VAE posterior sampling deterministic (mode):
    the JAX side mirrors this by encoding with key=None. Neutralizes the
    only RNG the two frameworks cannot share bit-for-bit besides x_T."""
    from lvdm.distributions import DiagonalGaussianDistribution

    DiagonalGaussianDistribution.sample = (
        lambda self, noise=None: self.mode()
    )
