"""Config registry, YAML compatibility, per-channel VAE paths, DDIM
inversion, preprocessing helpers."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from geo4d_tpu.core.registry import build_from_yaml, _register_all
from geo4d_tpu.core.config import components, instantiate

pytestmark = pytest.mark.smoke  # CPU-light fast tier


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_build_from_shipped_yaml():
    model, post = build_from_yaml(os.path.join(REPO, "configs/inference_geo4d.yaml"))
    assert model.unet.model_channels == 320
    assert model.unet.in_channels == 20
    assert model.unet.fs_condition is True
    assert model.pointmap_vae is not None
    assert model.pointmap_vae.with_adaptor is True
    assert model.vae.with_adaptor is False
    assert model.schedule.parameterization == "v"
    assert model.scale_factor == pytest.approx(0.18215)
    assert post["n_iter"] == 500
    assert post["temporal_smoothing_weight"] == pytest.approx(0.015)


def test_reference_target_aliases():
    _register_all()
    # the reference's dotted targets resolve to our constructors
    assert "lvdm.modules.networks.openaimodel3d.UNetModel" in components
    assert "lvdm.models.autoencoder.AutoencoderKL" in components
    unet = instantiate(
        {
            "target": "lvdm.modules.networks.openaimodel3d.UNetModel",
            "params": {"model_channels": 64, "channel_mult": [1, 2]},
        }
    )
    assert unet.model_channels == 64


def test_perchannel_vae_paths():
    from geo4d_tpu.models.presets import init_params, tiny

    T = 2
    model = tiny(temporal_length=T)
    params = init_params(model, jax.random.PRNGKey(0), (32, 32),
                         temporal_length=T, with_text=False)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, T, 32, 32, 3)), jnp.float32
    )
    z = jax.jit(lambda p, x: model.encode_first_stage_perchannel(p, x))(params, x)
    assert z.shape == (1, T, 4, 4, 12)  # 3 channels x 4 latent ch
    out = jax.jit(lambda p, z: model.decode_perchannel_conf(p, z))(params, z)
    assert out.shape == (1, T, 32, 32, 4)  # 3 recovered channels + conf


def test_ddim_inversion_roundtrip():
    """encode(x0) then sample with an oracle model ~ recovers x0."""
    from geo4d_tpu.core.schedules import DiffusionSchedule
    from geo4d_tpu.sampling.ddim import DDIMTables, ddim_encode, ddim_sample

    sched = DiffusionSchedule.create(
        use_dynamic_rescale=False, rescale_betas_zero_snr=False
    )
    tables = DDIMTables.from_schedule(sched, 20, "uniform", 0.0)
    x0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 2, 4, 4, 3)), jnp.float32
    )
    abar = jnp.asarray(sched.sqrt_alphas_cumprod)
    sb = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)

    def oracle(x, t, branches):
        sa_t, sb_t = abar[t], sb[t]
        return (sa_t * x - x0) / jnp.maximum(sb_t, 1e-8)

    xT = ddim_encode(oracle, x0, tables)
    # with an oracle x0-predictor the implied eps is ~0, so xT is a heavily
    # attenuated x0 — definitely not x0 itself
    assert not np.allclose(np.asarray(xT), np.asarray(x0), atol=0.1)
    back = ddim_sample(oracle, x0.shape, tables, jax.random.PRNGKey(0), x_T=xT)
    assert np.allclose(np.asarray(back), np.asarray(x0), atol=0.05)


def test_stochastic_encode_levels():
    from geo4d_tpu.core.schedules import DiffusionSchedule
    from geo4d_tpu.sampling.ddim import DDIMTables, stochastic_encode

    sched = DiffusionSchedule.create(use_dynamic_rescale=False)
    tables = DDIMTables.from_schedule(sched, 10)
    x0 = jnp.ones((1, 4, 4, 2))
    x_early = stochastic_encode(x0, 0, tables, jax.random.PRNGKey(0))
    x_late = stochastic_encode(x0, 9, tables, jax.random.PRNGKey(0))
    # later steps are noisier: correlation with x0 lower
    assert float(jnp.mean(x_early)) > float(jnp.mean(x_late))


def test_prepare_bonn_layout(tmp_path):
    from geo4d_tpu.data.preprocess import prepare_bonn

    base = tmp_path / "rgbd_bonn_balloon2"
    (base / "rgb").mkdir(parents=True)
    (base / "depth").mkdir()
    for i in range(8):
        (base / "rgb" / f"{i:06d}.png").write_bytes(b"x")
        (base / "depth" / f"{i:06d}.png").write_bytes(b"x")
    (base / "groundtruth.txt").write_text(
        "# header\n" + "".join(f"{i} 0 0 0 0 0 0 1\n" for i in range(8))
    )
    prepare_bonn(str(tmp_path), seqs=["balloon2"], n_frames=5)
    assert len(os.listdir(base / "rgb_5")) == 5
    assert len(open(base / "groundtruth_5.txt").readlines()) == 5


def test_prepare_nyuv2_layout(tmp_path):
    """h5 -> png + npy + normalized depth png (prepare_nyuv2.py parity)."""
    h5py = pytest.importorskip("h5py")
    from geo4d_tpu.data.preprocess import prepare_nyuv2

    off = tmp_path / "official"
    off.mkdir()
    rng = np.random.default_rng(0)
    with h5py.File(off / "scene_1.h5", "w") as f:
        f["depth"] = rng.uniform(1, 5, (6, 8)).astype(np.float32)
        f["rgb"] = rng.integers(0, 255, (3, 6, 8), dtype=np.uint8)
    prepare_nyuv2(str(tmp_path))
    from PIL import Image

    img = np.asarray(Image.open(tmp_path / "nyu_images" / "scene_1.png"))
    assert img.shape == (6, 8, 3)
    d = np.load(tmp_path / "nyu_depths" / "scene_1.npy")
    assert d.shape == (6, 8)
    dimg = np.asarray(Image.open(tmp_path / "nyu_depth_imgs" / "scene_1.png"))
    assert dimg.min() == 0 and dimg.max() == 255


def test_sintel_get_dynamics_static_vs_moving(tmp_path):
    """A rigid scene yields empty dynamic labels; a region whose GT flow
    violates the rigid prediction by > threshold is marked dynamic
    (sintel_get_dynamics.py:109-170 semantics)."""
    import struct

    from geo4d_tpu.data.preprocess import read_flo, sintel_get_dynamics

    TAG = 202021.25
    h, w = 12, 16
    seq = "alley_1"
    for sub in ("depth", "camdata_left", "flow"):
        (tmp_path / sub / seq).mkdir(parents=True)

    K = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]])
    depth = np.full((h, w), 3.0, np.float32)
    # two frames: camera translates +x by 0.1 (w2c extrinsics)
    E1 = np.hstack([np.eye(3), np.zeros((3, 1))])
    E2 = np.hstack([np.eye(3), np.array([[-0.1], [0.0], [0.0]])])

    def write_dpt(path, dmap):
        with open(path, "wb") as f:
            f.write(struct.pack("<fii", TAG, w, h))
            dmap.astype(np.float32).tofile(f)

    def write_cam(path, M, N):
        with open(path, "wb") as f:
            f.write(struct.pack("<f", TAG))
            M.astype(np.float64).tofile(f)
            N.astype(np.float64).tofile(f)

    def write_flo(path, flow):
        with open(path, "wb") as f:
            f.write(struct.pack("<fii", TAG, w, h))
            flow.astype(np.float32).tofile(f)

    for fid, E in (("frame_0001", E1), ("frame_0002", E2)):
        write_dpt(tmp_path / "depth" / seq / f"{fid}.dpt", depth)
        write_cam(tmp_path / "camdata_left" / seq / f"{fid}.cam", K, E)

    # GT flow = the rigid flow of the pure camera translation:
    # u = fx * tx / z (constant), except a "moving object" patch
    rigid_u = 20.0 * 0.1 / 3.0
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = rigid_u
    flow[2:5, 3:7, 0] += 50.0  # dynamic patch
    write_flo(tmp_path / "flow" / seq / "frame_0001.flo", flow)

    # round-trip check of the .flo reader
    back = read_flo(str(tmp_path / "flow" / seq / "frame_0001.flo"))
    assert np.allclose(back, flow)

    out = sintel_get_dynamics(str(tmp_path), seq)
    assert len(out) == 1
    from PIL import Image

    label = np.asarray(Image.open(out[0]))
    assert (label[2:5, 3:7] == 255).all()
    outside = label.copy()
    outside[2:5, 3:7] = 0
    assert (outside == 0).all()
