"""Training-set preprocessing + cropping library tests (host-only,
synthetic fixtures standing in for the raw dataset downloads)."""

import json
import os
import os.path as osp

import numpy as np
import pytest

from geo4d_tpu.data.cropping import (
    bbox_from_intrinsics_in_out,
    camera_matrix_of_crop,
    center_crop_image_depthmap,
    colmap_to_opencv_intrinsics,
    crop_image_depthmap,
    crop_resize_to,
    opencv_to_colmap_intrinsics,
    rescale_image_depthmap,
)
from geo4d_tpu.data.preprocess_train import (
    arkit_scene_orientation,
    blendedmvs_process_view,
    colmap_qt_to_w2c,
    load_blendedmvs_cam,
    load_pfm,
    ndc_to_pinhole_intrinsics,
    object_centric_crop,
    pytorch3d_camera_to_opencv_pose,
    read_float3,
    staticthings3d_process_view,
    waymo_make_video_pairs,
)


def _K(f, cx, cy):
    K = np.eye(3)
    K[0, 0] = K[1, 1] = f
    K[0, 2], K[1, 2] = cx, cy
    return K


# ---------------- cropping ----------------


def test_colmap_opencv_roundtrip():
    K = _K(100, 31.5, 23.5)
    assert np.allclose(colmap_to_opencv_intrinsics(
        opencv_to_colmap_intrinsics(K)), K)


def test_rescale_image_depthmap_covers_and_scales_K():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    depth = rng.uniform(1, 5, (48, 64)).astype(np.float32)
    K = _K(80, 32, 24)
    out_img, out_depth, K2 = rescale_image_depthmap(img, depth, K, (32, 24))
    # aspect preserved, covers (32, 24)
    assert out_img.shape[:2] == (24, 32)
    assert out_depth.shape == (24, 32)
    # focal scales with the resize factor (0.5)
    assert K2[0, 0] == pytest.approx(40, rel=1e-5)
    # depth resize is nearest: values are a subset of the original
    assert set(np.unique(out_depth)).issubset(set(np.unique(depth)))


def test_crop_shifts_principal_point():
    img = np.zeros((40, 60, 3), np.uint8)
    depth = np.ones((40, 60), np.float32)
    K = _K(50, 30, 20)
    _, _, K2 = crop_image_depthmap(img, depth, K, (10, 5, 50, 35))
    assert K2[0, 2] == 20 and K2[1, 2] == 15
    img2, d2, K3 = center_crop_image_depthmap(img, depth, K, 0.5)
    assert img2.shape == (20, 30, 3) and d2.shape == (20, 30)
    assert K3[0, 0] == K[0, 0]  # focal unchanged by pure crop


def test_crop_resize_to_exact_resolution():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (100, 150, 3), dtype=np.uint8)
    depth = rng.uniform(1, 4, (100, 150)).astype(np.float32)
    K = _K(120, 75, 50)
    out_img, out_depth, K2 = crop_resize_to(img, depth, K, (64, 48))
    assert out_img.shape == (48, 64, 3)
    assert out_depth.shape == (48, 64)
    # bbox/K consistency: recomputing the bbox from Ks gives offsets >= 0
    K_mid = camera_matrix_of_crop(K, (150, 100), (150, 100), scaling=1.0)
    assert bbox_from_intrinsics_in_out(K_mid, K_mid, (150, 100))[:2] == (0, 0)


# ---------------- readers / converters ----------------


def test_pfm_and_float3_roundtrip(tmp_path):
    depth = np.random.default_rng(0).uniform(1, 9, (6, 8)).astype(np.float32)
    pfm = tmp_path / "d.pfm"
    with open(pfm, "wb") as f:
        f.write(b"Pf\n8 6\n-1.0\n")
        # PFM bottom-up row order
        depth[::-1].astype("<f").tofile(f)
    assert np.allclose(load_pfm(str(pfm)), depth)

    f3 = tmp_path / "d.float3"
    arr = np.random.default_rng(1).normal(size=(4, 4)).astype(np.float32)
    with open(f3, "wb") as f:
        f.write(b"float\n2\n4\n4\n")
        arr.tofile(f)
    assert np.allclose(read_float3(str(f3)), arr)


def test_colmap_pose_is_rigid():
    w2c = colmap_qt_to_w2c(0.9, 0.1, -0.2, 0.3, 1.0, -2.0, 0.5)
    R = w2c[:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-9)
    assert np.linalg.det(R) == pytest.approx(1.0)


def test_ndc_to_pinhole_and_pt3d_pose():
    # square image: NDC scale = H/2; principal point 0 -> image center
    K = ndc_to_pinhole_intrinsics([2.0, 2.0], [0.0, 0.0], (128, 128))
    assert K[0, 0] == pytest.approx(128.0)
    assert K[0, 2] == pytest.approx(64.0)
    w2c = pytorch3d_camera_to_opencv_pose(np.eye(3), np.zeros(3))
    # identity pytorch3d camera -> 180-degree flip about z (x,y negated)
    assert np.allclose(np.diag(w2c), [-1, -1, 1, 1])


def test_object_centric_crop_centers_principal_point():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    dm = rng.uniform(1, 5, (60, 80, 2)).astype(np.float32)
    K = _K(70, 50, 25)  # off-center pp
    out_img, out_dm, K2 = object_centric_crop(img, dm, K, img_size=40)
    h, w = out_img.shape[:2]
    # principal point lands at the crop center (within rounding + scale)
    assert abs(K2[0, 2] - w / 2) < 2
    assert abs(K2[1, 2] - h / 2) < 2
    assert min(h, w) >= 30  # 3/4 * img_size


# ---------------- per-dataset drives on synthetic layouts ----------------


def test_blendedmvs_view(tmp_path):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path / "seq"
    (root / "cams").mkdir(parents=True)
    (root / "blended_images").mkdir()
    (root / "rendered_depth_maps").mkdir()
    K = _K(600, 384, 288)
    w2c = np.eye(4)
    w2c[:3, 3] = [0.5, 0, 1]
    with open(root / "cams" / "00000000_cam.txt", "w") as f:
        f.write("extrinsic\n")
        for row in w2c:
            f.write(" ".join(map(str, row)) + "\n")
        f.write("\nintrinsic\n")
        for row in K:
            f.write(" ".join(map(str, row)) + "\n")
    img = np.random.default_rng(0).integers(0, 255, (576, 768, 3),
                                            dtype=np.uint8)
    cv2.imwrite(str(root / "blended_images" / "00000000.jpg"),
                img[..., ::-1])
    depth = np.random.default_rng(1).uniform(1, 9, (576, 768)).astype(
        np.float32
    )
    with open(root / "rendered_depth_maps" / "00000000.pfm", "wb") as f:
        f.write(b"Pf\n768 576\n-1.0\n")
        depth[::-1].astype("<f").tofile(f)

    K_read, R, t = load_blendedmvs_cam(str(root / "cams" / "00000000_cam.txt"))
    assert np.allclose(t, [-0.5, 0, -1])  # inverted to cam2world

    out = tmp_path / "out"
    out.mkdir()
    blendedmvs_process_view(str(root), "00000000", str(out))
    assert (out / "00000000.jpg").exists()
    with np.load(out / "00000000.npz") as z:
        # 768x576 -> 512x384 is a 2/3 scale
        assert z["intrinsics"][0, 0] == pytest.approx(400, rel=1e-3)


def test_staticthings3d_view(tmp_path):
    cv2 = pytest.importorskip("cv2")

    def write_float3(path, arr):
        arr = np.asarray(arr, np.float32)
        with open(path, "wb") as f:
            dims = list(reversed(arr.shape))
            f.write(b"float\n" + str(arr.ndim).encode() + b"\n")
            for d in dims:
                f.write(str(d).encode() + b"\n")
            arr.tofile(f)

    seq_rel = osp.join("TRAIN", "A", "0000")
    for sub in ("intrinsics", "poses", "depths", "frames_cleanpass",
                "frames_finalpass"):
        os.makedirs(tmp_path / sub / seq_rel / "left", exist_ok=True)
    os.makedirs(tmp_path / "intrinsics" / seq_rel, exist_ok=True)
    write_float3(tmp_path / "intrinsics" / seq_rel / "0006.float3",
                 _K(1050, 480, 270))
    write_float3(tmp_path / "poses" / seq_rel / "left" / "0006.float3",
                 np.eye(4))
    write_float3(tmp_path / "depths" / seq_rel / "left" / "0006.float3",
                 np.full((540, 960), 3.0))
    img = np.zeros((540, 960, 3), np.uint8)
    for sub in ("frames_cleanpass", "frames_finalpass"):
        cv2.imwrite(str(tmp_path / sub / seq_rel / "left" / "0006.png"), img)

    out = tmp_path / "out"
    staticthings3d_process_view(str(tmp_path), seq_rel, "left", "0006",
                                str(out))
    assert (out / seq_rel / "left" / "0006_clean.jpg").exists()
    assert (out / seq_rel / "left" / "0006_final.jpg").exists()
    with np.load(out / seq_rel / "left" / "0006.npz") as z:
        assert np.allclose(z["cam2world"], np.eye(4))


def test_arkit_scene_orientation_up_and_down():
    # camera level, y-down device frame: up vector (0,-1,0)->world... build
    # poses whose device-up maps to world +z => UP
    n = 4
    poses = np.tile(np.eye(4), (n, 1, 1))
    # rotate -90deg about x: device -y axis -> world +z
    Rx = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float64)
    poses[:, :3, :3] = Rx
    label, rot = arkit_scene_orientation(poses)
    assert label == "UP"
    assert np.allclose(rot, np.eye(4))

    poses[:, :3, :3] = Rx @ np.diag([-1.0, -1.0, 1.0])  # roll 180
    label, _ = arkit_scene_orientation(poses)
    assert label == "DOWN"


def test_waymo_make_video_pairs(tmp_path):
    # two sequences, camera tracks 1 and 2, 4 frames each
    frames = []
    for seq in ("seqA.tfrecord", "seqB.tfrecord"):
        os.makedirs(tmp_path / seq)
        for cam in "12":
            for i in range(4):
                name = f"{i:05d}_{cam}"
                (tmp_path / seq / f"{name}.jpg").write_bytes(b"x")
                frames.append(name)
    frames = sorted(set(frames))
    scenes, frames_out, pairs = waymo_make_video_pairs(
        str(tmp_path), frames, strides=(1, 2)
    )
    assert len(scenes) == 2
    # per scene, per cam: stride1 -> 3 pairs, stride2 -> 2 pairs = 5 x 2 cams
    assert len(pairs) == 2 * 2 * 5
    # pairs index into frames and respect the stride
    for s_idx, i1, i2 in pairs:
        assert 0 <= s_idx < 2
        f1, f2 = frames_out[i1], frames_out[i2]
        assert f1[-1] == f2[-1]  # same camera track
        assert int(f2[:5]) - int(f1[:5]) in (1, 2)


def test_depth_exr_roundtrip(tmp_path):
    """Self-contained EXR fallback round-trips float32 depth exactly."""
    from geo4d_tpu.data.preprocess_train import read_depth_exr, write_depth_exr

    depth = np.random.default_rng(0).uniform(0.1, 80, (7, 11)).astype(
        np.float32
    )
    p = str(tmp_path / "d.exr")
    write_depth_exr(p, depth)
    assert np.array_equal(read_depth_exr(p), depth)
    # valid EXR magic regardless of which writer produced it
    assert open(p, "rb").read(4) == b"\x76\x2f\x31\x01"


# ---------------- mesh rasterizer + scannetpp ----------------


def test_ply_roundtrip_and_raster(tmp_path):
    """Binary PLY reader + native/numpy z-buffer depth renderer: a unit
    square at z=2 renders depth 2 in its footprint, 0 outside."""
    import struct

    from geo4d_tpu.geometry.raster import (
        load_ply_mesh,
        render_mesh_depth,
    )

    verts = np.array(
        [[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    ply = tmp_path / "mesh.ply"
    with open(ply, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 4\n")
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"element face 2\n")
        f.write(b"property list uchar int vertex_indices\n")
        f.write(b"end_header\n")
        verts.astype("<f4").tofile(f)
        for face in faces:
            f.write(struct.pack("<B3i", 3, *face))
    v2, f2 = load_ply_mesh(str(ply))
    assert np.allclose(v2, verts) and np.array_equal(f2, faces)

    K = np.array([[20, 0, 16], [0, 20, 12], [0, 0, 1]], np.float64)
    depth = render_mesh_depth(v2, f2, K, np.eye(4), (24, 32))
    assert depth[12, 16] == pytest.approx(2.0)      # center covered
    assert depth[0, 0] == 0.0                       # corner empty
    # square spans 2*f/z = 20 px around the pp
    assert (depth > 0).sum() == pytest.approx(21 * 21, abs=80)

    # camera moved back 1 -> depth 3
    c2w = np.eye(4)
    c2w[2, 3] = -1.0
    depth2 = render_mesh_depth(v2, f2, K, c2w, (24, 32))
    assert depth2[12, 16] == pytest.approx(3.0)

    # occlusion: nearer triangle wins the z-buffer
    verts3 = np.concatenate([verts, verts * np.array([1, 1, 0.5])], 0)
    faces3 = np.concatenate([faces, faces + 4], 0).astype(np.int32)
    depth3 = render_mesh_depth(verts3, faces3, K, np.eye(4), (24, 32))
    assert depth3[12, 16] == pytest.approx(1.0)


def test_scannetpp_scene(tmp_path):
    """Full synthetic ScanNet++ scene through prepare_scannetpp_scene:
    undistort (pinhole), rescale, mesh-rendered depth, metadata."""
    cv2 = pytest.importorskip("cv2")
    import struct

    from PIL import Image

    from geo4d_tpu.data.preprocess_train import (
        prepare_scannetpp_scene,
        scannetpp_concat_metadata,
    )

    data = tmp_path / "data" / "scene0"
    (data / "scans").mkdir(parents=True)
    (data / "iphone" / "colmap").mkdir(parents=True)
    (data / "iphone" / "rgb").mkdir()
    (data / "iphone" / "rgb_masks").mkdir()
    (data / "dslr" / "colmap").mkdir(parents=True)

    # a big quad at z=2 as the scan mesh
    verts = np.array(
        [[-4, -3, 2], [4, -3, 2], [4, 3, 2], [-4, 3, 2]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    with open(data / "scans" / "mesh_aligned_0.05.ply", "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 4\n")
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"element face 2\n")
        f.write(b"property list uchar int vertex_indices\n")
        f.write(b"end_header\n")
        verts.astype("<f4").tofile(f)
        for face in faces:
            f.write(struct.pack("<B3i", 3, *face))

    W, H = 128, 96
    # one iphone frame at the origin: PINHOLE, no distortion
    for cam in ("iphone", "dslr"):
        with open(data / cam / "colmap" / "cameras.txt", "w") as f:
            f.write("# cameras\n# ...\n# ...\n")
            if cam == "iphone":
                f.write(f"1 PINHOLE {W} {H} 60 60 {W/2} {H/2} 0 0 0 0\n")
        with open(data / cam / "colmap" / "images.txt", "w") as f:
            f.write("# images\n")
            if cam == "iphone":
                f.write("7 1 0 0 0 0 0 0 1 frame_000001.jpg\n")
                f.write("\n")

    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    ).save(data / "iphone" / "rgb" / "frame_000001.jpg")
    Image.fromarray(np.full((H, W), 255, np.uint8)).save(
        data / "iphone" / "rgb_masks" / "frame_000001.png"
    )

    out = tmp_path / "out" / "scene0"
    pairs = np.array([[0, 0, 1.0]])
    prepare_scannetpp_scene(str(data), str(out), ["frame_000001"], pairs,
                            target_resolution=64)
    depth = np.asarray(Image.open(out / "depth" / "frame_000001.png"))
    assert depth.dtype == np.uint16
    h, w = depth.shape
    # mesh at z=2 -> 2000 mm in the (covered) center
    assert depth[h // 2, w // 2] == pytest.approx(2000, abs=10)
    with np.load(out / "scene_metadata.npz") as z:
        assert z["images"][0] == "frame_000001"
        assert z["trajectories"].shape == (1, 4, 4)

    scannetpp_concat_metadata(str(tmp_path / "out"), ["scene0"])
    with np.load(tmp_path / "out" / "all_metadata.npz") as z:
        assert len(z["images"]) == 1
