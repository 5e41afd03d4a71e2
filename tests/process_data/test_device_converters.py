"""Device converter tests with synthetic vendor exports.
Reference surfaces: nerfstudio/process_data/{polycam,record3d,metashape,
realitycapture,odm}_utils.py + skydio_to_nerfstudio_dataset.py."""

import json
from pathlib import Path

import numpy as np
import pytest


def _png(path: Path, hw=(8, 10)):
    from PIL import Image

    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (*hw, 3), np.uint8)
    ).save(path)


def test_polycam(tmp_path):
    from nerfstudio_thermal_tpu.scripts.process_data import main

    kf = tmp_path / "export" / "keyframes"
    for i in range(3):
        _png(kf / "images" / f"f{i}.jpg")
        cam = {f"t_{r}{c}": float(r == c) for r in range(3) for c in range(4)}
        cam.update(fx=50.0, fy=50.0, cx=5.0, cy=4.0, width=10, height=8,
                   blur_score=100.0)
        (kf / "cameras").mkdir(parents=True, exist_ok=True)
        (kf / "cameras" / f"f{i}.json").write_text(json.dumps(cam))
    out = tmp_path / "out"
    rc = main(["polycam", "--data", str(tmp_path / "export"),
               "--output-dir", str(out), "--min-blur-score", "0",
               "--crop-border-pixels", "0", "--num-downscales", "0"])
    assert rc == 0
    t = json.loads((out / "transforms.json").read_text())
    assert len(t["frames"]) == 3
    assert t["frames"][0]["fl_x"] == 50.0
    assert len(list((out / "images").glob("*.jpg"))) == 3


def test_record3d(tmp_path):
    from nerfstudio_thermal_tpu.scripts.process_data import main

    data = tmp_path / "export"
    for i in range(4):
        _png(data / "rgb" / f"{i}.jpg")
    n = 4
    poses = np.zeros((n, 7))
    poses[:, 3] = 1.0  # identity quats (x y z w scalar-last)
    poses[:, 4] = np.arange(n) * 0.1
    K = np.array([[60.0, 0, 5], [0, 60.0, 4], [0, 0, 1]])
    (data / "metadata.json").write_text(json.dumps({
        "poses": poses.tolist(), "K": K.T.reshape(-1).tolist(),
        "w": 10, "h": 8,
    }))
    out = tmp_path / "out"
    rc = main(["record3d", "--data", str(data), "--output-dir", str(out),
               "--num-downscales", "0"])
    assert rc == 0
    t = json.loads((out / "transforms.json").read_text())
    assert len(t["frames"]) == 4 and t["fl_x"] == 60.0
    m = np.asarray(t["frames"][1]["transform_matrix"])
    assert m[0, 3] == pytest.approx(0.1)


def test_metashape(tmp_path):
    from nerfstudio_thermal_tpu.scripts.process_data import main

    data = tmp_path / "imgs"
    for i in range(2):
        _png(data / f"cam{i}.jpg")
    xml = f"""<document><chunk>
      <sensors>
        <sensor id="0" type="frame">
          <resolution width="10" height="8"/>
          <calibration><f>55.0</f><cx>0.5</cx><cy>-0.5</cy><k1>0.01</k1></calibration>
        </sensor>
      </sensors>
      <cameras>
        <camera label="cam0" sensor_id="0">
          <transform>{' '.join(str(float(x)) for x in np.eye(4).reshape(-1))}</transform>
        </camera>
        <camera label="cam1" sensor_id="0">
          <transform>{' '.join(str(float(x)) for x in np.eye(4).reshape(-1))}</transform>
        </camera>
      </cameras>
    </chunk></document>"""
    (tmp_path / "cameras.xml").write_text(xml)
    out = tmp_path / "out"
    rc = main(["metashape", "--data", str(data),
               "--xml", str(tmp_path / "cameras.xml"),
               "--output-dir", str(out), "--num-downscales", "0"])
    assert rc == 0
    t = json.loads((out / "transforms.json").read_text())
    assert len(t["frames"]) == 2
    assert t["frames"][0]["fl_x"] == 55.0
    assert t["frames"][0]["cx"] == pytest.approx(5.5)


def test_realitycapture(tmp_path):
    from nerfstudio_thermal_tpu.scripts.process_data import main

    data = tmp_path / "imgs"
    for i in range(2):
        _png(data / f"shot{i}.jpg")
    csv = (
        "#name,x,y,alt,heading,pitch,roll,f,px,py,k1,k2,k3,k4,t1,t2\n"
        "shot0.jpg,0,0,1,0,0,0,36,0,0,0,0,0,0,0,0\n"
        "shot1.jpg,1,0,1,90,0,0,36,0,0,0,0,0,0,0,0\n"
    )
    (tmp_path / "poses.csv").write_text(csv)
    out = tmp_path / "out"
    rc = main(["realitycapture", "--data", str(data),
               "--csv", str(tmp_path / "poses.csv"),
               "--output-dir", str(out), "--num-downscales", "0"])
    assert rc == 0
    t = json.loads((out / "transforms.json").read_text())
    assert len(t["frames"]) == 2
    # f=36mm film equivalent -> fl = 36 * max(w,h)/36 = 10
    assert t["frames"][0]["fl_x"] == pytest.approx(10.0)


def test_odm(tmp_path):
    from nerfstudio_thermal_tpu.scripts.process_data import main

    data = tmp_path / "proj"
    for i in range(2):
        _png(data / "images" / f"d{i}.jpg")
    (data / "cameras.json").write_text(json.dumps({
        "cam0": {"projection_type": "brown", "width": 10, "height": 8,
                 "focal_x": 0.9, "focal_y": 0.9, "c_x": 0.0, "c_y": 0.0,
                 "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0, "k3": 0.0}
    }))
    (data / "opensfm").mkdir(parents=True)
    recon = [{"shots": {
        f"d{i}.jpg": {"rotation": [0.0, 0.0, 0.0],
                      "translation": [0.1 * i, 0.0, 0.0]}
        for i in range(2)
    }}]
    (data / "opensfm" / "reconstruction.nerfstudio.json").write_text(
        json.dumps(recon)
    )
    out = tmp_path / "out"
    rc = main(["odm", "--data", str(data), "--output-dir", str(out),
               "--num-downscales", "0"])
    assert rc == 0
    t = json.loads((out / "transforms.json").read_text())
    assert len(t["frames"]) == 2
    assert t["frames"][0]["fl_x"] == pytest.approx(9.0)


def test_skydio_requires_exiftool(tmp_path):
    from nerfstudio_thermal_tpu.process_data.device_converters import (
        SkydioToNerfstudioDataset,
    )
    from nerfstudio_thermal_tpu.process_data.flir_utils import exiftool_available

    conv = SkydioToNerfstudioDataset(
        data=tmp_path, output_dir=tmp_path / "out", skip_colmap=True
    )
    if not exiftool_available():
        with pytest.raises(RuntimeError, match="exiftool"):
            conv.main()
    else:  # pragma: no cover - environment-dependent
        pytest.skip("exiftool present; full skydio path exercised elsewhere")


def test_hloc_gated():
    from nerfstudio_thermal_tpu.process_data.hloc_utils import (
        hloc_available, run_hloc,
    )

    if hloc_available():  # pragma: no cover
        pytest.skip("hloc installed")
    with pytest.raises(ImportError, match="hloc"):
        run_hloc(Path("x"), Path("y"))


def test_equirect_projection_samples_correct_band(tmp_path):
    """An equirect image with distinct colors per longitude quadrant: the
    yaw-0 perspective view must sample the front band, yaw-90 the side
    (reference equirect_utils.py:86-158)."""
    import cv2

    from nerfstudio_thermal_tpu.process_data.equirect_utils import (
        compute_resolution_from_equirect,
        equirect2persp,
        generate_planar_projections_from_equirectangular,
    )

    H, W = 64, 128
    img = np.zeros((H, W, 3), np.uint8)
    # longitude bands: front (center) red, right green, back blue, left white
    img[:, :] = (255, 255, 255)
    img[:, W // 4 : W // 2] = (0, 0, 255)    # BGR red   at lon [-90, 0)
    img[:, W // 2 : 3 * W // 4] = (0, 255, 0)  # green
    img[:, 3 * W // 4 :] = (255, 0, 0)       # blue

    front = equirect2persp(img, 90.0, 0.0, 0.0, 16, 16)
    # center pixel of the front view: longitude ~ +something... assert it is
    # one solid band color (not a mix) and differs from the yaw-180 view
    back = equirect2persp(img, 90.0, 180.0, 0.0, 16, 16)
    assert not np.array_equal(front[8, 8], back[8, 8])

    cv2.imwrite(str(tmp_path / "eq.png"), img)
    size = compute_resolution_from_equirect(tmp_path, 8)
    assert size[0] > 0
    out = generate_planar_projections_from_equirectangular(tmp_path, (16, 16), 8)
    assert len(list(out.glob("*.jpg"))) == 8


def test_eyeful_tower_conversion(tmp_path):
    """EyefulTower cameras.json/splits.json -> transforms.json: column-major
    K/T decode, intrinsic rescale, distortion remap, z-up pose permutation,
    split filenames, subsampling (reference eyeful_tower.py:164-294)."""
    import json
    import numpy as np
    from nerfstudio_thermal_tpu.process_data.eyeful_utils import (
        eyeful_to_nerfstudio_transforms,
        process_eyeful_capture,
        subsample_transforms,
    )

    rng = np.random.default_rng(0)
    cams = []
    for i in range(4):
        K = np.array([[2000.0, 0, 960], [0, 2010.0, 1280], [0, 0, 1]])
        # random rigid w2c
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        T = np.eye(4); T[:3, :3] = R; T[:3, 3] = rng.normal(size=3)
        cams.append({
            "cameraId": f"{i:02d}/cam{i}",
            "width": 1920, "height": 2560,
            "K": K.T.tolist(),  # stored column-major
            "T": T.T.tolist(),
            "distortionModel": "RadialAndTangential",
            "distortion": [0.1, 0.01, 1e-3, 2e-3, 1e-4],
        })
    cameras = {"KRT": cams}
    splits = {"train": [c["cameraId"] for c in cams[:3]],
              "test": [cams[3]["cameraId"]]}

    out = eyeful_to_nerfstudio_transforms("apartment", cameras, splits, 684, 1024)
    assert out["camera_model"] == "OPENCV"
    assert len(out["frames"]) == 4
    f0 = out["frames"][0]
    # portrait source keeps portrait target: 684x1024, scale = 684/1920
    assert f0["w"] == 684 and f0["h"] == 1024
    np.testing.assert_allclose(f0["fl_x"], 2000.0 * 684 / 1920)
    np.testing.assert_allclose(f0["cy"], 1280.0 * 1024 / 2560)
    assert f0["k3"] == 1e-4 and f0["p1"] == 1e-3  # [k1 k2 p1 p2 k3] remap
    # pose: a valid rotation with the z-up permutation applied
    M = np.array(f0["transform_matrix"])
    R = M[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-8)
    # camera center is preserved (permuted): inv(T)[:3,3] reordered [2,0,1]
    center_world = np.linalg.inv(np.array(cams[0]["T"]).T)[:3, 3]
    np.testing.assert_allclose(M[:3, 3], center_world[[2, 0, 1]], atol=1e-10)
    assert len(out["train_filenames"]) == 3 and len(out["val_filenames"]) == 1

    # fisheye variant: crop radius + 8-element distortion remap
    for c in cams:
        c["distortionModel"] = "Fisheye"
        c["distortion"] = [0.1, 0.02, 0.003, 0, 0, 0, 1e-3, 2e-3]
    fe = eyeful_to_nerfstudio_transforms("table", cameras, splits, 684, 1024)
    assert fe["camera_model"] == "OPENCV_FISHEYE"
    assert fe["fisheye_crop_radius"] == 0.45
    assert fe["frames"][0]["k3"] == 0.003 and fe["frames"][0]["p2"] == 2e-3

    sub = subsample_transforms(out, 2)
    assert len(sub["frames"]) == 2
    kept = {f["file_path"] for f in sub["frames"]}
    assert set(sub["train_filenames"]) <= kept

    # end-to-end: capture dir -> transforms.json with resolution folder prefix
    cap = tmp_path / "apartment"
    cap.mkdir()
    (cap / "cameras.json").write_text(json.dumps(cameras))
    (cap / "splits.json").write_text(json.dumps(splits))
    dest = process_eyeful_capture(cap, resolution="jpeg_2k")
    t = json.loads(dest.read_text())
    assert t["frames"][0]["file_path"].startswith("images-jpeg-2k/")
    assert all(p.startswith("images-jpeg-2k/") for p in t["train_filenames"])


def test_nuscenes_mask_geometry():
    """Cuboid face rasterization + dynamic-instance chain walk
    (reference scripts/datasets/process_nuscenes_masks.py:76-125)."""
    import numpy as np
    from nerfstudio_thermal_tpu.scripts.datasets.process_nuscenes_masks import (
        instance_is_dynamic,
        project_points,
        rasterize_cuboid,
    )

    # unit cube 5m in front of a 100x100 camera with f=100, c=(50,50)
    K = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    corners = np.array([
        [-0.5, 0.5, 0.5, -0.5, -0.5, 0.5, 0.5, -0.5],   # x
        [-0.5, -0.5, 0.5, 0.5, -0.5, -0.5, 0.5, 0.5],   # y
        [4.5, 4.5, 4.5, 4.5, 5.5, 5.5, 5.5, 5.5],       # z
    ])
    pts = project_points(corners, K)
    assert pts.shape == (8, 2)
    # front face center projects to image center
    np.testing.assert_allclose(pts[:4].mean(0), [50, 50], atol=1.0)

    mask = np.ones((100, 100), np.uint8)
    rasterize_cuboid(mask, pts)
    assert mask[50, 50] == 0          # cuboid interior masked
    assert mask[5, 5] == 1            # far corner untouched
    # masked region ~ front face extent (0.5/4.5 * 100 ~ 11 px half-width)
    assert 300 < (mask == 0).sum() < 800

    # dynamic chain walk on a stub devkit
    class StubNusc:
        def __init__(self, speeds):
            self.speeds = speeds
        def box_velocity(self, tok):
            v = self.speeds[int(tok)]
            return np.array([v, 0, 0])
        def get(self, table, tok):
            nxt = str(int(tok) + 1) if int(tok) + 1 < len(self.speeds) else ""
            return {"next": nxt}

    inst = {"first_annotation_token": "0"}
    assert not instance_is_dynamic(StubNusc([0.1, 0.2, 0.3]), inst, 0.75)
    assert instance_is_dynamic(StubNusc([0.1, 2.0, 0.1]), inst, 0.75)

    from nerfstudio_thermal_tpu.scripts.datasets.process_nuscenes_masks import main
    assert main(["--help"]) == 0
    assert main(["--data-dir", "/nonexistent", "--output-dir", "/tmp/x"]) == 1  # devkit gated


def test_project_aria_frame_math(tmp_path):
    """Aria FISHEYE624 frame conversion: pose composition with
    T_ARIA_NERFSTUDIO, projection-param unpacking, nearest-pose lookup,
    crop-radius scaling (reference scripts/datasets/process_project_aria.py)."""
    import numpy as np
    from nerfstudio_thermal_tpu.scripts.datasets.process_project_aria import (
        T_ARIA_NERFSTUDIO,
        aria_frame_to_nerfstudio,
        main,
        nearest_pose_index,
        rgb_valid_radius,
    )

    # identity device pose & device->camera: frame pose == T_ARIA_NERFSTUDIO
    p = np.concatenate([[610.9, 716.1, 716.9], np.arange(12) * 0.01, [99.0]])
    frame = aria_frame_to_nerfstudio(
        np.eye(4), np.eye(4), p, 1408, 1408, "camera-rgb_1.jpg", 1,
    )
    np.testing.assert_allclose(frame["transform_matrix"], T_ARIA_NERFSTUDIO)
    assert frame["fl_x"] == frame["fl_y"] == 610.9
    assert frame["cx"] == 716.1 and frame["cy"] == 716.9
    assert frame["distortion_params"] == (np.arange(12) * 0.01).tolist()  # 16th param dropped

    # composition order: world <- device <- camera <- axis flip
    t_wd = np.eye(4); t_wd[:3, 3] = [1, 2, 3]
    t_dc = np.eye(4); t_dc[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
    f2 = aria_frame_to_nerfstudio(t_wd, t_dc, p, 704, 704, "x.jpg", 2)
    expected = t_wd @ t_dc @ T_ARIA_NERFSTUDIO
    np.testing.assert_allclose(f2["transform_matrix"], expected)

    assert nearest_pose_index(np.array([0, 10, 20]), 15) == 2
    assert nearest_pose_index(np.array([0, 10, 20]), 10) == 1
    assert nearest_pose_index(np.array([0, 10, 20]), 99) == 2  # clipped

    assert rgb_valid_radius(1408) == 707.5
    assert rgb_valid_radius(704) == 353.75

    assert main(["--help"]) == 0
    assert main(["--bogus", "x"]) == 2
    assert main(["--vrs-file", str(tmp_path / "no.vrs"),
                 "--mps-data-dir", str(tmp_path),
                 "--output-dir", str(tmp_path / "out")]) == 1  # toolkit gated


def test_camera_model_name_mapping_complete():
    """Every transforms.json camera_model name maps to the right CameraType
    (reference cameras.py:54-67; FISHEYE624 regression: aria datasets)."""
    from nerfstudio_thermal_tpu.cameras.cameras import CameraType
    from nerfstudio_thermal_tpu.data.dataparsers.nerfstudio_dataparser import (
        CAMERA_MODEL_TO_TYPE,
    )

    assert CAMERA_MODEL_TO_TYPE["FISHEYE624"] == CameraType.FISHEYE624
    assert CAMERA_MODEL_TO_TYPE["VR180_L"] == CameraType.VR180_L
    assert CAMERA_MODEL_TO_TYPE["OMNIDIRECTIONALSTEREO_R"] == (
        CameraType.OMNIDIRECTIONALSTEREO_R
    )
    assert CAMERA_MODEL_TO_TYPE["SIMPLE_RADIAL"] == CameraType.PERSPECTIVE
