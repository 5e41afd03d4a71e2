"""Spline camera-path interpolation (reference viewer/render_panel.py:
Kochanek-Bartels position/fov splines, spherical squad orientation spline,
per-keyframe transition durations via a monotone PCHIP time map, loop)."""

import numpy as np
import pytest

from nerfstudio_thermal_tpu.cameras.camera_paths import (
    interpolate_camera_path_spline,
)


def _orbit_pose(angle: float, radius: float = 3.0) -> np.ndarray:
    eye = radius * np.array([np.cos(angle), np.sin(angle), 0.3])
    f = -eye / np.linalg.norm(eye)
    r = np.cross(f, [0.0, 0.0, 1.0])
    r /= np.linalg.norm(r)
    u = np.cross(r, f)
    return np.concatenate(
        [np.stack([r, u, -f], -1), eye[:, None]], -1
    ).astype(np.float32)


def test_hits_keyframes_at_knot_times():
    """At each cumulative-duration instant the spline passes exactly through
    the keyframe (Hermite/squad at t=0)."""
    kfs = [_orbit_pose(a) for a in (0.0, 0.9, 2.0)]
    fps = 10.0
    durations = [1.0, 2.0]
    poses, fovs = interpolate_camera_path_spline(
        kfs, fovs=[40.0, 60.0, 80.0], durations=durations, fps=fps
    )
    assert len(poses) == 30  # fps * (1 + 2)
    np.testing.assert_allclose(poses[0], kfs[0], atol=1e-5)
    # frame at t=1.0s (index 10) is keyframe 1
    np.testing.assert_allclose(poses[10], kfs[1], atol=1e-4)
    assert fovs[0] == pytest.approx(40.0, abs=1e-3)
    assert fovs[10] == pytest.approx(60.0, abs=1e-3)


def test_rotations_stay_orthonormal():
    kfs = [_orbit_pose(a) for a in (0.0, 1.2, 2.4, 3.6)]
    poses, _ = interpolate_camera_path_spline(kfs, fps=12.0, seconds=3.0)
    for p in poses:
        np.testing.assert_allclose(
            p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-4
        )
        assert np.linalg.det(p[:3, :3]) == pytest.approx(1.0, abs=1e-4)


def test_loop_returns_to_start():
    """With loop=True the path's final frames converge back to the first
    keyframe (the wrap segment is interpolated like any other)."""
    kfs = [_orbit_pose(a) for a in (0.0, 2.0, 4.0)]
    poses, _ = interpolate_camera_path_spline(
        kfs, durations=[1.0, 1.0, 1.0], fps=20.0, loop=True
    )
    assert len(poses) == 60
    # one frame before the wrap is nearly back at keyframe 0
    gap_end = np.linalg.norm(poses[-1][:, 3] - kfs[0][:, 3])
    gap_mid = np.linalg.norm(poses[30][:, 3] - kfs[0][:, 3])
    assert gap_end < 0.4 and gap_mid > 1.0


def test_nonuniform_durations_allocate_frames():
    """A 3x longer first transition gets ~3x the frames (PCHIP time map)."""
    kfs = [_orbit_pose(a) for a in (0.0, 1.0, 2.0)]
    poses, _ = interpolate_camera_path_spline(
        kfs, durations=[3.0, 1.0], fps=10.0
    )
    assert len(poses) == 40
    # the frame at t=3.0s is keyframe 1: 30 frames spent on segment 0
    np.testing.assert_allclose(poses[30], kfs[1], atol=1e-4)


def test_single_keyframe_repeats():
    kf = _orbit_pose(0.5)
    poses, fovs = interpolate_camera_path_spline(
        [kf], fovs=[50.0], fps=5.0, seconds=2.0
    )
    assert len(poses) >= 1
    for p in poses:
        np.testing.assert_allclose(p, kf, atol=1e-6)
    assert np.all(fovs == 50.0)


def test_loop_orientation_smooth_at_seam():
    """A full-orbit loop (keyframes spanning 360 degrees of yaw) must have
    no rotation-rate spike at the wrap: the squad control points wrap their
    neighbor indices and hemisphere-align the wrap pair (r4 review fix —
    clamped neighbors + unaligned dot(q_last, q_0) < 0 gave long-way
    tangents and a visible camera jerk at the seam)."""
    kfs = [_orbit_pose(a) for a in np.linspace(0.0, 2 * np.pi, 8, endpoint=False)]
    poses, _ = interpolate_camera_path_spline(
        kfs, durations=[1.0] * 8, fps=20.0, loop=True
    )
    n = len(poses)
    assert n == 160

    def ang(a, b):
        # relative rotation angle between consecutive frames
        r = a[:, :3].T @ b[:, :3]
        c = np.clip((np.trace(r) - 1) / 2, -1.0, 1.0)
        return float(np.arccos(c))

    steps = [ang(poses[j], poses[(j + 1) % n]) for j in range(n)]
    # uniform orbit: every frame-to-frame rotation is ~2*pi/160; the seam
    # (last->first, and frames around it) must not exceed 3x the median
    med = float(np.median(steps))
    assert max(steps) < 3.0 * med, (max(steps), med)
