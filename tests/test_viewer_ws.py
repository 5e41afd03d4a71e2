"""Viewer websocket protocol e2e: dynamic output enumeration, crop renders,
and the export tab (reference viewer/control_panel.py + export_panel.py)."""

import asyncio
import json
from pathlib import Path

import numpy as np
import pytest

from nerfstudio_thermal_tpu.configs.method_configs import get_method_config, setup_trainer
from tests.fixtures import make_synthetic_rgbt_dataset
from tests.test_all_methods_train import shrink


@pytest.fixture(scope="module")
def tiny_trainer(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("viewer")
    cfg = shrink(get_method_config("thermal-nerfacto"))
    cfg.trainer.max_num_iterations = 2
    cfg.data = make_synthetic_rgbt_dataset(tmp_path / "data")
    cfg.dataparser.train_split_fraction = 0.5
    trainer = setup_trainer(cfg, base_dir=tmp_path / "out")
    trainer.setup()
    trainer.train()
    return trainer


def test_probe_output_names_enumerates_thermal(tiny_trainer):
    from nerfstudio_thermal_tpu.viewer.server import probe_output_names

    names = probe_output_names(
        tiny_trainer.model, tiny_trainer.host_params(),
        tiny_trainer.datamanager.eval_cameras,
    )
    assert names[0] == "rgb"
    assert "rgb_thermal" in names  # thermal outputs appear automatically
    assert "depth" in names and "accumulation" in names
    assert not any(n.startswith("prop_") for n in names)


def test_crop_aabb_restricts_rendering(tiny_trainer):
    """A zero-ish crop box far from the scene must render ~empty
    accumulation, while the full box renders normally."""
    params = tiny_trainer.host_params()
    cams = tiny_trainer.datamanager.eval_cameras
    full = tiny_trainer.model.get_outputs_for_camera(
        params, cams, 0, width=16, height=16
    )
    cropped = tiny_trainer.model.get_outputs_for_camera(
        params, cams, 0, width=16, height=16,
        crop_aabb=[[50.0, 50.0, 50.0], [50.1, 50.1, 50.1]],
    )
    assert float(np.mean(cropped["accumulation"])) < 1e-3
    assert float(np.mean(full["accumulation"])) > float(
        np.mean(cropped["accumulation"])
    )


def test_viewer_ws_protocol_render_and_export(tiny_trainer, tmp_path):
    """Drive the real server over a websocket: outputs handshake, a cropped
    camera render (JPEG reply), and a pointcloud export (file written)."""
    websockets = pytest.importorskip("websockets")
    from nerfstudio_thermal_tpu.viewer.server import (
        ViewerServer,
        make_model_export_fn,
        make_model_render_fn,
        probe_output_names,
    )

    trainer = tiny_trainer
    params = trainer.host_params()
    cams = trainer.datamanager.eval_cameras
    port = 7399
    server = ViewerServer(
        make_model_render_fn(trainer.model, lambda: params),
        output_names=probe_output_names(trainer.model, params, cams),
        port=port,
        save_dir=tmp_path,
        export_fn=make_model_export_fn(
            trainer.model, lambda: params, cams, tmp_path
        ),
    )
    server.start(block=False)

    async def connect_with_retry():
        for _ in range(40):  # server thread needs a moment to bind
            try:
                return await websockets.connect(
                    f"ws://localhost:{port + 1}", max_size=None, open_timeout=30
                )
            except OSError:
                await asyncio.sleep(0.25)
        raise TimeoutError("viewer websocket never came up")

    async def drive():
        async with await connect_with_retry() as ws:
            hello = json.loads(await asyncio.wait_for(ws.recv(), 30))
            assert hello["type"] == "outputs"
            assert "rgb_thermal" in hello["names"]

            c2w = np.eye(4, dtype=np.float32)[:3]
            c2w[0, 3] = 2.0
            await ws.send(json.dumps({
                "type": "camera", "c2w": c2w.tolist(), "width": 256,
                "aspect": 1.0, "output": "rgb_thermal",
                "crop": [[-1, -1, -1], [1, 1, 1]],
            }))
            stats = json.loads(await asyncio.wait_for(ws.recv(), 120))
            assert stats["type"] == "stats"
            jpeg = await asyncio.wait_for(ws.recv(), 120)
            assert isinstance(jpeg, (bytes, bytearray)) and jpeg[:2] == b"\xff\xd8"

            await ws.send(json.dumps({"type": "export", "kind": "pointcloud"}))
            reply = json.loads(await asyncio.wait_for(ws.recv(), 300))
            assert reply["type"] == "exported", reply
            assert "error" not in reply, reply
            assert Path(reply["path"]).exists()
            assert Path(reply["path"]).suffix == ".ply"

    asyncio.run(drive())


def test_viewer_progressive_refinement(tiny_trainer, tmp_path):
    """A camera message above the coarsest bucket must stream a coarse frame
    first, then a refined final frame (reference render_state_machine.py's
    low-res-while-moving / high-quality-on-idle behavior), with per-bucket
    render times reported."""
    websockets = pytest.importorskip("websockets")
    from nerfstudio_thermal_tpu.viewer.server import (
        ViewerServer,
        make_model_render_fn,
    )

    trainer = tiny_trainer
    params = trainer.host_params()
    port = 7421
    server = ViewerServer(
        make_model_render_fn(trainer.model, lambda: params),
        output_names=["rgb"],
        port=port,
        save_dir=tmp_path,
    )
    server.start(block=False)

    async def connect_with_retry():
        for _ in range(40):
            try:
                return await websockets.connect(
                    f"ws://localhost:{port + 1}", max_size=None, open_timeout=30
                )
            except OSError:
                await asyncio.sleep(0.25)
        raise TimeoutError("viewer websocket never came up")

    async def drive():
        async with await connect_with_retry() as ws:
            hello = json.loads(await asyncio.wait_for(ws.recv(), 30))
            assert hello["type"] == "outputs"
            c2w = np.eye(4, dtype=np.float32)[:3]
            c2w[0, 3] = 2.0
            await ws.send(json.dumps({
                "type": "camera", "c2w": c2w.tolist(), "width": 512,
                "aspect": 1.0, "output": "rgb", "fov": 75.0,
            }))
            frames = []
            for _ in range(2):  # coarse then final
                stats = json.loads(await asyncio.wait_for(ws.recv(), 300))
                assert stats["type"] == "stats", stats
                jpeg = await asyncio.wait_for(ws.recv(), 300)
                assert jpeg[:2] == b"\xff\xd8"
                frames.append(stats)
            assert [f["width"] for f in frames] == [256, 512]
            assert [f["final"] for f in frames] == [False, True]
            assert set(frames[-1]["bucket_render_ms"]) == {"256", "512"}

    asyncio.run(drive())
    assert set(server.bucket_render_ms) == {256, 512}


def test_probe_output_names_with_empty_eval_split(tiny_trainer):
    """Datasets whose split leaves zero eval cameras must still probe
    (session-2 fix: index 0 of a 0-camera stack crashed the probe and the
    viewer fell back to a bare ['rgb'] list)."""
    import jax

    from nerfstudio_thermal_tpu.viewer.server import probe_output_names

    empty = jax.tree.map(
        lambda x: x[:0], tiny_trainer.datamanager.eval_cameras
    )
    names = probe_output_names(
        tiny_trainer.model, tiny_trainer.host_params(), empty
    )
    assert "rgb_thermal" in names  # real enumeration, not the fallback


def test_platform_env_reassertion(monkeypatch):
    """apply_platform_env must re-assert $JAX_PLATFORMS over a plugin's
    jax.config.update('jax_platforms', ...) (session-2 fix: the axon
    sitecustomize clobbers the env var, so `JAX_PLATFORMS=cpu ns-train`
    hung on the tunnel)."""
    import jax

    from nerfstudio_thermal_tpu.utils.precision import apply_platform_env

    before = jax.config.jax_platforms
    try:
        jax.config.update("jax_platforms", "cpu,cpu")  # plugin-style clobber
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        apply_platform_env()
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", before)


def _stub_server(tmp_path, port, train_control=None):
    from nerfstudio_thermal_tpu.viewer.server import ViewerServer

    def render_fn(c2w, width, height, output, crop=None, fov=60.0):
        val = {"rgb": 0.25, "depth": 0.75}.get(output, 0.5)
        return np.full((height, width, 3), val, np.float32)

    return ViewerServer(
        render_fn, output_names=["rgb", "depth"], port=port,
        save_dir=tmp_path, train_control=train_control,
    )


def test_render_split_composites(tmp_path):
    """Split-output compare: left half from the primary output, right half
    from the split output, with a white divider at the split column
    (reference control panel split slider)."""
    server = _stub_server(tmp_path, 7461)
    img = server._render_split(
        np.eye(4, dtype=np.float32)[:3], 64, 32, "rgb",
        None, 60.0, split_output="depth", split_frac=0.5,
    )
    assert img.shape == (32, 64, 3)
    assert np.allclose(img[:, :30], 0.25)
    assert np.allclose(img[:, 34:], 0.75)
    assert np.allclose(img[:, 31:33], 1.0)  # divider
    # no split selected -> the plain render
    same = server._render_split(
        np.eye(4, dtype=np.float32)[:3], 64, 32, "rgb", None, 60.0,
    )
    assert np.allclose(same, 0.25)


def test_viewer_train_control_and_stats_ws(tmp_path):
    """Pause/resume round-trips over the websocket and live train stats
    broadcast to connected clients (reference viewer pause-training button
    + stats markdown)."""
    websockets = pytest.importorskip("websockets")

    paused = {"v": False}

    def control(action):
        if action == "pause":
            paused["v"] = True
        elif action == "resume":
            paused["v"] = False
        return {"paused": paused["v"], "step": 7}

    port = 7471
    server = _stub_server(tmp_path, port, train_control=control)
    server.start(block=False)

    async def connect_with_retry():
        for _ in range(40):
            try:
                return await websockets.connect(
                    f"ws://localhost:{port + 1}", max_size=None,
                    open_timeout=30,
                )
            except OSError:
                await asyncio.sleep(0.25)
        raise TimeoutError("viewer websocket never came up")

    async def drive():
        async with await connect_with_retry() as ws:
            hello = json.loads(await asyncio.wait_for(ws.recv(), 30))
            assert hello["type"] == "outputs"

            await ws.send(json.dumps(
                {"type": "train_control", "action": "pause"}
            ))
            reply = json.loads(await asyncio.wait_for(ws.recv(), 30))
            assert reply == {"type": "train_state", "paused": True, "step": 7}
            assert paused["v"] is True

            await ws.send(json.dumps(
                {"type": "train_control", "action": "resume"}
            ))
            reply = json.loads(await asyncio.wait_for(ws.recv(), 30))
            assert reply["paused"] is False

            # trainer-side stats push reaches the connected client
            server.update_train_stats(
                {"step": 42, "rays_per_sec": 1000.0, "loss": 0.5}
            )
            reply = json.loads(await asyncio.wait_for(ws.recv(), 30))
            assert reply["type"] == "train_stats"
            assert reply["step"] == 42 and reply["loss"] == 0.5

    asyncio.run(drive())


def test_trainer_viewer_control_hooks(tiny_trainer):
    """The trainer's viewer control callback drives the pause/step events
    the train loop waits on."""
    t = tiny_trainer
    state = t._viewer_train_control("pause")
    assert state["paused"] is True and t._pause_event.is_set()
    t._viewer_train_control("step")
    assert t._step_once.is_set()
    t._step_once.clear()
    state = t._viewer_train_control("resume")
    assert state["paused"] is False and not t._pause_event.is_set()
    assert t._step_once.is_set()  # resume wakes the wait loop
    t._step_once.clear()
    with pytest.raises(ValueError):
        t._viewer_train_control("bogus")


def test_save_path_per_transition_durations(tmp_path):
    """Per-keyframe transition durations reach the spline export: total
    frames == fps * sum(durations), including the loop-back segment."""
    server = _stub_server(tmp_path, 7481)
    k0 = np.eye(4, dtype=np.float32)[:3]
    k1 = k0.copy(); k1[0, 3] = 1.0
    k2 = k0.copy(); k2[1, 3] = 1.0
    path = server.save_camera_path({
        "keyframes": [k.tolist() for k in (k0, k1, k2)],
        "fovs": [50.0, 60.0, 70.0],
        "durations": [1.0, 2.0, 1.0],  # 3 segments: loop
        "fps": 10.0,
        "loop": True,
    })
    payload = json.loads(Path(path).read_text())
    assert len(payload["camera_path"]) == 40  # 10 fps * 4 s
    fovs = [f["fov"] for f in payload["camera_path"]]
    assert min(fovs) >= 45.0 and max(fovs) <= 75.0


def test_colormap_and_time_forwarded_over_ws(tmp_path):
    """The camera message's colormap dict + time value reach the render fn
    (reference control_panel.py colormap section / dnerf time slider); a
    legacy render fn WITHOUT those kwargs keeps working when the client
    sends neither."""
    websockets = pytest.importorskip("websockets")
    from nerfstudio_thermal_tpu.viewer.server import ViewerServer

    seen = {}

    def render_fn(c2w, width, height, output, crop=None, fov=60.0,
                  colormap=None, time=None):
        seen["colormap"] = colormap
        seen["time"] = time
        return np.full((height, width, 3), 0.5, np.float32)

    port = 7481
    server = ViewerServer(
        render_fn, output_names=["rgb"], port=port, save_dir=tmp_path
    )
    server.start(block=False)

    async def connect_with_retry():
        for _ in range(40):
            try:
                return await websockets.connect(
                    f"ws://localhost:{port + 1}", max_size=None,
                    open_timeout=30,
                )
            except OSError:
                await asyncio.sleep(0.25)
        raise TimeoutError("viewer websocket never came up")

    async def drive():
        async with await connect_with_retry() as ws:
            hello = json.loads(await asyncio.wait_for(ws.recv(), 30))
            assert hello["type"] == "outputs"
            await ws.send(json.dumps({
                "type": "camera",
                "c2w": np.eye(4)[:3].tolist(),
                "width": 64, "aspect": 2.0, "output": "rgb",
                "colormap": {"name": "viridis", "invert": True,
                             "normalize": True, "min": 0.1, "max": 0.9},
                "time": 0.25,
            }))
            # progressive loop replies with stats JSON then a binary JPEG
            reply = json.loads(await asyncio.wait_for(ws.recv(), 30))
            assert reply["type"] in ("frame", "stats") or "width" in reply

    asyncio.run(drive())
    assert seen["colormap"]["name"] == "viridis"
    assert seen["colormap"]["invert"] is True
    assert seen["time"] == 0.25


def test_legacy_render_fn_without_colormap_kwargs(tmp_path):
    """_render only forwards colormap/time when SET, so a plain
    (c2w, w, h, output, crop, fov) render fn stays compatible."""
    server = _stub_server(tmp_path, 7491)
    img = server._render(
        np.eye(4, dtype=np.float32)[:3], 8, 8, "rgb", None, 60.0,
        colormap=None, time=None,
    )
    assert img.shape == (8, 8, 3)


def test_model_render_fn_applies_colormap_and_time(tiny_trainer):
    """make_model_render_fn: a 1-channel output (accumulation) is colormapped
    to 3 channels honoring invert, and a time value flows into Cameras.times
    without breaking a time-free model."""
    from nerfstudio_thermal_tpu.viewer.server import make_model_render_fn

    trainer = tiny_trainer
    params = trainer.host_params()
    render = make_model_render_fn(trainer.model, lambda: params)
    c2w = np.asarray(
        trainer.datamanager.eval_cameras.camera_to_worlds[0], np.float32
    )
    plain = render(c2w, 16, 16, "accumulation",
                   colormap={"name": "gray"})
    inv = render(c2w, 16, 16, "accumulation",
                 colormap={"name": "gray", "invert": True})
    assert plain.shape == (16, 16, 3) and inv.shape == (16, 16, 3)
    assert np.allclose(np.clip(plain, 0, 1) + np.clip(inv, 0, 1), 1.0,
                       atol=1e-5)
    # a time value must not crash a static-scene model
    timed = render(c2w, 16, 16, "rgb", time=0.5)
    assert timed.shape[-1] == 3
