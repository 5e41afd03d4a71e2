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
