"""Real-time web viewer: HTTP page + websocket render loop.

Behavioral spec: reference `nerfstudio/viewer/viewer.py:55` +
`render_state_machine.py:54-236` — a browser client orbits a camera; the
server renders through the model and streams JPEGs back, dropping to lower
resolution while the camera moves and re-rendering at high quality on idle.
The reference uses viser (not available here); this is a self-contained
asyncio websockets server with an embedded HTML client.

Render resolutions are bucketed so each bucket's jitted render program is
compiled once and reused (jit static shapes vs dynamic viewer resolution —
SURVEY.md §7.3).

Progressive refinement: each camera update renders the COARSEST bucket first
(one compiled executable, small ray count -> interactive latency even when a
full-resolution frame takes seconds), then climbs the bucket ladder toward
the requested resolution while the camera stays idle; a new camera message
aborts the climb and restarts coarse (reference render_state_machine.py's
low_move/high-quality-on-idle states, :54-236). Per-bucket render times are
tracked on the server (`bucket_render_ms`) and streamed in every stats
message."""

import asyncio
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, Optional

import numpy as np

from nerfstudio_thermal_tpu.viewer.client_html import CLIENT_HTML

RESOLUTION_BUCKETS = (256, 512, 1024, 1920)


class _PageHandler(BaseHTTPRequestHandler):
    def do_GET(self):
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.end_headers()
        self.wfile.write(CLIENT_HTML.encode())

    def log_message(self, *args):
        pass


class ViewerServer:
    """Serves the client page on `port` and websockets on `port + 1`."""

    def __init__(
        self,
        render_fn: Callable[..., Dict[str, np.ndarray]],
        output_names,
        port: int = 7007,
        train_lock: Optional[threading.Lock] = None,
        save_dir=None,
        export_fn: Optional[Callable[..., str]] = None,
        train_control: Optional[Callable[[str], dict]] = None,
    ):
        """render_fn(c2w [3,4], width, height, output_name, crop=None,
        fov=60.0) -> image [H,W,3]; crop is an optional [2,3] world AABB
        (the viewer crop tool, reference viewer/control_panel.py), fov the
        requested vertical field of view in degrees.
        save_dir: where exported camera paths are written (default cwd).
        export_fn(kind, crop=None) -> path: runs a geometry export
        (pointcloud/tsdf; reference viewer/export_panel.py).
        train_control(action) -> status dict: pause/resume/step/status hook
        into the live trainer (reference viewer pause-training control,
        viewer/viewer.py training_state)."""
        self.render_fn = render_fn
        self.output_names = list(output_names)
        self.port = port
        self.train_lock = train_lock or threading.Lock()
        self.save_dir = save_dir
        self.export_fn = export_fn
        self.train_control = train_control
        self._http = None
        self._thread = None
        self._loop = None  # the ws event loop (for cross-thread broadcast)
        self._clients = set()
        self._train_stats: Dict[str, float] = {}
        # last measured render wall time per resolution bucket (ms) — the
        # 1080p interactivity evidence the bench/README quote
        self.bucket_render_ms: Dict[int, float] = {}

    def start(self, block: bool = False):
        self._http = ThreadingHTTPServer(("0.0.0.0", self.port), _PageHandler)
        threading.Thread(target=self._http.serve_forever, daemon=True).start()
        self._thread = threading.Thread(target=self._run_ws, daemon=True)
        self._thread.start()
        print(
            f"viewer running at http://localhost:{self.port} "
            f"(websocket on {self.port + 1})"
        )
        if block:
            self._thread.join()

    def _run_ws(self):
        asyncio.run(self._ws_main())

    def update_train_stats(self, stats: Dict[str, float]):
        """Called by the trainer (any thread) at log cadence; pushes a live
        train_stats message to every connected client (reference viewer
        stats markdown: step / rays-per-sec / train util)."""
        self._train_stats = dict(stats)
        if self._loop is None:
            return
        payload = json.dumps({"type": "train_stats", **self._train_stats})

        def _broadcast():
            for ws in list(self._clients):
                asyncio.ensure_future(self._safe_send(ws, payload))

        try:
            self._loop.call_soon_threadsafe(_broadcast)
        except RuntimeError:
            pass  # loop shut down

    @staticmethod
    async def _safe_send(ws, payload):
        try:
            await ws.send(payload)
        except Exception:  # noqa: BLE001 — a gone client must not raise
            pass

    async def _ws_main(self):
        import websockets

        self._loop = asyncio.get_running_loop()

        async def handler(ws):
            self._clients.add(ws)
            await ws.send(json.dumps({"type": "outputs", "names": self.output_names}))
            if self._train_stats:
                await ws.send(json.dumps(
                    {"type": "train_stats", **self._train_stats}
                ))
            # latest-wins camera state consumed by a per-connection
            # progressive render task
            state = {"seq": 0, "cam": None}
            wake = asyncio.Event()
            render_task = asyncio.create_task(
                self._progressive_loop(ws, state, wake)
            )
            try:
                async for message in ws:
                    try:
                        msg = json.loads(message)
                    except json.JSONDecodeError:
                        continue
                    if msg.get("type") == "camera":
                        state["seq"] += 1
                        state["cam"] = msg
                        wake.set()
                        continue
                    await self._handle_control(ws, msg)
            finally:
                self._clients.discard(ws)
                render_task.cancel()

        async with websockets.serve(handler, "0.0.0.0", self.port + 1, max_size=None):
            await asyncio.Future()

    async def _handle_control(self, ws, msg):
        if msg.get("type") == "train_control":
            # pause / resume / step / status (reference viewer pause button)
            if self.train_control is None:
                await ws.send(json.dumps(
                    {"type": "train_state", "error": "no trainer attached"}
                ))
                return
            try:
                status = self.train_control(msg.get("action", "status"))
                await ws.send(json.dumps({"type": "train_state", **status}))
            except Exception as e:  # noqa: BLE001 — keep the ws alive
                await ws.send(json.dumps(
                    {"type": "train_state", "error": str(e)}
                ))
            return
        if msg.get("type") == "save_path":
            try:
                path = self.save_camera_path(msg)
                await ws.send(json.dumps({"type": "saved", "path": str(path)}))
            except Exception as e:
                await ws.send(json.dumps({"type": "saved", "error": str(e)}))
            return
        if msg.get("type") == "export":
            if self.export_fn is None:
                await ws.send(json.dumps(
                    {"type": "exported", "error": "no exporter wired"}
                ))
                return
            kind = msg.get("kind", "pointcloud")
            crop = msg.get("crop")
            loop = asyncio.get_running_loop()
            try:
                path = await loop.run_in_executor(None, self._export, kind, crop)
                await ws.send(json.dumps(
                    {"type": "exported", "path": str(path)}
                ))
            except Exception as e:
                await ws.send(json.dumps(
                    {"type": "exported", "error": str(e)}
                ))

    async def _progressive_loop(self, ws, state, wake):
        """Consume the latest camera state; render the coarsest bucket first,
        then climb toward the requested bucket while no newer camera message
        arrives. Stale refinements are dropped; a stale COARSE frame is still
        sent (it is the freshest complete frame and keeps motion fluid)."""
        import websockets

        loop = asyncio.get_running_loop()
        try:
            await self._progressive_body(ws, state, wake, loop)
        except (websockets.exceptions.ConnectionClosed, OSError):
            return  # client went away mid-render; exit without tracebacks

    async def _progressive_body(self, ws, state, wake, loop):
        while True:
            await wake.wait()
            wake.clear()
            seq, msg = state["seq"], state["cam"]
            c2w = np.asarray(msg["c2w"], np.float32)
            target = min(
                RESOLUTION_BUCKETS,
                key=lambda b: abs(b - int(msg.get("width", 512))),
            )
            aspect = float(msg.get("aspect", 16 / 9))
            output = msg.get("output", "rgb")
            crop = msg.get("crop")  # [[minx,y,z],[maxx,y,z]] or None
            fov = float(msg.get("fov", 60.0))
            # split-screen compare (reference control panel split-output
            # slider): second output rendered and composited left|right
            split_output = msg.get("output_split") or None
            split_frac = float(msg.get("split_fraction", 0.5))
            # per-output colormap controls + dnerf time slider (reference
            # viewer/control_panel.py colormap section / time slider)
            colormap = msg.get("colormap") or None
            time_val = msg.get("time")
            ladder = [b for b in RESOLUTION_BUCKETS if b <= target] or [target]
            for width in ladder:
                height = max(int(width / max(aspect, 1e-3)) // 8 * 8, 8)
                t0 = time.perf_counter()
                try:
                    img = await loop.run_in_executor(
                        None, self._render_split, c2w, width, height, output,
                        crop, fov, split_output, split_frac, colormap,
                        time_val,
                    )
                except Exception as e:  # noqa: BLE001 — keep the loop alive
                    await ws.send(json.dumps(
                        {"type": "stats", "error": str(e), "width": width,
                         "height": height}
                    ))
                    break
                dt = (time.perf_counter() - t0) * 1000
                self.bucket_render_ms[width] = dt
                stale = state["seq"] != seq
                if stale and width != ladder[0]:
                    break  # a fresher coarse frame is about to render
                jpeg = _to_jpeg(img)
                await ws.send(json.dumps({
                    "type": "stats", "render_ms": dt, "width": width,
                    "height": height, "seq": seq,
                    "final": width == target,
                    "bucket_render_ms": {
                        str(k): round(v, 1)
                        for k, v in sorted(self.bucket_render_ms.items())
                    },
                }))
                await ws.send(jpeg)
                if stale:
                    break

    def _render(self, c2w, width, height, output, crop=None, fov=60.0,
                colormap=None, time=None):
        # serialize against training (reference trainer.py:113,239 train_lock)
        with self.train_lock:
            kwargs = {"crop": crop, "fov": fov}
            # optional controls: only forwarded when set, so plain
            # (c2w, w, h, output, crop, fov) render fns keep working
            if colormap is not None:
                kwargs["colormap"] = colormap
            if time is not None:
                kwargs["time"] = time
            return self.render_fn(c2w, width, height, output, **kwargs)

    def _render_split(self, c2w, width, height, output, crop, fov,
                      split_output=None, split_frac=0.5, colormap=None,
                      time=None):
        """Render `output`, and when a second output is selected composite
        the two left|right at `split_frac` with a 2px divider (reference
        viewer split-output compare)."""
        img = np.asarray(self._render(
            c2w, width, height, output, crop, fov, colormap, time
        ))
        if not split_output or split_output == output:
            return img
        other = np.asarray(self._render(
            c2w, width, height, split_output, crop, fov, colormap, time
        ))
        if img.shape[-1] != other.shape[-1]:  # e.g. rgb vs 1-ch depth map
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            if other.shape[-1] == 1:
                other = np.repeat(other, 3, axis=-1)
        col = int(np.clip(split_frac, 0.0, 1.0) * img.shape[1])
        out = np.concatenate([img[:, :col], other[:, col:]], axis=1)
        out[:, max(col - 1, 0):min(col + 1, out.shape[1])] = 1.0
        return out

    def _export(self, kind, crop=None):
        with self.train_lock:
            return self.export_fn(kind, crop=crop)

    def save_camera_path(self, msg: dict):
        """Viewer render-panel analogue (reference viewer/render_panel.py):
        spline-interpolate the recorded keyframes (Kochanek-Bartels position
        + fov splines, spherical squad orientation spline, per-keyframe
        transition durations, optional loop) into a camera_path.json
        consumable by `ns-render camera-path`."""
        from pathlib import Path

        from nerfstudio_thermal_tpu.cameras.camera_paths import (
            interpolate_camera_path_spline,
        )

        keyframes = [np.asarray(k, np.float32) for k in msg["keyframes"]]
        if not keyframes:
            raise ValueError("no keyframes recorded")
        fps = float(msg.get("fps", 24.0))
        seconds = float(msg.get("seconds", 4.0))
        default_fov = float(msg.get("fov", 60.0))
        fovs = msg.get("fovs")  # per-keyframe overrides (render panel)
        if fovs is None:
            fovs = [default_fov] * len(keyframes)
        width = int(msg.get("width", 1920))
        height = int(msg.get("height", 1080))
        loop = bool(msg.get("loop", False))

        durations = msg.get("durations") or None  # [] -> uniform fallback
        poses, out_fovs = interpolate_camera_path_spline(
            keyframes,
            fovs=fovs,
            durations=durations,
            fps=fps,
            seconds=seconds,
            loop=loop,
            tension=float(msg.get("tension", 0.0)),
        )

        def to16(p):
            m = np.eye(4, dtype=np.float32)
            m[:3, :4] = p[:3, :4]
            return m.reshape(-1).tolist()

        payload = {
            "camera_type": "perspective",
            "render_height": height,
            "render_width": width,
            "fps": fps,
            "seconds": seconds,
            "loop": loop,
            "camera_path": [
                {"camera_to_world": to16(p), "fov": float(f)}
                for p, f in zip(poses, out_fovs)
            ],
        }
        out_dir = Path(self.save_dir or ".") / "camera_paths"
        out_dir.mkdir(parents=True, exist_ok=True)
        dest = out_dir / f"viewer_path_{int(time.time())}.json"
        dest.write_text(json.dumps(payload, indent=2))
        print(f"viewer: wrote camera path {dest} ({len(poses)} frames)")
        return dest


def _to_jpeg(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    Image.fromarray(arr).save(buf, format="JPEG", quality=85)
    return buf.getvalue()


def probe_output_names(model, params, cameras=None) -> list:
    """Enumerate the model's actual render outputs by rendering one tiny
    image (reference viewer enumerates model output keys so e.g. thermal
    outputs of any method appear automatically, viewer/control_panel.py).
    Falls back to ['rgb'] if probing fails."""
    import jax.numpy as jnp

    from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType

    try:
        if cameras is not None and int(cameras.camera_to_worlds.shape[0]) == 0:
            cameras = None  # empty eval split: probe with a synthetic camera
        if cameras is None:
            c2w = np.eye(4, dtype=np.float32)[:3][None]
            c2w[:, 0, 3] = 2.0
            cameras = Cameras(
                camera_to_worlds=jnp.asarray(c2w),
                fx=jnp.asarray([16.0]), fy=jnp.asarray([16.0]),
                cx=jnp.asarray([8.0]), cy=jnp.asarray([8.0]),
                width=jnp.asarray([16], jnp.int32),
                height=jnp.asarray([16], jnp.int32),
                camera_type=jnp.asarray(
                    [CameraType.PERSPECTIVE.value], jnp.int32
                ),
            )
        out = model.get_outputs_for_camera(
            params, cameras, 0, width=16, height=16
        )
        names = [
            k for k, v in out.items()
            if np.asarray(v).ndim == 3
            and np.asarray(v).shape[-1] in (1, 3, 4)  # displayable channels
            and not k.startswith("prop_")
        ]
        # rgb first for the default selection
        names.sort(key=lambda k: (k != "rgb", k))
        return names or ["rgb"]
    except Exception as e:
        print(f"viewer: output probe failed ({e}); defaulting to rgb")
        return ["rgb"]


def make_model_export_fn(model, params_fn, cameras, out_dir):
    """Viewer export-tab backend (reference viewer/export_panel.py): runs a
    geometry exporter against current params; returns the written path."""
    from pathlib import Path

    def export(kind: str, crop=None):
        dest = Path(out_dir) / "exports"
        dest.mkdir(parents=True, exist_ok=True)
        params = params_fn()
        stamp = int(time.time())
        if kind == "pointcloud":
            from nerfstudio_thermal_tpu.exporter.exporter_utils import (
                generate_point_cloud,
                write_ply,
            )

            pts, cols = generate_point_cloud(
                model, params, cameras, num_cameras=4, stride=4
            )[:2]
            if crop is not None:
                box = np.asarray(crop, np.float32).reshape(2, 3)
                keep = np.all((pts >= box[0]) & (pts <= box[1]), axis=-1)
                pts, cols = pts[keep], cols[keep]
            path = dest / f"point_cloud_{stamp}.ply"
            write_ply(path, pts, cols)
            return path
        if kind == "tsdf":
            from nerfstudio_thermal_tpu.exporter.tsdf_utils import export_tsdf_mesh

            kw = {}
            if crop is not None:
                box = np.asarray(crop, np.float32).reshape(2, 3)
                kw = dict(
                    use_bounding_box=True,
                    bounding_box_min=tuple(box[0]),
                    bounding_box_max=tuple(box[1]),
                )
            return export_tsdf_mesh(
                model, params, cameras, dest, resolution=64,
                filename=f"tsdf_mesh_{stamp}.ply", **kw,
            )
        raise ValueError(f"unknown export kind '{kind}' (pointcloud|tsdf)")

    return export


def make_model_render_fn(model, params_fn, fov_degrees: float = 60.0):
    """Bridge a Model to the viewer: builds a Cameras pytree per request and
    renders chunked (reference render_state_machine._render_img:118-165)."""
    import jax.numpy as jnp

    from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType
    from nerfstudio_thermal_tpu.utils import colormaps

    def render(c2w, width, height, output, crop=None, fov=None,
               colormap=None, time=None):
        focal = height / (2 * np.tan(np.radians(fov or fov_degrees) / 2))
        cameras = Cameras(
            camera_to_worlds=jnp.asarray(c2w)[None],
            fx=jnp.asarray([focal]),
            fy=jnp.asarray([focal]),
            cx=jnp.asarray([width / 2]),
            cy=jnp.asarray([height / 2]),
            width=jnp.asarray([width], jnp.int32),
            height=jnp.asarray([height], jnp.int32),
            camera_type=jnp.asarray([CameraType.PERSPECTIVE.value], jnp.int32),
            # dnerf-style time-conditioned scenes: the viewer time slider
            # renders the scene at t in [0,1] (reference control_panel.py
            # time slider; Cameras.times flows into the ray bundle)
            times=None if time is None else jnp.asarray(
                [float(np.clip(time, 0.0, 1.0))]
            ),
        )
        # Device-resident render; fetch ONLY the displayed output (plus the
        # accumulation a depth colormap needs). The tunnel's measured D2H
        # bandwidth is ~17.5 MB/s — fetching every output of a 1080p frame
        # costs ~9 s, the one displayed image ~1.4 s.
        dev = model.render_camera_device(
            params_fn(), cameras, 0, width=width, height=height,
            crop_aabb=crop,
        )
        key = output if output in dev else "rgb"

        def fetch(v):
            # ray models return flat [h*w, C]; splat/generative return
            # [h, w, C] images at their native resolution — keep those as-is
            a = np.asarray(v)
            return a if a.ndim == 3 else a.reshape(height, width, -1)

        img = fetch(dev[key])
        # Per-output colormap controls (reference control_panel.py colormap
        # section): name/invert/normalize/min/max apply to every non-RGB
        # output; depth additionally normalizes by range and masks by
        # accumulation.
        opts = colormaps.ColormapOptions()
        if colormap:
            opts = colormaps.ColormapOptions(
                colormap=str(colormap.get("name", "default")),
                normalize=bool(colormap.get("normalize", False)),
                colormap_min=float(colormap.get("min", 0.0)),
                colormap_max=float(colormap.get("max", 1.0)),
                invert=bool(colormap.get("invert", False)),
            )
        # colormap keys off the RESOLVED output: when a requested
        # 'depth_thermal' is absent and key fell back to 'rgb', the RGB
        # image must not be depth-colormapped
        if "depth" in key:
            suffix = "_thermal" if key.endswith("_thermal") else ""
            acc = dev.get(f"accumulation{suffix}")
            img = colormaps.apply_depth_colormap(
                img, accumulation=None if acc is None else fetch(acc),
                colormap_options=opts,
            )
        elif img.ndim == 3 and img.shape[-1] == 1:
            try:
                img = colormaps.apply_colormap(
                    np.asarray(img, np.float32), opts
                )
            except Exception:  # noqa: BLE001 — unknown map name: raw image
                pass
        return img

    return render
