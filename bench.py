"""Benchmark: thermal-nerfacto training throughput (TRAIN_RAYS_PER_SEC).

Prints one JSON line per benchmarked config; the LAST line is the flagship
(`thermal-nerfacto-tpu`, the shipped TPU configuration: compute-dense
frequency-MLP fields, (128,48)/32 sampling schedule validated for PSNR parity
in tests/engine/test_convergence.py, 25%-subsampled cross-density
regularizer). The first line benchmarks the reference-parity hash-grid
config (`thermal-nerfacto`: 16-level 2^19 hash grid, (256,96)/48) whose
random gathers lower to a ~serial XLA path on v5e.

    {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s", "vs_baseline": R}

vs_baseline is value / 200_000: the reference publishes no numbers
(BASELINE.md), so the denominator is the commonly observed ~200k train
rays/s of tcnn-backed nerfacto-class models on a single A100.
"""

import functools
import json
import os
import time

import numpy as np

A100_BASELINE_RAYS_PER_SEC = 200_000.0

# Hard wall-clock budget for the whole bench (the driver's own timeout killed
# round 3 at rc=124 with no flagship line; everything here is scheduled
# against this deadline and the flagship line is printed from a finally).
# 1200 s: BENCH_r03's tail proves the driver let >=~1900 s elapse (a 600 s
# candidate plus completed hash+parity rows plus two 420 s eval timeouts)
# before killing, and the r4 run finished rc=0 at 460 — so 1200 keeps a
# ~700 s safety margin while giving slow terminals (cold compiles vary
# 3x between sessions, ~190 s to ~600 s for the flagship program) room to
# finish the must-have rows.
_BUDGET_S = float(os.environ.get("NS_BENCH_BUDGET", 1200))
_START = time.monotonic()


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _START)


# Persistent XLA compilation cache: verified to work through the axon
# remote-compile tunnel (cold 3.3 s -> warm 0.7 s on a 12-layer probe).
# Warmed by any earlier in-session run of the same program, it turns the
# ~3 min candidate compiles into seconds for the driver's end-of-round run.
_PCC_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_pcc")


def _child_env(extra=None):
    env = {**os.environ, "JAX_COMPILATION_CACHE_DIR": _PCC_DIR}
    env.update(extra or {})
    return env


# ---------------------------------------------------------------------------
# Warm-cache stamp: the scheduler's caps assume seconds-per-program when the
# persistent compile cache holds this source tree's programs, and minutes when
# it does not (a VM reboot wipes /root/.cache; any HLO-affecting edit
# invalidates entries). tools/warm_bench_cache.sh writes the stamp after
# pre-compiling every bench program; a mismatch (or no stamp) puts main() in
# COLD mode: fused candidates are skipped (upside-only) and the parity row
# gets a cap that covers a cold compile — r4's tunnel wedge was precisely a
# parity child SIGTERM'd mid-cold-compile under a warm-sized 170 s cap.
_STAMP_PATH = os.path.join(_PCC_DIR, "WARM_STAMP")


# package dirs that cannot shape a bench-compiled program (host-side
# surfaces); edits there must not flip the driver bench into cold mode
_NON_HLO_DIRS = frozenset(
    {"viewer", "scripts", "exporter", "process_data", "generative", "plugins"}
)


def _source_fingerprint() -> str:
    """Hash of every HLO-shaping source file (the package + bench.py).
    Conservative: edits that cannot change a compiled program (outside
    _NON_HLO_DIRS) still invalidate, which only costs cold-mode
    scheduling, never a wedge."""
    import hashlib

    root = os.path.dirname(os.path.abspath(__file__))
    paths = [os.path.join(root, "bench.py")]
    pkg = os.path.join(root, "nerfstudio_thermal_tpu")
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(
            d for d in dirnames
            if d != "__pycache__"
            and not (dirpath == pkg and d in _NON_HLO_DIRS)
        )
        paths.extend(
            os.path.join(dirpath, fn) for fn in sorted(filenames)
            if fn.endswith(".py")
        )
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(os.path.relpath(p, root).encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _write_cache_stamp() -> None:
    os.makedirs(_PCC_DIR, exist_ok=True)
    with open(_STAMP_PATH, "w") as f:
        f.write(_source_fingerprint())


def _cache_is_warm() -> bool:
    try:
        with open(_STAMP_PATH) as f:
            return f.read().strip() == _source_fingerprint()
    except OSError:
        return False


def build_setup(
    method_name: str, overrides=None, cameras=None, is_thermal=None,
    num_rays: int = 8192,
):
    import jax
    import jax.numpy as jnp

    from nerfstudio_thermal_tpu.utils.precision import ensure_exact_f32_matmuls

    ensure_exact_f32_matmuls()

    from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType
    from nerfstudio_thermal_tpu.configs.method_configs import get_method_config
    from nerfstudio_thermal_tpu.engine.optimizers import build_optimizer
    from nerfstudio_thermal_tpu.model_components.ray_generators import RayGenerator
    from nerfstudio_thermal_tpu.models.thermal_nerfacto import ThermalNerfactoModel

    num_cameras = 64 if cameras is None else int(cameras.fx.shape[0])
    h, w = 480, 640

    parity_workload = method_name.endswith("@parity")
    if parity_workload:
        method_name = method_name[: -len("@parity")]
    method = get_method_config(method_name)
    cfg = method.model
    if parity_workload:
        # reference workload constants (BASELINE.md): (256,96) proposal +
        # 48 nerf samples/ray, full-rate cross-density regularizer
        cfg.num_proposal_samples_per_ray = (256, 96)
        cfg.num_nerf_samples_per_ray = 48
        if hasattr(cfg, "density_loss_rays_fraction"):
            cfg.density_loss_rays_fraction = 1.0
    for k, v in (overrides or {}).items():
        setattr(cfg, k, v)
    aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    if is_thermal is None:
        is_thermal = [i % 2 for i in range(num_cameras)]
    model = ThermalNerfactoModel(
        cfg, aabb, num_train_data=num_cameras, metadata={"is_thermal": is_thermal}
    )
    params = model.init_params(jax.random.PRNGKey(0))

    if cameras is None:
        angles = np.linspace(0, 2 * np.pi, num_cameras, endpoint=False)
        c2w = np.tile(np.eye(4, dtype=np.float32)[:3], (num_cameras, 1, 1))
        c2w[:, 0, 3] = 2.0 * np.cos(angles)
        c2w[:, 1, 3] = 2.0 * np.sin(angles)
        cameras = Cameras(
            camera_to_worlds=jnp.asarray(c2w),
            fx=jnp.full((num_cameras,), 500.0),
            fy=jnp.full((num_cameras,), 500.0),
            cx=jnp.full((num_cameras,), w / 2),
            cy=jnp.full((num_cameras,), h / 2),
            width=jnp.full((num_cameras,), w, jnp.int32),
            height=jnp.full((num_cameras,), h, jnp.int32),
            distortion_params=jnp.zeros((num_cameras, 6)),
            camera_type=jnp.full(
                (num_cameras,), CameraType.PERSPECTIVE.value, jnp.int32
            ),
        )
    ray_generator = RayGenerator(cameras)
    tx = build_optimizer(method.optimizers, params)
    opt_state = tx.init(params)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        n_patches = num_rays // 4
        cams = r.integers(0, num_cameras, n_patches)
        ys = r.integers(0, h - 2, n_patches)
        xs = r.integers(0, w - 2, n_patches)
        dy, dx = np.meshgrid([0, 1], [0, 1], indexing="ij")
        ray_indices = np.stack(
            [
                np.repeat(cams, 4),
                (ys[:, None, None] + dy).reshape(-1),
                (xs[:, None, None] + dx).reshape(-1),
            ],
            -1,
        ).astype(np.int32)
        return {
            "ray_indices": jnp.asarray(ray_indices),
            "image": jnp.asarray(r.uniform(size=(num_rays, 3)).astype(np.float32)),
            "is_thermal": jnp.asarray(np.repeat((cams % 2).astype(np.float32), 4)),
        }

    import optax

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, key, batch):
        def loss_fn(p):
            bundle = ray_generator(batch["ray_indices"])
            outputs = model.forward(p, bundle, train=True, rng=key)
            metrics = model.get_metrics_dict(p, outputs, batch, train=True)
            losses = model.get_loss_dict(
                p, outputs, batch, metrics, train=True, rng=key
            )
            return sum(jax.tree.leaves(losses)), losses

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step, params, opt_state, make_batch, num_rays


def _measure(method_name: str, n_steps: int, overrides=None) -> float:
    """Build + time one config; returns train rays/s."""
    import jax

    train_step, params, opt_state, make_batch, num_rays = build_setup(
        method_name, overrides
    )
    key = jax.random.PRNGKey(1)
    batches = [make_batch(i) for i in range(8)]

    # warmup / compile (float() forces a real device sync; block_until_ready
    # does not synchronize through the axon tunnel)
    for i in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sub, batches[i % 8])
    float(loss)

    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sub, batches[i % 8])
    float(loss)
    dt = time.perf_counter() - t0
    return num_rays * n_steps / dt


def _format(metric, rays_per_sec, method_name, note=""):
    return json.dumps(
        {
            "metric": metric,
            "value": round(rays_per_sec, 1),
            "unit": "rays/s",
            "vs_baseline": round(rays_per_sec / A100_BASELINE_RAYS_PER_SEC, 3),
            "config": method_name,
            "note": note,
        }
    )


def _emit(metric, rays_per_sec, method_name, note=""):
    print(_format(metric, rays_per_sec, method_name, note), flush=True)


def run(method_name: str, metric: str, n_steps: int) -> None:
    rays_per_sec = _measure(method_name, n_steps)
    _emit(
        metric, rays_per_sec, method_name,
        note=(
            "r2: 40.4k (r2-start, r1 code on this ~1.7x-slower terminal) -> 176k via pallas-on(base)/lean-schedule/25%-cross-density/no-proposal-camera-grads"
            if metric == "train_rays_per_sec" else ""
        ),
    )


def _run_child(cmd, env=None, timeout=600) -> str:
    """Run a candidate subprocess; SIGTERM first on timeout (lets the PJRT
    client close its device session — a straight SIGKILL mid-sync can wedge
    the tunnel), SIGKILL only if it ignores that. Returns stdout; if the
    child produced no JSON line, raise with its stderr tail (otherwise a
    crash surfaces only as an opaque IndexError upstream)."""
    import subprocess

    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env
    )
    try:
        out, err = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.terminate()
        try:
            proc.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.communicate()
        raise
    if not any(ln.startswith("{") for ln in out.splitlines()):
        tail = "\n".join(err.strip().splitlines()[-8:])
        raise RuntimeError(
            f"child produced no JSON (exit {proc.returncode}); stderr tail:\n{tail}"
        )
    return out


# Flagship fused-ray-march candidates, ROBUST FIRST: the shipped flagship
# default is the plain (fused_raymarch=False) config — it is the config that
# always completed under the driver while the fused program twice timed out
# compiling (BENCH_r03 rc=124). The fused kernels (ops/pallas/fused_mlp.py:
# fused_ray_mlp / fused_field_mlp) are equivalence-tested but each knob's
# end-to-end win on a live v5e depends on how the custom-calls interact with
# XLA's surrounding fusions, so the bench measures each candidate fail-soft
# and upgrades the flagship line only on success.
_FLAGSHIP_CANDIDATES = [
    ("default", {}),
    # kernel-tuned: fused-MLP save-acts backward (stream the forward's
    # activations instead of recomputing, ~1/3 less bwd MXU work) +
    # split-skip (skip layer as two matmuls, no misaligned concat).
    # Config-identical, env-gated. Microbenched on v5e at flagship base
    # shapes (tools/bench_kernel_variants.py, 2026-08-20): both 10.77 ms
    # fwd+grad vs 12.03 baseline / 11.31 save-acts-only / 11.63 split-only.
    ("kernel-tuned", {}),
    ("fray-base", {"fused_raymarch": True}),  # r3: 180.9k vs 178.0k off
]

# Measured and excluded (r4, live v5e, parallel backward — input grads OFF):
# fused proposals ("fray-props") lose ~2x (83.7k vs 149.8k default at equal
# conditions), same magnitude as r3's with-input-grads 90.3k. The loss is
# the kernel boundary breaking XLA's fusion of the surrounding resampling
# chain (same failure mode as the r3 color-head fusion), NOT the backward
# schedule — so the candidate is dropped rather than re-swept each round.
# fray-field (fused_field megakernel) is demoted to manual sweeps
# (tools/tpu_sweep_r3.sh): measured LOSING live on 2026-08-19 (143.3k vs
# default 149.8k rays/s, same warm run), while fray-base — the r3 winner —
# timed out compiling at a 1200 s cap in that run; each candidate slot
# must earn its warm-script cost and fray-base already carries the
# fused-raymarch bet.
_EXCLUDED_CANDIDATES = {
    "fray-props": {"fused_raymarch": True, "fused_raymarch_proposals": True},
    "fray-field": {"fused_raymarch": True, "fused_field": True},
}

# extra environment per candidate (subprocess-only)
_CANDIDATE_ENV = {
    "kernel-tuned": {"NS_FMLP_SAVE_ACTS": "1", "NS_FMLP_SPLIT_SKIP": "1"}
}


# Wall time of the first successful probe (device init + tiny-matmul
# compile, no persistent cache): ~4-6 s on a fast terminal, 15+ s when the
# session landed on a slow tunnel. Cold compiles of the big programs scale
# roughly with it (~190 s to ~600 s for the flagship program across
# observed sessions), so COLD-mode caps/floors multiply by _terminal_scale.
_PROBE_COLD_S = None


def _terminal_scale() -> float:
    if _PROBE_COLD_S is None:
        return 1.0
    return min(max(_PROBE_COLD_S / 5.0, 1.0), 3.0)


def _probe_device(timeout: float = 30.0) -> bool:
    """Tiny-matmul child: is the TPU actually reachable right now? A single
    candidate timeout must NOT be read as a dead device (r3's breakout
    heuristic was disproven within its own run). SIGTERM-first on timeout,
    like _run_child — a straight SIGKILL mid-device-init can worsen a
    wedged tunnel."""
    import subprocess
    import sys

    global _PROBE_COLD_S

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((128, 128), jnp.float32);"
        "print(float((x @ x).sum()))"
    )
    t0 = time.monotonic()
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        proc.communicate(timeout=timeout)
        if proc.returncode == 0 and _PROBE_COLD_S is None:
            _PROBE_COLD_S = time.monotonic() - t0
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        proc.terminate()
        try:
            proc.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.communicate()
        return False
    except Exception:  # noqa: BLE001
        return False


# set whenever a probe fails; every subsequent child spawn re-enters the
# wait-for-recovery loop instead of hanging a child against a wedged tunnel
# (SIGTERM'ing those children is what worsens the wedge — CLAUDE.md)
_device_suspect = False


def _gate_device() -> bool:
    """Cheap pass-through when the device was healthy at last contact;
    after any failed probe, block in the recovery loop before spawning
    more children. Returns False when the budget ran out first."""
    global _device_suspect
    if not _device_suspect:
        return True
    if _wait_for_device():
        _device_suspect = False
        return True
    return False


def _mark_device_suspect():
    global _device_suspect
    _device_suspect = True


def _wait_for_device() -> bool:
    """Probe the device BEFORE spending any candidate budget. The axon
    tunnel has twice been observed wedged (children hang in device init,
    burning their whole cap) and it can be restored by the relay owner
    mid-window — so on a failed probe, keep re-probing on a short period
    until recovery or until too little budget remains to measure anything."""
    if _probe_device(timeout=60.0):
        return True
    print("# device probe failed at start; waiting for tunnel recovery",
          flush=True)
    while _remaining() > 150.0:
        time.sleep(15.0)
        if _probe_device(timeout=30.0):
            print(f"# device recovered ({_remaining():.0f}s budget left)",
                  flush=True)
            return True
    return False


def _measure_eval_1080p(method_name: str, overrides=None) -> tuple:
    """One 1920x1080 chunked render measurement -> (rays_per_sec, fps)."""
    import jax
    import jax.numpy as jnp

    from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType
    from nerfstudio_thermal_tpu.configs.method_configs import get_method_config
    from nerfstudio_thermal_tpu.models.thermal_nerfacto import ThermalNerfactoModel
    from nerfstudio_thermal_tpu.utils.precision import ensure_exact_f32_matmuls

    ensure_exact_f32_matmuls()

    h, w = 1080, 1920
    method = get_method_config(method_name)
    for k, v in (overrides or {}).items():
        setattr(method.model, k, v)
    aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    model = ThermalNerfactoModel(
        method.model, aabb, num_train_data=2, metadata={"is_thermal": [0, 1]}
    )
    params = model.init_params(jax.random.PRNGKey(0))
    c2w = np.eye(4, dtype=np.float32)[:3][None]
    c2w[:, 0, 3] = 2.0
    cam = Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=jnp.full((1,), 1400.0), fy=jnp.full((1,), 1400.0),
        cx=jnp.full((1,), w / 2), cy=jnp.full((1,), h / 2),
        width=jnp.full((1,), w, jnp.int32), height=jnp.full((1,), h, jnp.int32),
        distortion_params=jnp.zeros((1, 6)),
        camera_type=jnp.full((1,), CameraType.PERSPECTIVE.value, jnp.int32),
    )
    # Device-resident render timing, synced by fetching one scalar
    # (block_until_ready does not sync through the axon tunnel). This
    # matches the reference's TEST_RAYS_PER_SEC semantics: outputs stay on
    # the accelerator (trainer.py:519-526 times the forward; torch tensors
    # remain on-GPU). Fetching all image outputs through the tunnel would
    # add ~9 s/frame at the measured 17.5 MB/s D2H bandwidth — a tunnel
    # artifact, not a property of the renderer.
    out = model.render_camera_device(params, cam, 0)  # compile + warm
    float(out["rgb"][0, 0])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = model.render_camera_device(params, cam, 0)
        float(out["rgb"][0, 0])
    dt = (time.perf_counter() - t0) / reps
    return h * w / dt, 1.0 / dt


# Forward-only candidates for the eval render: the fused ray-march kernels'
# only measured downside is the sequential backward, which eval never runs.
_EVAL_CANDIDATES = [
    ("default", {}),  # flagship ships fused_raymarch=False (robust)
    ("fray-base", {"fused_raymarch": True}),
]


def run_eval_1080p(method_name: str, warm: bool = True) -> None:
    """TEST_RAYS_PER_SEC / fps at 1920x1080 (reference engine/trainer.py:519-526,
    BASELINE.md north star: real-time 1080p rendering; vs_baseline = fps/30).
    Autotuned over forward-path candidates, each in a watchdogged subprocess,
    each gated on the remaining deadline budget. Cold cache: default only,
    with a floor that covers its cold compile — the r4 run proved the 1080p
    render program's cold compile EXCEEDS 180 s (the SIGTERM'd child wedged
    the tunnel and killed the hash/datapath rows), so cold sizing now
    matches the parity row's (cap 280, floor 240, x scale) and main() runs
    this row LAST in cold mode."""
    import subprocess
    import sys

    results = {}
    scale = 1.0 if warm else _terminal_scale()
    for i, (name, _) in enumerate(_EVAL_CANDIDATES):
        if not warm and i > 0:
            print("# eval fused candidate skipped (cold compile cache)",
                  flush=True)
            break
        cap = min(((180.0 if warm else 280.0 * scale) if i == 0
                   else 120.0 * scale), _remaining() - 20.0)
        if cap < (45.0 if warm else 240.0 * scale):
            print(f"# eval candidate {name} skipped ({_remaining():.0f}s left)",
                  flush=True)
            break
        if not _gate_device():
            print("# device still unreachable; stopping eval candidates",
                  flush=True)
            break
        try:
            out = _run_child(
                [
                    sys.executable, __file__, "--eval-candidate", name,
                    "--method", method_name,
                ],
                env=_child_env(),
                timeout=cap,
            )
            line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
            d = json.loads(line)
            results[name] = (d["value"], d["fps"])
        except subprocess.TimeoutExpired:
            print(f"# eval candidate {name} timed out after {cap:.0f}s",
                  flush=True)
            if not _probe_device():
                _mark_device_suspect()
                print("# device probe failed; stopping eval candidates",
                      flush=True)
                break
        except Exception as e:  # noqa: BLE001
            print(f"# eval candidate {name} failed: {type(e).__name__}: {e}",
                  flush=True)
    if not results:
        raise RuntimeError("no eval candidate completed")
    winner = max(results, key=lambda k: results[k][0])
    rays_per_sec, fps = results[winner]
    cand_note = " ".join(f"{k}={v[1]:.2f}fps" for k, v in results.items())
    print(
        json.dumps(
            {
                "metric": "test_rays_per_sec_1080p",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(fps / 30.0, 4),
                "config": method_name,
                "note": f"{fps:.2f} fps at 1920x1080 device-resident eval "
                f"render (single-dispatch lax.map, in-jit ray gen), "
                f"winner={winner} [{cand_note}]; vs_baseline = fps / 30 "
                "(real-time-1080p north star)",
            }
        ),
        flush=True,
    )


def _candidate_main(argv):
    """Child-process entry for run_flagship_autotuned: measure one
    candidate, print one JSON line."""
    name = argv[argv.index("--candidate") + 1]
    method = argv[argv.index("--method") + 1]
    n_steps = int(argv[argv.index("--steps") + 1])
    overrides = {**dict(_FLAGSHIP_CANDIDATES), **_EXCLUDED_CANDIDATES}[name]
    value = _measure(method, n_steps, overrides)
    print(json.dumps({"candidate": name, "value": round(value, 1)}), flush=True)


def _eval_candidate_main(argv):
    """Child-process entry for run_eval_1080p."""
    name = argv[argv.index("--eval-candidate") + 1]
    method = argv[argv.index("--method") + 1]
    overrides = dict(_EVAL_CANDIDATES)[name]
    rays_per_sec, fps = _measure_eval_1080p(method, overrides)
    print(
        json.dumps(
            {"candidate": name, "value": round(rays_per_sec, 1),
             "fps": round(fps, 4)}
        ),
        flush=True,
    )


def _measure_datapath(
    method_name: str, n_steps: int = 30, num_pairs: int = 32,
    hw=(480, 640), num_rays: int = 8192,
) -> float:
    """Steady-state train rays/s pulling batches through the REAL host data
    pipeline — PrefetchingDataManager worker thread + pixel sampler (C++
    native fast path when buildable) + per-step host->device transfer +
    in-jit ray generation — instead of 8 canned device-resident batches.
    Quantifies the host overhead the flagship row excludes (reference
    analogue: ParallelDataManager, parallel_datamanager.py:65-130)."""
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from nerfstudio_thermal_tpu.configs.dataparser_configs import build_dataparser
    from nerfstudio_thermal_tpu.data.datamanagers import (
        PrefetchingDataManager,
        VanillaDataManagerConfig,
    )
    from nerfstudio_thermal_tpu.data.dataparsers.nerfstudio_dataparser import (
        ThermalNerfDataParserConfig,
    )
    from tests.fixtures import make_synthetic_rgbt_dataset

    with tempfile.TemporaryDirectory() as tmp:
        data = make_synthetic_rgbt_dataset(
            Path(tmp) / "d", num_pairs=num_pairs, rgb_hw=hw, t_hw=hw
        )
        dm = PrefetchingDataManager(
            VanillaDataManagerConfig(
                train_num_rays_per_batch=num_rays, patch_size=2
            ),
            build_dataparser(
                ThermalNerfDataParserConfig(data=data, train_split_fraction=1.0)
            ),
        )
        try:
            is_thermal = [int(v) for v in dm.train_dataset.is_thermal]
            # dataset cameras hold host numpy arrays; the jitted step indexes
            # them with tracers, so move the whole pytree on-device once
            cams = jax.tree.map(jnp.asarray, dm.train_cameras)
            train_step, params, opt_state, _, num_rays = build_setup(
                method_name, cameras=cams, is_thermal=is_thermal,
                num_rays=num_rays,
            )
            key = jax.random.PRNGKey(1)
            for i in range(3):  # compile + warm the prefetch queue
                key, sub = jax.random.split(key)
                batch = {k: jnp.asarray(v) for k, v in dm.next_train(i).items()}
                params, opt_state, loss = train_step(params, opt_state, sub, batch)
            float(loss)
            t0 = time.perf_counter()
            for i in range(3, 3 + n_steps):
                key, sub = jax.random.split(key)
                batch = {k: jnp.asarray(v) for k, v in dm.next_train(i).items()}
                params, opt_state, loss = train_step(params, opt_state, sub, batch)
            float(loss)
            dt = time.perf_counter() - t0
            return num_rays * n_steps / dt
        finally:
            dm.close()


def _row_main(argv):
    """Child-process entry for the non-final bench rows (hash parity /
    parity workload / real-data-path): prints its own JSON line(s)."""
    import os
    import traceback

    row = argv[argv.index("--row") + 1]
    if row == "hash":
        try:
            run("thermal-nerfacto", "train_rays_per_sec_hash_parity", n_steps=5)
        except Exception:
            traceback.print_exc()
            # dynamic-gather kernel trouble on this backend? retry on XLA path
            os.environ["NS_HASH_DG"] = "0"
            run("thermal-nerfacto", "train_rays_per_sec_hash_parity", n_steps=5)
    elif row == "parity":
        # flagship at the reference's own workload constants ((256,96)/48,
        # full-rate regularizers) — the apples-to-apples throughput row.
        # Inherits the flagship autotune winner's fused-kernel overrides
        # (--winner <name>) so a fused win propagates to the parity number.
        winner = (
            argv[argv.index("--winner") + 1] if "--winner" in argv else "default"
        )
        overrides = {
            **dict(_FLAGSHIP_CANDIDATES), **_EXCLUDED_CANDIDATES
        }.get(winner, {})
        value = _measure("thermal-nerfacto-tpu@parity", n_steps=10,
                         overrides=overrides)
        _emit(
            "train_rays_per_sec_parity_workload", value,
            "thermal-nerfacto-tpu@parity",
            note=f"fused-kernel overrides from flagship winner={winner}",
        )
    elif row == "datapath":
        value = _measure_datapath("thermal-nerfacto-tpu")
        _emit(
            "train_rays_per_sec_datapath", value, "thermal-nerfacto-tpu",
            note="real host pipeline: PrefetchingDataManager + pixel sampler "
            "+ per-step H2D transfer + in-jit ray generation (vs the canned-"
            "batch flagship row)",
        )
    else:
        raise ValueError(f"unknown row {row}")


def _run_flagship_candidates(
    method_name: str, metric: str, n_steps: int, warm: bool = True
):
    """Measure the flagship candidates robust-first, each in its own
    watchdogged subprocess, each gated on the remaining budget. Returns the
    best-so-far JSON line (or None) — NEVER raises. With a cold compile
    cache (warm=False) only the robust default runs: the fused candidates
    are upside-only and their cold compiles do not fit their caps, and a
    child SIGTERM'd mid-compile risks wedging the axon tunnel for every
    later row."""
    import subprocess
    import sys

    results = {}
    scale = 1.0 if warm else _terminal_scale()
    for i, (name, _) in enumerate(_FLAGSHIP_CANDIDATES):
        if not warm and i > 0:
            print("# fused candidates skipped (cold compile cache)",
                  flush=True)
            break
        # the robust default gets the lion's share (measured 186 s cold on
        # a fast terminal, ~600 s on a slow one — hence the probe-derived
        # scale — and seconds when the persistent compile cache is warm);
        # the fused candidates only run with ample budget left
        cap = min((280.0 if i == 0 else 150.0) * scale, _remaining() - 30.0)
        # cold floor: never start the default child unless a full cold
        # compile plus measurement fits — a SIGTERM mid-compile is worse
        # than no attempt (it can wedge the tunnel)
        if cap < ((60.0 if warm else 220.0 * scale) if i == 0 else 90.0):
            print(f"# candidate {name} skipped ({_remaining():.0f}s left)",
                  flush=True)
            break
        if not _gate_device():
            print("# device still unreachable; stopping candidates",
                  flush=True)
            break
        try:
            out = _run_child(
                [
                    sys.executable, __file__, "--candidate", name,
                    "--method", method_name, "--steps", str(n_steps),
                ],
                env=_child_env(_CANDIDATE_ENV.get(name, {})),
                timeout=cap,
            )
            line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
            results[name] = json.loads(line)["value"]
        except subprocess.TimeoutExpired:
            print(f"# candidate {name} timed out after {cap:.0f}s", flush=True)
            # never conclude "device dead" from one candidate timeout: probe
            if not _probe_device():
                _mark_device_suspect()
                print("# device probe failed; stopping candidates", flush=True)
                break
        except Exception as e:  # noqa: BLE001 — candidate must not kill bench
            print(f"# candidate {name} failed: {type(e).__name__}: {e}",
                  flush=True)
    if not results:
        return None, "default"
    winner = max(results, key=results.get)
    cand_note = " ".join(f"{k}={v/1e3:.1f}k" for k, v in results.items())
    return _format(
        metric, results[winner], method_name,
        note=f"autotuned fused-raymarch winner={winner} [{cand_note}]",
    ), winner


def main():
    import signal
    import subprocess
    import sys
    import traceback

    # The driver parses the LAST line, so the flagship number is measured
    # FIRST (robust candidate, biggest budget share) and printed LAST from a
    # finally — a driver kill mid-run still leaves the flagship line in
    # position. Every measurement runs in a timeout-capped subprocess so
    # nothing can hang between a measurement and that final print, and all
    # caps are scheduled against the _BUDGET_S deadline.
    #
    # The driver kills with `timeout` = SIGTERM, and Python exits on SIGTERM
    # WITHOUT running finally blocks — r3's kill lost the flagship line this
    # way. Convert it to SystemExit so the finally prints the best-so-far
    # line before dying.
    def _on_term(*_):
        raise SystemExit(143)

    signal.signal(signal.SIGTERM, _on_term)
    flagship_line = None
    try:
        warm = _cache_is_warm()
        print(f"# compile cache {'WARM' if warm else 'COLD'} "
              f"(stamp {'matches' if warm else 'missing/stale'}: "
              "caps sized for "
              f"{'cached' if warm else 'full cold'} compiles)", flush=True)
        if not _wait_for_device():
            print(
                "# device unreachable for the whole probe window; "
                "no measurements possible", flush=True,
            )
            return
        flagship_line, winner = _run_flagship_candidates(
            "thermal-nerfacto-tpu", "train_rays_per_sec", n_steps=30,
            warm=warm,
        )

        # secondary rows, priority order (parity and the 1080p capture are
        # VERDICT r3 done-criteria), each gated on remaining budget
        def _row(row, cap_s, floor_s, extra=(), env_extra=None):
            cap = min(cap_s, _remaining() - 25.0)
            if cap < floor_s:
                print(f"# row {row} skipped ({_remaining():.0f}s left)",
                      flush=True)
                return
            if not _gate_device():
                print(f"# row {row} skipped: device unreachable", flush=True)
                return
            try:
                out = _run_child(
                    [sys.executable, __file__, "--row", row, *extra],
                    env=_child_env(env_extra), timeout=cap,
                )
                for ln in out.splitlines():
                    if ln.startswith("{"):
                        print(ln, flush=True)
            except subprocess.TimeoutExpired:
                print(f"# row {row} timed out after {cap:.0f}s", flush=True)
                if not _probe_device():
                    _mark_device_suspect()
                    print("# device probe failed", flush=True)
            except Exception:
                traceback.print_exc()

        # cold caps/floors cover a full cold compile (parity's program is
        # structurally the flagship's at larger shapes), scaled by the
        # probe-derived terminal speed; a floor below that starts children
        # the budget cannot let finish, and SIGTERM-mid-compile is the
        # known tunnel wedge (r4 morning run)
        scale = 1.0 if warm else _terminal_scale()
        _row("parity", 170.0 if warm else 240.0 * scale,
             50.0 if warm else 210.0 * scale,
             extra=("--winner", winner),
             env_extra=_CANDIDATE_ENV.get(winner))

        def _eval_row():
            if _remaining() > (70.0 if warm else 260.0 * scale):
                try:
                    run_eval_1080p("thermal-nerfacto-tpu", warm=warm)
                except Exception:
                    traceback.print_exc()
            else:
                print(f"# eval row skipped ({_remaining():.0f}s left)",
                      flush=True)

        # Cold cache: the 1080p render program's cold compile is the
        # longest of the secondary rows and a SIGTERM mid-compile is the
        # known tunnel wedge (r4: it killed hash+datapath) — capture the
        # cheap rows FIRST and let eval spend whatever budget is left.
        if warm:
            _eval_row()
        _row("hash", 90.0 * scale, 40.0 if warm else 60.0 * scale)
        _row("datapath", 90.0 * scale, 40.0 if warm else 60.0 * scale)
        if not warm:
            _eval_row()
        if flagship_line is None and _remaining() > 240.0 and _gate_device():
            # every candidate CHILD failed on an alive device (child-plumbing
            # trouble, corrupt compile cache, ...): measure the robust default
            # in-process as a last resort so the round still gets a flagship
            # line. Runs LAST: the parent then holds a device client, which
            # could starve later children through the single-tenant tunnel —
            # there are none after this. A hang here loses nothing (there was
            # no flagship line anyway) and the driver's timeout backstops it.
            print("# all candidate children failed; in-process fallback",
                  flush=True)
            try:
                value = _measure("thermal-nerfacto-tpu", n_steps=10)
                flagship_line = _format(
                    "train_rays_per_sec", value, "thermal-nerfacto-tpu",
                    note="in-process fallback (candidate children failed)",
                )
            except Exception:
                traceback.print_exc()
    finally:
        if flagship_line is not None:
            print(flagship_line, flush=True)
        else:
            print("# no flagship candidate completed", flush=True)


if __name__ == "__main__":
    import sys

    if "--write-stamp" in sys.argv:
        # tools/warm_bench_cache.sh, after all programs compiled cleanly
        _write_cache_stamp()
        print(f"stamp written: {_STAMP_PATH}")
    elif "--candidate" in sys.argv:
        _candidate_main(sys.argv)
    elif "--eval-candidate" in sys.argv:
        _eval_candidate_main(sys.argv)
    elif "--row" in sys.argv:
        _row_main(sys.argv)
    else:
        main()
