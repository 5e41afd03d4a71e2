"""Capture an XLA device trace of the bench train step and print top ops."""

import glob
import gzip
import json
import sys


def capture(logdir="/tmp/xla_trace"):
    import jax
    import numpy as np
    import jax.numpy as jnp
    import optax

    from nerfstudio_thermal_tpu.models.thermal_nerfacto import (
        ThermalNerfactoModel,
        ThermalNerfactoModelConfig,
    )
    from nerfstudio_thermal_tpu.engine.optimizers import build_optimizer
    from nerfstudio_thermal_tpu.configs.method_configs import (
        make_thermal_nerfacto,
        _FREQ_PROPOSAL_ARGS,
    )
    from nerfstudio_thermal_tpu.cameras.cameras import Cameras, CameraType
    from nerfstudio_thermal_tpu.model_components.ray_generators import RayGenerator

    num_rays = 8192
    num_cameras = 64
    h, w = 480, 640
    from nerfstudio_thermal_tpu.configs.method_configs import get_method_config
    cfg = get_method_config("thermal-nerfacto-tpu").model  # the real flagship
    aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    model = ThermalNerfactoModel(
        cfg, aabb, num_train_data=num_cameras,
        metadata={"is_thermal": [i % 2 for i in range(num_cameras)]},
    )
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
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
        camera_type=jnp.full((num_cameras,), CameraType.PERSPECTIVE.value, jnp.int32),
    )
    ray_generator = RayGenerator(cameras)
    method = make_thermal_nerfacto()
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
            [np.repeat(cams, 4), (ys[:, None, None] + dy).reshape(-1),
             (xs[:, None, None] + dx).reshape(-1)], -1).astype(np.int32)
        return {
            "ray_indices": jnp.asarray(ray_indices),
            "image": jnp.asarray(r.uniform(size=(num_rays, 3)).astype(np.float32)),
            "is_thermal": jnp.asarray(np.repeat((cams % 2).astype(np.float32), 4)),
        }

    @jax.jit
    def train_step(params, opt_state, key, batch):
        def loss_fn(p):
            bundle = ray_generator(batch["ray_indices"])
            outputs = model.forward(p, bundle, train=True, rng=key)
            metrics = model.get_metrics_dict(p, outputs, batch, train=True)
            losses = model.get_loss_dict(p, outputs, batch, metrics, train=True, rng=key)
            return sum(jax.tree.leaves(losses)), losses
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    batches = [make_batch(i) for i in range(4)]
    for i in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sub, batches[i % 4])
    float(loss)

    jax.profiler.start_trace(logdir)
    for i in range(5):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sub, batches[i % 4])
    float(loss)
    jax.profiler.stop_trace()
    print("trace captured")


def report(logdir="/tmp/xla_trace"):
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

    xplanes = sorted(glob.glob(logdir + "/plugins/profile/*/*.xplane.pb"))
    assert xplanes, "no xplane found"
    xp = xplanes[-1:]
    for tool in ["framework_op_stats^", "op_profile^"]:
        try:
            data, _ = rttd.xspace_to_tool_data(xp, tool, {})
        except Exception as e:
            print(f"{tool}: failed {e}")
            continue
        if tool.startswith("framework_op_stats"):
            import csv
            import io
            if isinstance(data, bytes):
                data = data.decode()
            rows = list(csv.DictReader(io.StringIO(data)))
            key_time = None
            for cand in ("total_self_time_us", "self_time_us", "avg_self_time_us"):
                if rows and cand in rows[0]:
                    key_time = cand
                    break
            if key_time is None:
                print("columns:", rows[0].keys() if rows else "none")
                continue
            rows.sort(key=lambda r: -float(r[key_time] or 0))
            print(f"\n== top 25 ops by {key_time} ==")
            for r in rows[:25]:
                print(f"{float(r[key_time]):>12.1f} us  {r.get('occurrences','?'):>5}x  {r.get('type','?'):<22} {r.get('operation','?')[:90]}")
        else:
            out = json.dumps(data)[:2000] if not isinstance(data, (str, bytes)) else str(data)[:2000]
            print(f"\n== {tool} (truncated) ==\n{out}")


def report_direct(logdir="/tmp/xla_trace", top=40):
    """Direct xplane.pb parse (the tensorboard_plugin_profile converter is
    broken in this image): aggregate device-plane event durations by name."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = sorted(glob.glob(logdir + "/plugins/profile/*/*.xplane.pb"))
    assert xplanes, "no xplane found"
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(xplanes[-1], "rb").read())
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        # The device plane nests the same interval at several levels
        # (module / op / fused-instruction lines): aggregating every line
        # multi-counts each hardware interval. Pick ONE line — the one with
        # the most events (the op-level line) — so totals are real seconds.
        lines = [l for l in plane.lines
                 if l.events and "Steps" not in l.name and "SparseCore" not in l.name]
        if not lines:
            continue
        line = max(lines, key=lambda l: len(l.events))
        agg = {}
        for ev in line.events:
            name = meta.get(ev.metadata_id, str(ev.metadata_id))
            dur = ev.duration_ps / 1e6  # us
            c, t = agg.get(name, (0, 0.0))
            agg[name] = (c + 1, t + dur)
        total = sum(t for _, t in agg.values())
        print(f"\n== plane '{plane.name}' line '{line.name}': {len(agg)} distinct "
              f"ops, total {total/1e3:.1f} ms (all traced steps) ==")
        for name, (c, t) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:top]:
            print(f"{t:>12.1f} us {100*t/max(total,1e-9):5.1f}%  {c:>5}x  {name[:100]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "report":
        report_direct()
    else:
        capture()
        report_direct()
