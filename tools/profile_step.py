"""Perf diagnosis: where do the bench's ~116ms/step go?

Measures, on the real device:
  1. empty-dispatch latency through the tunnel
  2. bench train step, dispatched one-at-a-time (current bench)
  3. same step, K steps fused in one lax.scan dispatch
  4. forward-only and forward+backward (no optimizer)
"""

import time

import numpy as np


def sync(x):
    import jax
    return float(jax.numpy.asarray(x).reshape(-1)[0])


def main():
    import jax
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

    print("devices:", jax.devices())

    # 1. dispatch latency
    @jax.jit
    def nop(x):
        return x + 1.0

    x = jnp.zeros(())
    sync(nop(x))
    t0 = time.perf_counter()
    for _ in range(20):
        x = nop(x)
    sync(x)
    print(f"20 chained nop dispatches + 1 sync: {time.perf_counter()-t0:.4f}s")
    t0 = time.perf_counter()
    for _ in range(20):
        x = nop(x)
        sync(x)
    print(f"20 nop dispatch+sync each: {time.perf_counter()-t0:.4f}s")

    num_rays = 8192
    num_cameras = 64
    h, w = 480, 640

    cfg = ThermalNerfactoModelConfig(
        density_mode="separate",
        compute_dtype="bfloat16",
        field_encoding="freq",
        proposal_net_args_list=list(_FREQ_PROPOSAL_ARGS),
        use_pallas=True,
    )
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

    def loss_fn(p, key, batch):
        bundle = ray_generator(batch["ray_indices"])
        outputs = model.forward(p, bundle, train=True, rng=key)
        metrics = model.get_metrics_dict(p, outputs, batch, train=True)
        losses = model.get_loss_dict(p, outputs, batch, metrics, train=True, rng=key)
        return sum(jax.tree.leaves(losses)), losses

    @jax.jit
    def train_step(params, opt_state, key, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, key, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def fwd_only(params, key, batch):
        return loss_fn(params, key, batch)[0]

    @jax.jit
    def fwd_bwd(params, key, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, key, batch)
        return loss, jax.tree.leaves(grads)[0]

    @jax.jit
    def scan_steps(params, opt_state, key, batches):
        def body(carry, batch):
            p, o, k = carry
            k, sub = jax.random.split(k)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, sub, batch)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o, k), loss

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), batches
        )
        return params, opt_state, losses[-1]

    key = jax.random.PRNGKey(1)
    batches = [make_batch(i) for i in range(8)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[make_batch(i) for i in range(10)])

    # individual-step timing
    p, o = params, opt_state
    for i in range(3):
        key, sub = jax.random.split(key)
        p, o, loss = train_step(p, o, sub, batches[i % 8])
    sync(loss)
    t0 = time.perf_counter()
    n = 30
    for i in range(n):
        key, sub = jax.random.split(key)
        p, o, loss = train_step(p, o, sub, batches[i % 8])
    sync(loss)
    dt = time.perf_counter() - t0
    print(f"train_step x{n}: {dt:.3f}s = {dt/n*1000:.1f} ms/step -> {num_rays*n/dt:,.0f} rays/s")

    # forward only
    l = fwd_only(params, key, batches[0]); sync(l)
    t0 = time.perf_counter()
    for i in range(n):
        l = fwd_only(params, key, batches[i % 8])
    sync(l)
    dt = time.perf_counter() - t0
    print(f"fwd_only  x{n}: {dt:.3f}s = {dt/n*1000:.1f} ms/step")

    # forward+backward
    l, g = fwd_bwd(params, key, batches[0]); sync(l)
    t0 = time.perf_counter()
    for i in range(n):
        l, g = fwd_bwd(params, key, batches[i % 8])
    sync(l)
    dt = time.perf_counter() - t0
    print(f"fwd_bwd   x{n}: {dt:.3f}s = {dt/n*1000:.1f} ms/step")

    # scan of 10 steps per dispatch
    p, o, loss = scan_steps(params, opt_state, key, stacked)
    sync(loss)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        p, o, loss = scan_steps(p, o, key, stacked)
    sync(loss)
    dt = time.perf_counter() - t0
    n_total = reps * 10
    print(f"scan10 x{reps}: {dt:.3f}s = {dt/n_total*1000:.1f} ms/step -> {num_rays*n_total/dt:,.0f} rays/s")


if __name__ == "__main__":
    main()
