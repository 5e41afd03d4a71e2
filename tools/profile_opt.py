"""Isolate the optimizer + non-fwd/bwd cost of the bench train step."""

import time

import numpy as np


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

    cfg = ThermalNerfactoModelConfig(
        density_mode="separate",
        compute_dtype="bfloat16",
        field_encoding="freq",
        proposal_net_args_list=list(_FREQ_PROPOSAL_ARGS),
        use_pallas=True,
    )
    aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    model = ThermalNerfactoModel(
        cfg, aabb, num_train_data=64,
        metadata={"is_thermal": [i % 2 for i in range(64)]},
    )
    params = model.init_params(jax.random.PRNGKey(0))
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    print(f"param count: {n_params/1e6:.2f} M, groups: {list(params.keys())}")

    method = make_thermal_nerfacto()
    tx = build_optimizer(method.optimizers, params)
    opt_state = tx.init(params)
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-3, params)

    @jax.jit
    def opt_only(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    p, o = opt_only(params, opt_state, grads)
    jax.tree.leaves(p)[0].block_until_ready()
    float(jax.tree.leaves(p)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        p, o = opt_only(p, o, grads)
    float(jax.tree.leaves(p)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"optimizer-only: {dt*1000:.2f} ms/step")

    @jax.jit
    def opt_donated(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    opt_donated2 = jax.jit(
        lambda params, opt_state, grads: opt_donated(params, opt_state, grads),
        donate_argnums=(0, 1),
    )
    p, o = opt_donated2(params, opt_state, grads)
    float(jax.tree.leaves(p)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        p, o = opt_donated2(p, o, grads)
    float(jax.tree.leaves(p)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"optimizer-only (donated): {dt*1000:.2f} ms/step")


if __name__ == "__main__":
    main()
