import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfstudio_thermal_tpu.cameras.rays import RayBundle
from nerfstudio_thermal_tpu.models.nerfacto import (
    NerfactoModel,
    NerfactoModelConfig,
    proposal_anneal,
    proposal_updated,
)
from nerfstudio_thermal_tpu.models.thermal_nerfacto import (
    ThermalNerfactoModel,
    ThermalNerfactoModelConfig,
)

AABB = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)


def tiny_config(cls=ThermalNerfactoModelConfig, **kw):
    defaults = dict(
        num_levels=4,
        base_res=4,
        max_res=32,
        log2_hashmap_size=10,
        hidden_dim=16,
        hidden_dim_color=16,
        appearance_embed_dim=4,
        num_proposal_samples_per_ray=(8, 4),
        num_nerf_samples_per_ray=4,
        proposal_net_args_list=[
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 2, "max_res": 16, "use_linear": False},
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 2, "max_res": 32, "use_linear": False},
        ],
        eval_num_rays_per_chunk=16,
    )
    defaults.update(kw)
    return cls(**defaults)


def make_bundle(R=8):
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(R, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.asarray(rng.uniform(-0.1, 0.1, (R, 3)).astype(np.float32)),
        directions=jnp.asarray(dirs),
        pixel_area=jnp.full((R, 1), 1e-6),
        camera_indices=jnp.asarray(rng.integers(0, 4, (R, 1)).astype(np.int32)),
    )


def make_batch(R=8):
    rng = np.random.default_rng(1)
    # 2x2 patches: first patch RGB, second thermal
    is_thermal = np.repeat(np.array([0.0, 1.0]), R // 2).astype(np.float32)
    return {
        "image": jnp.asarray(rng.uniform(size=(R, 3)).astype(np.float32)),
        "is_thermal": jnp.asarray(is_thermal),
    }


@pytest.mark.parametrize("mode", ["rgb_only", "shared", "separate"])
def test_thermal_model_forward_loss_grads(mode):
    cfg = tiny_config(density_mode=mode)
    model = ThermalNerfactoModel(
        cfg, AABB, num_train_data=4, metadata={"is_thermal": [0, 0, 1, 1]}
    )
    params = model.init_params(jax.random.PRNGKey(0))

    expected_groups = {"fields", "proposal_networks", "camera_opt"}
    if mode == "separate":
        expected_groups |= {
            "fields_thermal", "proposal_networks_thermal", "camera_opt_thermal",
        }
    assert expected_groups <= set(params.keys())

    bundle = make_bundle()
    batch = make_batch()

    def loss_fn(p, rng):
        outputs = model.forward(p, bundle, train=True, rng=rng)
        metrics = model.get_metrics_dict(p, outputs, batch, train=True)
        losses = model.get_loss_dict(p, outputs, batch, metrics, train=True, rng=rng)
        return sum(jax.tree.leaves(losses)), (losses, metrics, outputs)

    (loss, (losses, metrics, outputs)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params, jax.random.PRNGKey(1))

    assert np.isfinite(float(loss))
    assert "rgb_loss" in losses and "interlevel_loss" in losses
    assert outputs["rgb"].shape == (8, 3)
    if mode != "rgb_only":
        assert outputs["rgb_thermal"].shape == (8, 1)
        assert "thermal_loss" in losses
        assert "tv_pixel_loss" in losses and "cross_channel_loss" in losses
        assert "psnr_thermal" in metrics
    if mode == "separate":
        assert "density_loss" in losses
        assert outputs["depth_thermal"].shape == (8, 1)

    # all grads finite; at least the field grads nonzero
    flat = jax.tree.leaves(jax.tree.map(lambda g: jnp.isfinite(g).all(), grads))
    assert all(bool(f) for f in flat)
    field_grad_sum = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["fields"])
    )
    assert field_grad_sum > 0


def test_separate_mode_eval_has_removal_outputs():
    cfg = tiny_config(density_mode="separate")
    model = ThermalNerfactoModel(
        cfg, AABB, num_train_data=4, metadata={"is_thermal": [0, 0, 1, 1]}
    )
    params = model.init_params(jax.random.PRNGKey(0))
    outputs = model.forward(params, make_bundle(), train=False, rng=None)
    for key in ("removal", "removal_thermal", "rgb", "rgb_thermal", "depth", "accumulation_thermal"):
        assert key in outputs, key
    assert "weights_list" not in outputs  # eval excludes the big lists


def test_nerfacto_model_basics():
    cfg = tiny_config(cls=NerfactoModelConfig)
    model = NerfactoModel(cfg, AABB, num_train_data=4, metadata={})
    params = model.init_params(jax.random.PRNGKey(0))
    outputs = model.forward(params, make_bundle(), train=False)
    assert outputs["rgb"].shape == (8, 3)
    assert outputs["depth"].shape == (8, 1)
    assert float(jnp.max(outputs["accumulation"])) <= 1.0 + 1e-5


def test_anneal_and_update_schedule():
    a0 = float(proposal_anneal(jnp.asarray(0), 1000, 10.0))
    a_mid = float(proposal_anneal(jnp.asarray(500), 1000, 10.0))
    a1 = float(proposal_anneal(jnp.asarray(2000), 1000, 10.0))
    assert a0 == 0.0 and a1 == 1.0 and 0.5 < a_mid < 1.0

    updated, counter = proposal_updated(jnp.asarray(5), jnp.asarray(1), 5000, 5)
    assert bool(updated)  # step < 10 always updates
    updated2, counter2 = proposal_updated(jnp.asarray(4000), jnp.asarray(1), 5000, 5)
    assert not bool(updated2) and int(counter2) == 2
    updated3, _ = proposal_updated(jnp.asarray(4000), jnp.asarray(10), 5000, 5)
    assert bool(updated3)


def test_fused_modalities_matches_sequential():
    """fused_modalities runs both modality pipelines as one vmapped program;
    outputs and gradients must match the sequential path bit-for-bit up to
    float tolerance (same params: the thermal head is 3-channel in fused
    configs, channel 0 is the thermal value)."""
    import jax.flatten_util

    cfg = tiny_config(
        density_mode="separate", fused_modalities=True,
        compute_dtype="float32", density_loss_rays_fraction=1.0,
    )
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    model = ThermalNerfactoModel(
        cfg, aabb, num_train_data=4, metadata={"is_thermal": [0, 1, 0, 1]}
    )
    params = model.init_params(jax.random.PRNGKey(0))
    R = 16
    bundle = make_bundle(R)
    bundle = bundle.replace(
        nears=jnp.full((R, 1), 0.1), fars=jnp.full((R, 1), 5.0)
    )
    rng = jax.random.PRNGKey(7)

    out_fused = model.get_outputs(params, bundle, train=True, rng=rng)
    model.config.fused_modalities = False
    out_seq = model.get_outputs(params, bundle, train=True, rng=rng)

    for k in ("rgb", "rgb_thermal", "density", "density_thermal",
              "accumulation", "accumulation_thermal",
              "density2", "density2_thermal"):
        np.testing.assert_allclose(
            np.asarray(out_fused[k]), np.asarray(out_seq[k]),
            atol=2e-5, rtol=2e-5, err_msg=k,
        )
    assert out_fused["rgb_thermal"].shape[-1] == 1

    def loss_fn(p, fused):
        model.config.fused_modalities = fused
        out = model.get_outputs(p, bundle, train=True, rng=rng)
        batch = make_batch(R)
        m = model.get_metrics_dict(p, out, batch, train=True)
        losses = model.get_loss_dict(p, out, batch, m, train=True, rng=rng)
        return sum(jax.tree.leaves(losses))

    g1, _ = jax.flatten_util.ravel_pytree(jax.grad(lambda p: loss_fn(p, True))(params))
    g2, _ = jax.flatten_util.ravel_pytree(jax.grad(lambda p: loss_fn(p, False))(params))
    assert np.isfinite(np.asarray(g1)).all()
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-5, rtol=5e-4)
