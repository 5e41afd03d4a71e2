"""Fused ray-march field paths vs the positions-based reference paths.

The fused_raymarch knob routes (origins, dirs, midpoints) straight into the
Pallas kernel (ops/pallas/fused_mlp.fused_ray_mlp), which must be numerically
identical to get_density(ray_samples.get_positions()) — same contraction,
selector, encoding, MLP.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_thermal_tpu.cameras.rays import RaySamples
from nerfstudio_thermal_tpu.fields.density_fields import MLPDensityField
from nerfstudio_thermal_tpu.fields.nerfacto_field import NerfactoField


def _random_ray_samples(key, num_rays=6, num_samples=5):
    k1, k2, k3 = jax.random.split(key, 3)
    origins = jax.random.normal(k1, (num_rays, 3)) * 0.4
    dirs = jax.random.normal(k2, (num_rays, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    # starts span inside/outside the unit ball: both contraction branches
    starts = jnp.sort(
        jax.random.uniform(k3, (num_rays, num_samples, 1)) * 5.0, axis=1
    )
    ends = starts + 0.2
    return RaySamples(
        origins=origins,
        directions=dirs,
        pixel_area=jnp.ones((num_rays, 1)),
        camera_indices=jnp.zeros((num_rays, 1), jnp.int32),
        starts=starts,
        ends=ends,
        spacing_starts=jnp.zeros((num_rays, num_samples, 1)),
        spacing_ends=jnp.ones((num_rays, num_samples, 1)),
        s_near=jnp.zeros((num_rays, 1)),
        s_far=jnp.ones((num_rays, 1)),
    )


def _base_field(fused_raymarch: bool) -> NerfactoField:
    return NerfactoField(
        aabb=((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)),
        num_images=2,
        appearance_embedding_dim=8,
        field_encoding="freq",
        freq_num_frequencies=4,
        freq_num_layers=4,
        freq_hidden_dim=128,
        use_pallas=True,
        fused_raymarch=fused_raymarch,
    )


def test_base_field_fused_raymarch_matches_positions_path():
    rs = _random_ray_samples(jax.random.PRNGKey(0))
    field_f = _base_field(True)
    field_r = _base_field(False)
    params = field_f.init(jax.random.PRNGKey(1), rs, train=True)["params"]

    def run(field, params, rs):
        d, g = field.apply(
            {"params": params}, rs, method=field.get_density_from_rays
        )
        return d, g

    d1, g1 = run(field_f, params, rs)
    d2, g2 = run(field_r, params, rs)  # falls back to get_positions path
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=2e-5)

    # gradients through params AND ray geometry (camera-opt path)
    def loss(field, params, origins):
        rs2 = rs.replace(origins=origins)
        d, g = field.apply(
            {"params": params}, rs2, method=field.get_density_from_rays
        )
        return jnp.sum(d * d) + jnp.sum(jnp.sin(g))

    for argnums in ((0,), (1,)):
        gr1 = jax.grad(lambda p, o: loss(field_f, p, o), argnums=argnums)(
            params, rs.origins
        )
        gr2 = jax.grad(lambda p, o: loss(field_r, p, o), argnums=argnums)(
            params, rs.origins
        )
        for a, b in zip(jax.tree.leaves(gr1), jax.tree.leaves(gr2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            )


def _remap_dense_params(fused_params):
    """Fused naming Dense_i_kernel/Dense_i_bias -> nn.Dense Dense_i/{kernel,bias}."""
    out = {}
    for k, v in fused_params.items():
        if k.endswith("_kernel"):
            out.setdefault(k[: -len("_kernel")], {})["kernel"] = v
        elif k.endswith("_bias"):
            out.setdefault(k[: -len("_bias")], {})["bias"] = v
        else:
            out[k] = v
    return out


def test_proposal_field_fused_raymarch_matches_positions_path():
    rs = _random_ray_samples(jax.random.PRNGKey(2), num_rays=4, num_samples=7)
    kwargs = dict(
        aabb=((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)),
        num_layers=2,
        hidden_dim=16,
        num_frequencies=3,
        use_pallas=True,
    )
    net_f = MLPDensityField(fused_raymarch=True, **kwargs)
    net_r = MLPDensityField(fused_raymarch=False, **kwargs)
    params_f = net_f.init(jax.random.PRNGKey(3), ray_samples=rs)["params"]
    params_r = {"mlp": _remap_dense_params(params_f["mlp"])}

    d1 = net_f.apply({"params": params_f}, ray_samples=rs)
    d2 = net_r.apply({"params": params_r}, ray_samples=rs)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=2e-4, atol=1e-6)

    def loss_f(p):
        return jnp.sum(net_f.apply({"params": p}, ray_samples=rs) ** 2)

    def loss_r(p):
        return jnp.sum(net_r.apply({"params": p}, ray_samples=rs) ** 2)

    g1 = _remap_dense_params(jax.grad(loss_f)(params_f)["mlp"])
    g2 = jax.grad(loss_r)(params_r)["mlp"]
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_proposal_fused_no_input_grads_matches_param_grads():
    """The flagship ships proposal_camera_gradients=False, so the fused
    proposal path runs with ray_input_grads=False (parallel backward — the
    bench fray-props candidate). Param grads must still match the unfused
    path exactly; only input grads are dropped."""
    rs = _random_ray_samples(jax.random.PRNGKey(5), num_rays=4, num_samples=7)
    kwargs = dict(
        aabb=((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)),
        num_layers=2,
        hidden_dim=16,
        num_frequencies=3,
        use_pallas=True,
    )
    net_f = MLPDensityField(
        fused_raymarch=True, fused_raymarch_input_grads=False, **kwargs
    )
    net_r = MLPDensityField(fused_raymarch=False, **kwargs)
    params_f = net_f.init(jax.random.PRNGKey(3), ray_samples=rs)["params"]
    params_r = {"mlp": _remap_dense_params(params_f["mlp"])}

    d1 = net_f.apply({"params": params_f}, ray_samples=rs)
    d2 = net_r.apply({"params": params_r}, ray_samples=rs)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=2e-4, atol=1e-6)

    g1 = _remap_dense_params(
        jax.grad(lambda p: jnp.sum(net_f.apply({"params": p}, ray_samples=rs) ** 2))(params_f)["mlp"]
    )
    g2 = jax.grad(lambda p: jnp.sum(net_r.apply({"params": p}, ray_samples=rs) ** 2))(params_r)["mlp"]
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_base_field_fused_field_matches_unfused_forward():
    """Whole-field kernel (fused_field=True) vs the two-stage path, full
    forward incl. color head, density and param/ray grads."""
    rs = _random_ray_samples(jax.random.PRNGKey(4), num_rays=5, num_samples=6)

    def build(fused_field):
        return NerfactoField(
            aabb=((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)),
            num_images=2,
            appearance_embedding_dim=8,
            hidden_dim_color=16,
            num_layers_color=2,
            field_encoding="freq",
            freq_num_frequencies=4,
            freq_num_layers=4,
            freq_hidden_dim=128,
            use_pallas=True,
            fused_raymarch=True,
            fused_field=fused_field,
        )

    field_f, field_r = build(True), build(False)
    params_f = field_f.init(jax.random.PRNGKey(5), rs, train=True)["params"]
    # head params: fused naming (Dense_i_kernel) -> nn.Dense naming
    params_r = dict(params_f)
    params_r["mlp_head"] = _remap_dense_params(params_f["mlp_head"])

    o1 = field_f.apply({"params": params_f}, rs, train=True)
    o2 = field_r.apply({"params": params_r}, rs, train=True)
    from nerfstudio_thermal_tpu.fields.base_field import FieldHeadNames

    np.testing.assert_allclose(
        np.asarray(o1[FieldHeadNames.RGB]), np.asarray(o2[FieldHeadNames.RGB]),
        rtol=3e-4, atol=3e-5,
    )
    np.testing.assert_allclose(
        np.asarray(o1[FieldHeadNames.DENSITY]),
        np.asarray(o2[FieldHeadNames.DENSITY]), rtol=3e-4, atol=3e-5,
    )

    def loss(field, params, origins, dirs):
        rs2 = rs.replace(origins=origins, directions=dirs)
        o = field.apply({"params": params}, rs2, train=True)
        return (
            jnp.sum(o[FieldHeadNames.RGB] ** 2)
            + jnp.sum(jnp.tanh(o[FieldHeadNames.DENSITY]))
        )

    g1 = jax.grad(lambda p, o, d: loss(field_f, p, o, d), argnums=(0, 1, 2))(
        params_f, rs.origins, rs.directions
    )
    g2 = jax.grad(lambda p, o, d: loss(field_r, p, o, d), argnums=(0, 1, 2))(
        params_r, rs.origins, rs.directions
    )
    g1p = dict(g1[0]); g1p["mlp_head"] = _remap_dense_params(g1p["mlp_head"])
    for a, b in zip(
        jax.tree.leaves((g1p, *g1[1:])), jax.tree.leaves((dict(g2[0]), *g2[1:]))
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5
        )
