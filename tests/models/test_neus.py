"""NeuS family unit tests: geometric init produces a sphere-like SDF, the
analytic gradient matches finite differences, NeuS alpha behaves at a
surface crossing, and the sampler concentrates samples near the zero set.
Reference semantics: nerfstudio/fields/sdf_field.py + models/neus.py."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_thermal_tpu.cameras.rays import RayBundle
from nerfstudio_thermal_tpu.fields.sdf_field import SDFField
from nerfstudio_thermal_tpu.models.neus import (
    neus_sample,
    rendering_sdf_with_fixed_inv_s,
)


def _tiny_field(**kw):
    kw.setdefault("aabb", ((-1, -1, -1), (1, 1, 1)))
    kw.setdefault("num_images", 2)
    kw.setdefault("num_layers", 2)
    kw.setdefault("hidden_dim", 16)
    kw.setdefault("geo_feat_dim", 8)
    kw.setdefault("num_layers_color", 2)
    kw.setdefault("hidden_dim_color", 16)
    kw.setdefault("appearance_embedding_dim", 4)
    return SDFField(**kw)


def test_geometric_init_is_spherical():
    """inside_outside=False: sdf ~ |x| - bias at init (sphere of radius
    `bias`), reference sdf_field.py:221-231."""
    field = _tiny_field(
        num_layers=8, hidden_dim=128, geo_feat_dim=16, bias=0.5,
        inside_outside=False,
    )
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (256, 3)).astype(np.float32)
    )
    params = field.init(jax.random.PRNGKey(0), pts, method=field.get_sdf_at)
    sdf = field.apply(params, pts, method=field.get_sdf_at)[..., 0]
    r = jnp.linalg.norm(pts, axis=-1)
    # sign agreement with the sphere |x| - 0.5 on clearly-signed points
    clear = jnp.abs(r - 0.5) > 0.15
    agree = jnp.mean((jnp.sign(sdf) == jnp.sign(r - 0.5)) | ~clear)
    assert agree > 0.9


def test_sdf_gradient_matches_finite_difference():
    field = _tiny_field()
    pts = jnp.asarray(
        np.random.default_rng(1).uniform(-0.5, 0.5, (32, 3)).astype(np.float32)
    )
    params = field.init(jax.random.PRNGKey(1), pts, method=field.get_sdf_at)
    _, _, grad = field.apply(params, pts, method=field.get_sdf_and_gradient)
    eps = 1e-3
    for axis in range(3):
        d = jnp.zeros((1, 3)).at[0, axis].set(eps)
        f_p = field.apply(params, pts + d, method=field.get_sdf_at)[..., 0]
        f_m = field.apply(params, pts - d, method=field.get_sdf_at)[..., 0]
        fd = (f_p - f_m) / (2 * eps)
        np.testing.assert_allclose(grad[:, axis], fd, atol=2e-2, rtol=1e-2)


def _ray_bundle(n=8):
    dirs = np.zeros((n, 3), np.float32)
    dirs[:, 0] = 1.0
    return RayBundle(
        origins=jnp.zeros((n, 3)) - jnp.asarray([2.0, 0, 0]),
        directions=jnp.asarray(dirs),
        pixel_area=jnp.full((n, 1), 1e-6),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
        nears=jnp.full((n, 1), 0.5),
        fars=jnp.full((n, 1), 3.5),
    )


def test_fixed_inv_s_alpha_peaks_at_crossing():
    from nerfstudio_thermal_tpu.model_components.ray_samplers import spaced_sample

    bundle = _ray_bundle()
    samples = spaced_sample(bundle, 32, train=False)
    # analytic sdf of the plane x = 0 along the +x rays: sdf = -(t - 2)
    t = samples.starts[..., 0] + 2.0 - 2.0  # starts are euclidean from origin
    pos = samples.origins[..., None, :] + samples.directions[..., None, :] * samples.starts
    sdf = -pos[..., 0]  # zero at x=0, positive before
    alphas = rendering_sdf_with_fixed_inv_s(samples, sdf, inv_s=64.0)
    # conditional opacity saturates to ~1 inside the surface; the *weights*
    # (alpha x transmittance) localize the crossing
    from nerfstudio_thermal_tpu.cameras.rays import (
        get_weights_and_transmittance_from_alphas,
    )

    weights, _ = get_weights_and_transmittance_from_alphas(alphas[..., None])
    peak_bin = jnp.argmax(weights[..., 0], axis=-1)
    # crossing at x=0 <-> t=2.0 from origin x=-2; bins span [0.5, 3.5]
    crossing_t = (samples.starts[0, :, 0] + samples.ends[0, :, 0])[peak_bin[0]] / 2
    assert abs(float(crossing_t) - 2.0) < 0.3


def test_neus_sampler_concentrates_near_surface():
    bundle = _ray_bundle()

    def sdf_fn(samples):
        pos = (
            samples.origins[..., None, :]
            + samples.directions[..., None, :] * samples.starts
        )
        return -pos[..., :1] * 0 - pos[..., 0:1]  # plane x=0

    samples = neus_sample(
        bundle, sdf_fn, num_samples=16, num_samples_importance=16,
        num_up_sample_steps=2, base_variance=16.0, train=False,
    )
    # surface at t=2: importance samples should cluster there
    mids = (samples.starts[..., 0] + samples.ends[..., 0]) / 2
    near = jnp.mean((jnp.abs(mids - 2.0) < 0.5).astype(jnp.float32))
    uniform_frac = 1.0 / 3.0  # [1.5, 2.5] is a third of [0.5, 3.5]
    assert float(near) > uniform_frac + 0.05


def test_eikonal_loss_trainable():
    """Full surface-model fwd+grad: eikonal term differentiates through the
    second-order sdf gradient under jit."""
    from nerfstudio_thermal_tpu.models.neus_facto import (
        NeuSFactoModel, NeuSFactoModelConfig,
    )

    cfg = NeuSFactoModelConfig(
        sdf_num_layers=2, sdf_hidden_dim=8, sdf_geo_feat_dim=4,
        sdf_num_layers_color=2, sdf_hidden_dim_color=8,
        num_proposal_samples_per_ray=(4,), num_proposal_iterations=1,
        num_neus_samples_per_ray=4, background_model="none",
        proposal_net_args_list=[
            {"hidden_dim": 8, "log2_hashmap_size": 7, "num_levels": 2, "max_res": 8}
        ],
        appearance_embed_dim=4,
        eval_num_rays_per_chunk=32,
    )
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    model = NeuSFactoModel(cfg, aabb, num_train_data=2)
    params = model.init_params(jax.random.PRNGKey(0))
    bundle = _ray_bundle()
    batch = {"image": jnp.full((8, 3), 0.5)}

    @jax.jit
    def loss_fn(p):
        out = model.forward(p, bundle, train=True, rng=jax.random.PRNGKey(1))
        losses = model.get_loss_dict(p, out, batch, {}, train=True,
                                     rng=jax.random.PRNGKey(2))
        return sum(jax.tree.leaves(losses))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree.reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads, 0.0
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_mono_prior_losses():
    """monosdf normal + scale/shift-invariant depth losses
    (reference losses.py:332-347, 467-520)."""
    import jax.numpy as jnp

    from nerfstudio_thermal_tpu.model_components.losses import (
        monosdf_normal_loss,
        normalized_depth_scale_and_shift,
        scale_and_shift_invariant_depth_loss,
    )

    rng = np.random.default_rng(0)
    n = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    # identical normals -> zero loss
    assert float(monosdf_normal_loss(n, n)) < 1e-5
    # opposite normals -> positive
    assert float(monosdf_normal_loss(n, -n)) > 1.0

    # scale/shift recovery: target = 3 * pred + 0.7
    pred = jnp.asarray(rng.uniform(0.1, 1, (1, 8, 16)).astype(np.float32))
    target = 3.0 * pred + 0.7
    mask = jnp.ones_like(pred, bool)
    s, t = normalized_depth_scale_and_shift(pred, target, mask)
    np.testing.assert_allclose(float(s[0]), 3.0, rtol=1e-4)
    np.testing.assert_allclose(float(t[0]), 0.7, rtol=1e-3)
    # aligned loss ~ 0 for an exact affine relation
    assert float(
        scale_and_shift_invariant_depth_loss(pred, target, mask)
    ) < 1e-6


def test_surface_model_mono_losses_wire(tmp_path):
    from nerfstudio_thermal_tpu.models.neus_facto import (
        NeuSFactoModel, NeuSFactoModelConfig,
    )

    cfg = NeuSFactoModelConfig(
        sdf_num_layers=2, sdf_hidden_dim=8, sdf_geo_feat_dim=4,
        sdf_num_layers_color=2, sdf_hidden_dim_color=8,
        num_proposal_samples_per_ray=(4,), num_proposal_iterations=1,
        num_neus_samples_per_ray=4, background_model="none",
        proposal_net_args_list=[
            {"hidden_dim": 8, "log2_hashmap_size": 7, "num_levels": 2, "max_res": 8}
        ],
        appearance_embed_dim=4, eval_num_rays_per_chunk=32,
        mono_normal_loss_mult=0.05, mono_depth_loss_mult=0.05,
    )
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    model = NeuSFactoModel(cfg, aabb, num_train_data=2)
    params = model.init_params(jax.random.PRNGKey(0))
    bundle = _ray_bundle(32)
    rng = np.random.default_rng(1)
    nrm = rng.normal(size=(32, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    batch = {
        "image": jnp.full((32, 3), 0.5),
        "normal": jnp.asarray(nrm),
        "depth_image": jnp.asarray(rng.uniform(0.5, 3.0, (32, 1)).astype(np.float32)),
    }
    out = model.forward(params, bundle, train=True, rng=jax.random.PRNGKey(1))
    ld = model.get_loss_dict(params, out, batch, {}, train=True,
                             rng=jax.random.PRNGKey(2))
    assert "normal_loss" in ld and "depth_loss" in ld
    assert np.isfinite(float(ld["normal_loss"]))
    assert np.isfinite(float(ld["depth_loss"]))
