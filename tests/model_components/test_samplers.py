import numpy as np
import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.cameras.rays import RayBundle
from nerfstudio_thermal_tpu.model_components.ray_samplers import (
    pdf_sample,
    proposal_sample,
    spaced_sample,
)


def make_bundle(R=4, near=2.0, far=10.0):
    return RayBundle(
        origins=jnp.zeros((R, 3)),
        directions=jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (R, 1)),
        pixel_area=jnp.ones((R, 1)),
        camera_indices=jnp.zeros((R, 1), jnp.int32),
        nears=jnp.full((R, 1), near),
        fars=jnp.full((R, 1), far),
    )


def test_uniform_sampler_eval_spacing():
    rb = make_bundle()
    rs = spaced_sample(rb, 10, spacing_kind="uniform", train=False)
    starts = np.asarray(rs.starts)[0, :, 0]
    ends = np.asarray(rs.ends)[0, :, 0]
    assert starts.shape == (10,)
    np.testing.assert_allclose(starts[0], 2.0, atol=1e-6)
    np.testing.assert_allclose(ends[-1], 10.0, atol=1e-6)
    np.testing.assert_allclose(np.diff(starts), 0.8, atol=1e-5)


def test_piecewise_sampler_monotone_and_bounded():
    rb = make_bundle(near=0.05, far=1000.0)
    rs = spaced_sample(
        rb, 32, spacing_kind="piecewise", train=True, rng=jax.random.PRNGKey(0)
    )
    starts = np.asarray(rs.starts)[:, :, 0]
    ends = np.asarray(rs.ends)[:, :, 0]
    assert (ends >= starts - 1e-6).all()
    assert (starts[:, 1:] >= starts[:, :-1] - 1e-5).all()
    assert starts.min() >= 0.05 - 1e-4 and ends.max() <= 1000.0 + 1e-2


def test_pdf_sampler_concentrates_mass():
    rb = make_bundle(R=2, near=0.0, far=1.0)
    rs = spaced_sample(rb, 20, spacing_kind="uniform", train=False)
    # put all weight in bins 10..12 (t in [0.5, 0.65])
    w = np.zeros((2, 20, 1), np.float32)
    w[:, 10:13] = 1.0
    rs2 = pdf_sample(rb, rs, jnp.asarray(w), 16, train=False, include_original=False)
    mids = np.asarray((rs2.starts + rs2.ends))[..., 0] / 2
    frac_inside = ((mids > 0.45) & (mids < 0.7)).mean()
    assert frac_inside > 0.85


def test_pdf_sampler_include_original_sorted():
    rb = make_bundle(R=2, near=0.0, far=1.0)
    rs = spaced_sample(rb, 8, spacing_kind="uniform", train=False)
    w = np.ones((2, 8, 1), np.float32)
    rs2 = pdf_sample(rb, rs, jnp.asarray(w), 8, train=False, include_original=True)
    # 9 existing edges + 9 resampled edges -> 18 sorted edges -> 17 samples
    assert rs2.starts.shape == (2, 17, 1)
    s = np.asarray(rs2.spacing_starts)[..., 0]
    assert (np.diff(s, axis=-1) >= -1e-6).all()


def test_proposal_sampler_shapes_and_grad_gating():
    rb = make_bundle(R=4, near=0.05, far=100.0)

    def make_density_fn(scale):
        def fn(samples):  # density fns receive RaySamples (ray_samplers.py)
            positions = samples.get_positions()
            return jnp.sum(positions**2, axis=-1, keepdims=True) * 0.0 + scale

        return fn

    ray_samples, weights_list, samples_list = proposal_sample(
        rb,
        [make_density_fn(0.5), make_density_fn(0.5)],
        num_proposal_samples_per_ray=(16, 8),
        num_nerf_samples_per_ray=4,
        train=True,
        rng=jax.random.PRNGKey(0),
    )
    assert ray_samples.starts.shape == (4, 4, 1)
    assert weights_list[0].shape == (4, 16, 1)
    assert weights_list[1].shape == (4, 8, 1)
    assert len(samples_list) == 2

    # gradient gating: with updated=False, grads to the density scale vanish
    def loss(scale, updated):
        def dens_fn(samples):
            return jnp.ones_like(samples.get_positions()[..., :1]) * scale

        _, wl, _ = proposal_sample(
            rb,
            [dens_fn, dens_fn],
            num_proposal_samples_per_ray=(8, 4),
            num_nerf_samples_per_ray=4,
            updated=updated,
            train=False,
        )
        return sum(jnp.sum(w) for w in wl)

    g_on = jax.grad(loss)(0.5, True)
    g_off = jax.grad(loss)(0.5, False)
    assert abs(float(g_on)) > 1e-6
    assert float(g_off) == 0.0


def test_pdf_sampler_onehot_lookup_matches_masked(monkeypatch):
    """NS_RESAMPLE_ONEHOT=1 (one-hot MXU gather) must reproduce the default
    masked-min/max inverse-CDF lookups exactly (both select the same
    elements; the matmul is a pure selection)."""
    rb = make_bundle(R=3, near=0.0, far=1.0)
    rs = spaced_sample(rb, 24, spacing_kind="uniform", train=False)
    rng = np.random.default_rng(0)
    w = rng.uniform(0.0, 1.0, (3, 24, 1)).astype(np.float32)
    w[0, 5:9] = 0.0  # zero-mass run -> tied CDF entries
    kwargs = dict(train=True, rng=jax.random.PRNGKey(1), include_original=False)
    ref = pdf_sample(rb, rs, jnp.asarray(w), 16, **kwargs)
    monkeypatch.setenv("NS_RESAMPLE_ONEHOT", "1")
    got = pdf_sample(rb, rs, jnp.asarray(w), 16, **kwargs)
    np.testing.assert_allclose(
        np.asarray(got.spacing_starts), np.asarray(ref.spacing_starts),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got.starts), np.asarray(ref.starts), atol=1e-5
    )


def test_pdf_sampler_bf16_lookup_close_and_sorted(monkeypatch):
    """NS_PROP_BF16=1 quantizes the inverse-CDF selection; samples must stay
    sorted, in-range, and within a bin width of the f32 answer (the
    stratified jitter is already a full bin width)."""
    rb = make_bundle(R=3, near=0.0, far=1.0)
    rs = spaced_sample(rb, 24, spacing_kind="uniform", train=False)
    rng = np.random.default_rng(2)
    w = rng.uniform(0.0, 1.0, (3, 24, 1)).astype(np.float32)
    kwargs = dict(train=True, rng=jax.random.PRNGKey(1), include_original=False)
    ref = pdf_sample(rb, rs, jnp.asarray(w), 16, **kwargs)
    for onehot in ("0", "1"):
        monkeypatch.setenv("NS_RESAMPLE_ONEHOT", onehot)
        monkeypatch.setenv("NS_PROP_BF16", "1")
        got = pdf_sample(rb, rs, jnp.asarray(w), 16, **kwargs)
        s = np.asarray(got.spacing_starts)[..., 0]
        assert (np.diff(s, axis=-1) >= -1e-6).all()
        assert s.min() >= -1e-6 and s.max() <= 1.0 + 1e-6
        np.testing.assert_allclose(
            s, np.asarray(ref.spacing_starts)[..., 0], atol=1.0 / 16
        )
