"""Semantic NeRF-W: semantic head shape/grad behavior and CE loss training.
Reference surface: nerfstudio/models/semantic_nerfw.py."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_thermal_tpu.cameras.rays import RayBundle
from nerfstudio_thermal_tpu.models.semantic_nerfw import (
    SemanticNerfWModel,
    SemanticNerfWModelConfig,
)


def _model(num_classes=4, pass_grads=False):
    cfg = SemanticNerfWModelConfig(
        num_levels=2, base_res=4, max_res=16, log2_hashmap_size=8,
        hidden_dim=8, hidden_dim_color=8, appearance_embed_dim=4,
        num_proposal_samples_per_ray=(8,), num_proposal_iterations=1,
        num_nerf_samples_per_ray=4,
        proposal_net_args_list=[
            {"hidden_dim": 8, "log2_hashmap_size": 8, "num_levels": 2,
             "max_res": 16, "use_linear": False},
        ],
        eval_num_rays_per_chunk=64, compute_dtype="float32",
        pass_semantic_gradients=pass_grads,
    )
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    classes = [f"c{i}" for i in range(num_classes)]
    colors = np.eye(4, 3) * 0.8
    model = SemanticNerfWModel(
        cfg, aabb, num_train_data=4,
        metadata={"semantics": {"classes": classes, "colors": colors}},
    )
    return model, model.init_params(jax.random.PRNGKey(0))


def _bundle(n=16):
    r = np.random.default_rng(0)
    dirs = r.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.asarray(r.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)),
        directions=jnp.asarray(dirs),
        pixel_area=jnp.full((n, 1), 1e-6),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
    )


def test_semantic_outputs_and_colormap():
    model, params = _model()
    out = model.forward(params, _bundle(), train=False, rng=None)
    assert out["semantics"].shape == (16, 4)
    assert out["semantics_colormap"].shape == (16, 3)
    assert np.isfinite(np.asarray(out["semantics"])).all()


def test_semantic_ce_loss_trains_head_only():
    """With pass_semantic_gradients=False the CE loss reaches the semantic
    head but NOT the density path (reference semantic_nerfw.py:215-220)."""
    model, params = _model()
    bundle = _bundle()
    batch = {
        "image": jnp.full((16, 3), 0.5),
        "semantics": jnp.asarray(np.random.default_rng(0).integers(0, 4, 16)),
    }

    def sem_loss(p):
        out = model.forward(p, bundle, train=True, rng=jax.random.PRNGKey(1))
        ld = model.get_loss_dict(p, out, batch, {"distortion": 0.0},
                                 train=True, rng=jax.random.PRNGKey(2))
        return ld["semantics_loss"]

    grads = jax.grad(sem_loss)(params)
    sem_g = sum(
        float(jnp.sum(jnp.abs(v)))
        for k, v in jax.tree_util.tree_flatten_with_path(grads["fields"])[0]
        if "mlp_semantics" in str(k)
    )
    base_g = sum(
        float(jnp.sum(jnp.abs(v)))
        for k, v in jax.tree_util.tree_flatten_with_path(grads["fields"])[0]
        if "mlp_base" in str(k)
    )
    assert sem_g > 0, "semantic head got no gradient"
    assert base_g == 0, "detached semantics leaked gradient into the base MLP"


def test_semantic_ce_decreases_with_training():
    import optax

    model, params = _model(pass_grads=True)
    bundle = _bundle(32)
    # labels correlated with ray origin (learnable from geo features)
    origins = np.asarray(bundle.origins)
    labels = jnp.asarray(
        ((origins[:, 0] > 0) + 2 * (origins[:, 1] > 0)).astype(np.int32)
    )
    batch = {"image": jnp.full((32, 3), 0.5), "semantics": labels}
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def f(p):
            out = model.forward(p, bundle, train=True, rng=jax.random.PRNGKey(1))
            ld = model.get_loss_dict(p, out, batch, {"distortion": 0.0},
                                     train=True, rng=jax.random.PRNGKey(2))
            return ld["semantics_loss"]
        l, g = jax.value_and_grad(f)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    losses = []
    for _ in range(40):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8, losses[::10]
