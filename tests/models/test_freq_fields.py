import numpy as np
import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.fields.density_fields import MLPDensityField
from nerfstudio_thermal_tpu.models.thermal_nerfacto import (
    ThermalNerfactoModel,
    ThermalNerfactoModelConfig,
)
from tests.models.test_thermal_nerfacto import AABB, make_batch, make_bundle, tiny_config


def test_mlp_density_field():
    f = MLPDensityField(aabb=((-1,-1,-1),(1,1,1)), hidden_dim=16, num_layers=2, num_frequencies=4)
    pos = jax.random.uniform(jax.random.PRNGKey(0), (8, 4, 3)) * 2 - 1
    params = f.init(jax.random.PRNGKey(1), pos)
    d = f.apply(params, pos)
    assert d.shape == (8, 4, 1)
    assert bool(jnp.all(d >= 0))


def test_thermal_model_freq_encoding_trains():
    cfg = tiny_config(
        density_mode="separate",
        field_encoding="freq",
        freq_num_frequencies=4,
        freq_num_layers=3,
        freq_hidden_dim=16,
        proposal_net_args_list=[
            {"encoding": "freq", "hidden_dim": 8, "num_layers": 2, "num_frequencies": 3},
        ] * 2,
    )
    model = ThermalNerfactoModel(cfg, AABB, num_train_data=4, metadata={"is_thermal": [0, 0, 1, 1]})
    params = model.init_params(jax.random.PRNGKey(0))
    # no hash tables anywhere in the param tree
    names = [p for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    assert not any("hash_table" in jax.tree_util.keystr(n) for n in names)

    bundle, batch = make_bundle(), make_batch()

    def loss_fn(p, rng):
        out = model.forward(p, bundle, train=True, rng=rng)
        m = model.get_metrics_dict(p, out, batch, train=True)
        ld = model.get_loss_dict(p, out, batch, m, train=True, rng=rng)
        return sum(jax.tree.leaves(ld))

    l, g = jax.jit(jax.value_and_grad(loss_fn))(params, jax.random.PRNGKey(1))
    assert np.isfinite(float(l))
    flat = jax.tree.leaves(jax.tree.map(lambda x: jnp.isfinite(x).all(), g))
    assert all(bool(f) for f in flat)
