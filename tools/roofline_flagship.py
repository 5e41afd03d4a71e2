"""Analytic + compiled roofline for the flagship train step.

Computes (a) XLA's own cost analysis (FLOPs, bytes) for the jitted flagship
train step, (b) an analytic MXU FLOP count for the MLP stacks from the
method config, and (c) the implied v5e time bounds, to be compared with the
measured step time (bench.py flagship row). Output feeds
docs/ROOFLINE_flagship.md.

Run on CPU (counts are platform-invariant for FLOPs) or TPU:
    JAX_PLATFORMS=cpu python tools/roofline_flagship.py
"""

import sys

sys.path.insert(0, ".")

import jax
import numpy as np

# v5e per-chip peaks (public: cloud.google.com/tpu/docs/v5e):
V5E_BF16_FLOPS = 197e12
V5E_F32_FLOPS = 49e12  # MXU f32 (4 bf16 passes)
V5E_HBM_BYTES = 819e9


def compiled_costs():
    import bench

    train_step, params, opt_state, make_batch, num_rays = bench.build_setup(
        "thermal-nerfacto-tpu"
    )
    key = jax.random.PRNGKey(0)
    batch = make_batch(0)
    lowered = train_step.lower(params, opt_state, key, batch)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
    except Exception as e:  # noqa: BLE001
        cost = {"error": str(e)}
    return cost, num_rays


def analytic_mlp_flops(num_rays=8192):
    """MXU matmul FLOPs per step for the flagship MLP stacks, from the
    shipped config (method_configs thermal-nerfacto-tpu: freq fields,
    (128,48)/32 schedule, separate density mode -> RGB + thermal fields)."""
    from nerfstudio_thermal_tpu.configs.method_configs import get_method_config

    cfg = get_method_config("thermal-nerfacto-tpu").model

    def mlp_flops(n, layers):  # layers = [(din, dout), ...]
        return sum(2 * n * a * b for a, b in layers)

    enc_dim = 2 * 3 * cfg.freq_num_frequencies + 3  # freq encoding + identity
    base_layers = [(enc_dim, cfg.freq_hidden_dim)]
    for i in range(1, cfg.freq_num_layers):
        din = cfg.freq_hidden_dim + (
            enc_dim if (cfg.freq_use_skip and i == cfg.freq_num_layers // 2) else 0
        )
        base_layers.append((din, cfg.freq_hidden_dim))
    base_layers.append((cfg.freq_hidden_dim, 16))  # geo feature head

    # color head: dir SH4 (16) + geo 15 + appearance emb
    app = cfg.appearance_embed_dim if cfg.use_appearance_embedding else 0
    head_in = 16 + 15 + app
    head_layers = [(head_in, cfg.hidden_dim_color)]
    head_layers += [(cfg.hidden_dim_color, cfg.hidden_dim_color)] * (3 - 2)
    head_layers.append((cfg.hidden_dim_color, 3))

    n_base = num_rays * cfg.num_nerf_samples_per_ray

    # proposal MLPs from proposal_net_args_list (freq density fields)
    prop_flops = 0
    for args, n_samples in zip(
        cfg.proposal_net_args_list, cfg.num_proposal_samples_per_ray
    ):
        hid = args.get("hidden_dim", 16)
        layers = args.get("num_layers", 2)
        nf = args.get("num_frequencies", 3)
        enc = 2 * 3 * nf + 3
        ls = [(enc, hid)] + [(hid, hid)] * (layers - 1) + [(hid, 1)]
        prop_flops += mlp_flops(num_rays * n_samples, ls)

    # two modality fields (separate density mode), fwd + bwd (~3x fwd for
    # matmuls: dgrad + wgrad), cross-density extra evals at
    # density_loss_rays_fraction
    base = mlp_flops(n_base, base_layers) + mlp_flops(n_base, head_layers)
    frac = getattr(cfg, "density_loss_rays_fraction", 1.0)
    cross = mlp_flops(int(num_rays * frac) * cfg.num_nerf_samples_per_ray,
                      base_layers)
    fwd = 2 * base + 2 * cross + 2 * prop_flops
    return {
        "fwd_flops": fwd,
        "train_flops": 3 * fwd,  # fwd + dgrad + wgrad
        "base_layers": base_layers,
        "enc_dim": enc_dim,
    }


def main():
    a = analytic_mlp_flops()
    print(f"analytic MLP fwd FLOPs/step:   {a['fwd_flops']/1e9:.2f} GFLOP")
    print(f"analytic MLP train FLOPs/step: {a['train_flops']/1e9:.2f} GFLOP")
    print(f"  -> v5e bf16 MXU floor: {a['train_flops']/V5E_BF16_FLOPS*1e3:.2f} ms")
    print(f"  -> v5e f32  MXU floor: {a['train_flops']/V5E_F32_FLOPS*1e3:.2f} ms")
    cost, num_rays = compiled_costs()
    if "error" not in cost:
        flops = cost.get("flops", float("nan"))
        bytes_ = cost.get("bytes accessed", float("nan"))
        print(f"XLA cost analysis: flops={flops/1e9:.2f} G, "
              f"bytes accessed={bytes_/1e9:.2f} GB")
        print("  NOTE: Pallas custom-calls are opaque to cost_analysis — the "
              "base-field MLP FLOPs (the bulk of the analytic count) are NOT "
              "in the XLA number; it covers props/machinery/optimizer only.")
        print(f"  -> HBM floor at 819 GB/s: {bytes_/V5E_HBM_BYTES*1e3:.2f} ms "
              f"(CPU-fusion estimate; TPU fusion differs)")
    else:
        print(f"cost_analysis unavailable: {cost['error']}")
    for n, rate in ((180167, "r4 driver-captured"),):
        ms = num_rays / n * 1e3
        print(f"measured {rate}: {n} rays/s = {ms:.1f} ms/step")


if __name__ == "__main__":
    main()
