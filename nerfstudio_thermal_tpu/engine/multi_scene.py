"""Multi-scene batched training: K scenes as ONE SPMD program.

The TPU-native scaling story the reference has no analogue for (its DDP
stack replicates one scene per process, reference scripts/train.py:103-223):
here every per-scene quantity — params, optimizer state, RNG, cameras, ray
batches — carries a leading `scene` axis, the single-scene train step
(engine/trainer.py make_ray_train_step) is `jax.vmap`ed over that axis, and
the stack is sharded over a 1-D `scene` mesh. Each device advances its
scenes' training with zero cross-scene communication (XLA inserts none:
no collectives cross the vmapped axis), so K scenes on D devices cost the
wall-clock of K/D scenes on one.

Constraints (enforced): all scenes train the same method config with EQUAL
per-scene training-image counts — the shared module's per-camera tables
(camera optimizer, appearance embeddings) are sized once, so a larger scene
would silently gather out-of-range rows. Thermal methods additionally need
the same per-camera is_thermal layout, because the camera-optimizer
modality masks are baked into the module. (Camera stacks are still padded
defensively to the widest scene; padded slots are never sampled.)

Use via `ns-train <method> --data dir1,dir2,... --machine.num-devices D`
(scripts/train.py routes comma-separated data dirs here) or directly:

    summary = train_multi_scene(method_name, [dir1, dir2], steps=30000)
"""

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerfstudio_thermal_tpu.engine.trainer import TrainState, make_ray_train_step


def _pad_cameras(cameras, target: int):
    """Pad a Cameras pytree to `target` cameras by repeating the last row
    (padded slots are never referenced by any sampled ray index)."""
    n = int(cameras.camera_to_worlds.shape[0])
    if n == target:
        return cameras

    def pad(x):
        if not hasattr(x, "shape") or x.ndim == 0 or x.shape[0] != n:
            return x
        reps = jnp.repeat(x[-1:], target - n, axis=0)
        return jnp.concatenate([x, reps], axis=0)

    return jax.tree.map(pad, cameras)


@dataclass
class MultiSceneSummary:
    num_scenes: int
    num_devices: int
    steps: int
    final_losses: List[float]  # per scene
    checkpoint_dir: Optional[Path]


def _stack_extra(extra, k: int):
    """Broadcast one init_extra_state() result to a [k, ...] stack."""
    if extra is None:
        return None
    return jax.tree.map(lambda x: jnp.stack([jnp.asarray(x)] * k), extra)


def split_scene_params(stacked_params, scene: int):
    """Slice scene `scene`'s params out of the stacked pytree (for eval /
    export through the normal single-scene paths)."""
    return jax.tree.map(lambda x: np.asarray(x[scene]), stacked_params)


def train_multi_scene(
    method: Any,
    data_dirs: Sequence[Path],
    steps: int = 1000,
    num_devices: Optional[int] = None,
    seed: int = 42,
    out_dir: Optional[Path] = None,
    config_overrides: Optional[Dict[str, Any]] = None,
    log_every: int = 100,
) -> MultiSceneSummary:
    """`method` is a registered method name OR an already-CLI-overridden
    MethodConfig (scripts/train.py passes its mutated config so user flags
    survive); either way each scene gets its own deep copy."""
    import copy

    from nerfstudio_thermal_tpu.configs.dataparser_configs import build_dataparser
    from nerfstudio_thermal_tpu.configs.method_configs import (
        get_method_config,
        resolve_model_class,
    )
    from nerfstudio_thermal_tpu.data.datamanagers import VanillaDataManager
    from nerfstudio_thermal_tpu.engine.optimizers import build_optimizer
    from nerfstudio_thermal_tpu.utils.precision import ensure_exact_f32_matmuls

    ensure_exact_f32_matmuls()

    k = len(data_dirs)
    if k < 1:
        raise ValueError("need at least one scene")

    base_config = (
        get_method_config(method) if isinstance(method, str) else method
    )

    # ---- per-scene data ----
    managers, cameras_list, models, scene_cfgs = [], [], [], []
    method = None
    for d in data_dirs:
        cfg = copy.deepcopy(base_config)
        for key, v in (config_overrides or {}).items():
            # "datamanager.x" / "trainer.x" / "dataparser.x" route to that
            # section; bare keys are model fields
            if "." in key:
                sect, attr = key.split(".", 1)
                setattr(getattr(cfg, sect), attr, v)
            else:
                setattr(cfg.model, key, v)
        cfg.data = Path(d)
        cfg.dataparser.data = Path(d)
        dm = VanillaDataManager(cfg.datamanager, build_dataparser(cfg.dataparser))
        managers.append(dm)
        cameras_list.append(jax.tree.map(jnp.asarray, dm.train_cameras))
        metadata = dict(dm.train_dataparser_outputs.metadata)
        if "is_thermal" not in metadata:
            metadata["is_thermal"] = list(dm.train_dataset.is_thermal)
        aabb = np.asarray(dm.train_dataparser_outputs.scene_box, np.float32)
        model = resolve_model_class(cfg.model)(
            cfg.model, aabb, num_train_data=len(dm.train_dataset),
            metadata=metadata,
        )
        models.append(model)
        scene_cfgs.append(cfg)
        method = cfg

    if getattr(models[0], "is_rasterization", False) or getattr(
        models[0], "is_generative", False
    ):
        raise ValueError(
            "multi-scene batching supports ray-batch methods (nerfacto "
            "family); rasterization/generative methods train per scene"
        )

    # one module is shared across the vmapped axis, and its per-camera
    # tables (camera optimizer, appearance embedding) are sized by scene
    # 0's image count — a scene with MORE cameras would silently gather
    # zero/clamped rows, so unequal counts are an error, not a pad
    n0 = len(managers[0].train_dataset)
    for i, dm in enumerate(managers[1:], 1):
        if len(dm.train_dataset) != n0:
            raise ValueError(
                f"scene {i} has {len(dm.train_dataset)} training images but "
                f"scene 0 has {n0}; multi-scene batching shares one module, "
                "so per-camera tables require equal image counts"
            )
    # thermal methods additionally bake per-camera modality masks into the
    # module, so layouts must agree
    therm0 = list(managers[0].train_dataset.is_thermal)
    for i, dm in enumerate(managers[1:], 1):
        if list(dm.train_dataset.is_thermal) != therm0 and hasattr(
            models[0], "output_suffixes"
        ):
            raise ValueError(
                f"scene {i} has a different is_thermal layout than scene 0; "
                "thermal multi-scene batching requires identical rigs"
            )

    max_cams = max(int(c.camera_to_worlds.shape[0]) for c in cameras_list)
    cameras_stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[_pad_cameras(c, max_cams) for c in cameras_list],
    )

    # ---- stacked state ----
    model = models[0]  # shared module; per-scene state lives in the stack
    base_rng = jax.random.PRNGKey(seed)
    scene_keys = jax.vmap(lambda i: jax.random.fold_in(base_rng, i))(
        jnp.arange(k)
    )
    init_keys = jax.vmap(lambda r: jax.random.split(r)[1])(scene_keys)
    params = jax.vmap(model.init_params)(init_keys)
    tx = build_optimizer(method.optimizers, split_scene_params(params, 0))
    opt_state = jax.vmap(tx.init)(params)
    state = TrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.zeros((k,), jnp.int32),
        steps_since_update=jnp.zeros((k,), jnp.int32),
        steps_since_update_thermal=jnp.zeros((k,), jnp.int32),
        rng=jax.vmap(lambda r: jax.random.split(r)[0])(scene_keys),
        extra=_stack_extra(model.init_extra_state(), k),
    )

    # ---- scene mesh + shardings ----
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if len(devices) > k:
        devices = devices[:k]
    if k % len(devices) != 0:
        raise ValueError(
            f"{k} scenes do not divide evenly over {len(devices)} devices"
        )
    mesh = Mesh(np.asarray(devices), ("scene",))
    scene_sharded = NamedSharding(mesh, P("scene"))

    core = make_ray_train_step(model, tx)
    vstep = jax.jit(
        jax.vmap(core),
        in_shardings=(scene_sharded, scene_sharded, scene_sharded),
        out_shardings=(scene_sharded, scene_sharded),
        donate_argnums=(0,),
    )

    state = jax.device_put(state, scene_sharded)
    cameras_stacked = jax.device_put(cameras_stacked, scene_sharded)

    def stacked_batch(step: int):
        batches = [dm.next_train(step) for dm in managers]
        return {
            key: jnp.asarray(np.stack([b[key] for b in batches]))
            for key in batches[0]
        }

    scalars = None
    for step in range(steps):
        batch = jax.device_put(stacked_batch(step), scene_sharded)
        state, scalars = vstep(state, batch, cameras_stacked)
        if log_every and (step % log_every == 0 or step == steps - 1):
            losses = np.asarray(scalars["loss"])
            print(
                f"step {step}: " + " ".join(
                    f"scene{i}={losses[i]:.4f}" for i in range(k)
                ),
                flush=True,
            )

    final_losses = [float(x) for x in np.asarray(scalars["loss"])]

    ckpt_dir = None
    if out_dir is not None:
        # One STANDARD single-scene artifact set per scene (config.yml +
        # nerfstudio_models/step-* + dataparser_transforms.json), so
        # ns-eval / ns-render / ns-viewer consume multi-scene runs with no
        # special casing.
        import json as _json

        import orbax.checkpoint as ocp

        from nerfstudio_thermal_tpu.configs.serialization import save_config

        ckpt_dir = Path(out_dir).resolve()
        host = jax.tree.map(np.asarray, state)
        ckptr = ocp.PyTreeCheckpointer()
        for i, d in enumerate(data_dirs):
            scene_dir = ckpt_dir / f"scene_{i}_{Path(d).name}"
            scene_dir.mkdir(parents=True, exist_ok=True)
            save_config(scene_cfgs[i], scene_dir / "config.yml")
            (scene_dir / "dataparser_transforms.json").write_text(
                _json.dumps(
                    managers[i].train_dataparser_outputs.as_dict(), indent=2
                )
            )
            sl = lambda x: np.asarray(x[i])  # noqa: B023 — consumed eagerly
            ckpt = {
                "params": jax.tree.map(sl, host.params),
                "opt_state": jax.tree.map(sl, host.opt_state),
                "step": int(host.step[i]),
                "steps_since_update": int(host.steps_since_update[i]),
                "steps_since_update_thermal": int(
                    host.steps_since_update_thermal[i]
                ),
                "rng": np.asarray(host.rng[i]),
                "eval_image_index": 0,
            }
            if host.extra is not None:
                ckpt["extra"] = jax.tree.map(sl, host.extra)
            ckptr.save(
                (scene_dir / "nerfstudio_models" / f"step-{steps:09d}").absolute(),
                ckpt, force=True,
            )

    return MultiSceneSummary(
        num_scenes=k,
        num_devices=len(devices),
        steps=steps,
        final_losses=final_losses,
        checkpoint_dir=ckpt_dir,
    )
