"""Trainer: the jitted SPMD train step + host loop.

Behavioral spec: reference `nerfstudio/engine/trainer.py:52-535` — train loop
with eval cadence, checkpoint save/load, rays/sec tracking. Differences by
design (SURVEY.md §7.1):
- `train_iteration`'s autocast/GradScaler disappears (bf16 compute, fp32
  params; no loss scaling needed on TPU).
- Callbacks (proposal anneal, update schedule) are traced scalars computed
  from `step` inside the jitted step.
- DDP is replaced by sharding: the batch is sharded over a 1-D `data` mesh,
  params are replicated, XLA inserts the gradient psum.

TrainState is a pytree carrying params, optimizer state, step, the proposal
update counters (the only "mutable" trainer state the reference kept in
Python objects), and the RNG key.
"""

import functools
import math
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfstudio_thermal_tpu.engine.optimizers import OptimizerGroupConfig, build_optimizer
from nerfstudio_thermal_tpu.model_components.ray_generators import RayGenerator
from nerfstudio_thermal_tpu.models.nerfacto import proposal_anneal, proposal_updated
from nerfstudio_thermal_tpu.parallel import mesh as mesh_lib
from nerfstudio_thermal_tpu.pipelines.base_pipeline import VanillaPipeline
from nerfstudio_thermal_tpu.utils.writer import EventName, Writer


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar
    steps_since_update: jax.Array  # proposal update counter (rgb)
    steps_since_update_thermal: jax.Array
    rng: jax.Array
    extra: Any = None  # model-specific aux state (e.g. occupancy grid)


@dataclass
class TrainerConfig:
    """(reference trainer.py:52-89 / configs/experiment_config.py)."""

    max_num_iterations: int = 30000
    steps_per_save: int = 2000
    steps_per_eval_batch: int = 500
    steps_per_eval_image: int = 500
    steps_per_eval_all_images: int = 25000
    steps_per_log: int = 10
    mixed_precision: bool = True
    save_only_latest_checkpoint: bool = True
    load_dir: Optional[Path] = None
    load_step: Optional[int] = None
    num_devices: Optional[int] = None
    seed: int = 42
    output_dir: Path = Path("outputs")
    experiment_name: str = "experiment"
    method_name: str = "method"
    timestamp: str = "{timestamp}"
    use_tensorboard: bool = False
    use_wandb: bool = False
    use_comet: bool = False
    gradient_accumulation_steps: int = 1
    """Accumulate gradients over N batches before applying (reference
    trainer.py:85-86,463-479; optax.MultiSteps here)."""
    profiler: str = "none"
    """'none' | 'basic' (running-average timings) | 'xla' (device trace at
    steps 10-15; reference utils/profiler.py)."""
    vis: str = "none"
    """'none' | 'viewer': serve the web viewer during training
    (reference engine/trainer.py:178)."""
    viewer_port: int = 7007


class Trainer:
    def __init__(
        self,
        config: TrainerConfig,
        pipeline: VanillaPipeline,
        optimizer_configs: Dict[str, OptimizerGroupConfig],
        base_dir: Optional[Path] = None,
    ):
        self.config = config
        self.pipeline = pipeline
        self.model = pipeline.model
        self.datamanager = pipeline.datamanager
        self.optimizer_configs = optimizer_configs
        self.base_dir = Path(base_dir) if base_dir else Path(config.output_dir)
        self.checkpoint_dir = self.base_dir / "nerfstudio_models"
        self.writer = Writer(
            self.base_dir, steps_per_log=config.steps_per_log,
            use_tensorboard=config.use_tensorboard,
            use_wandb=config.use_wandb, use_comet=config.use_comet,
            experiment_name=config.experiment_name,
        )
        self._xla_profiler = None
        self._viewer = None
        threading = __import__("threading")
        self.train_lock = threading.Lock()
        # viewer pause control (reference viewer.py training_state): set ->
        # the train loop idles (still releasing train_lock so viewer renders
        # stay live); _step_once grants a single iteration while paused
        self._pause_event = threading.Event()
        self._step_once = threading.Event()

        from nerfstudio_thermal_tpu.utils.precision import ensure_exact_f32_matmuls

        ensure_exact_f32_matmuls()

        self.mesh = mesh_lib.create_mesh(config.num_devices)
        self._train_step_jit = None
        self._start_step = 0

    # ------------------------------------------------------------------

    def setup(self):
        rng = jax.random.PRNGKey(self.config.seed)
        rng, init_key = jax.random.split(rng)
        params = self.model.init_params(init_key)
        self.tx = build_optimizer(self.optimizer_configs, params)
        if self.config.gradient_accumulation_steps > 1:
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=self.config.gradient_accumulation_steps
            )
        opt_state = self.tx.init(params)
        self.state = TrainState(
            params=params,
            opt_state=opt_state,
            step=jnp.asarray(0, jnp.int32),
            steps_since_update=jnp.asarray(0, jnp.int32),
            steps_since_update_thermal=jnp.asarray(0, jnp.int32),
            rng=rng,
            extra=self.model.init_extra_state(),
        )
        # Replicate the train state across the mesh; batches are sharded.
        self.state = mesh_lib.replicate(self.state, self.mesh)
        self.ray_generator = RayGenerator(
            jax.tree.map(jnp.asarray, self.datamanager.train_cameras)
        )
        self._load_checkpoint()
        self._build_train_step()

        from nerfstudio_thermal_tpu.utils import profiler as profiler_lib

        if self.config.profiler == "basic":
            profiler_lib.setup_profiler(True, self.base_dir)
        elif self.config.profiler == "xla":
            self._xla_profiler = profiler_lib.XLAProfiler(self.base_dir)

        if self.config.vis == "viewer":
            self._start_viewer()

    def _start_viewer(self):
        """Serve the web viewer against live training params
        (reference engine/trainer.py:178; renders under train_lock)."""
        from nerfstudio_thermal_tpu.viewer.server import (
            ViewerServer,
            make_model_export_fn,
            make_model_render_fn,
            probe_output_names,
        )

        render_fn = make_model_render_fn(self.model, lambda: self.host_params())
        self._viewer = ViewerServer(
            render_fn,
            output_names=probe_output_names(self.model, self.host_params()),
            port=self.config.viewer_port,
            train_lock=self.train_lock,
            save_dir=self.base_dir,
            export_fn=make_model_export_fn(
                self.model, lambda: self.host_params(),
                self.datamanager.eval_cameras, self.base_dir,
            ),
            train_control=self._viewer_train_control,
        )
        self._viewer.start(block=False)

    def _viewer_train_control(self, action: str) -> dict:
        """Viewer pause/resume/step hook (reference viewer/viewer.py
        training-state button). Returns the state the client displays."""
        if action == "pause":
            self._pause_event.set()
        elif action == "resume":
            self._pause_event.clear()
            self._step_once.set()  # wake the wait loop immediately
        elif action == "step":
            self._step_once.set()
        elif action != "status":
            raise ValueError(f"unknown train_control action '{action}'")
        return {
            "paused": self._pause_event.is_set(),
            "step": int(getattr(self, "_last_logged_step", 0)),
        }

    def _build_train_step(self):
        if getattr(self.model, "is_rasterization", False):
            self._build_image_train_step()
            return
        if getattr(self.model, "is_generative", False):
            self._build_generative_train_step()
            return
        batch_sharding = mesh_lib.batch_sharding(self.mesh)
        replicated = mesh_lib.replicated_sharding(self.mesh)

        core = make_ray_train_step(self.model, self.tx)
        cameras = self.ray_generator.cameras

        def train_step(state: TrainState, batch):
            return core(state, batch, cameras)

        self._train_step_jit = jax.jit(
            train_step,
            in_shardings=(replicated, batch_sharding),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
        )


    def _build_image_train_step(self):
        """Whole-image train step for rasterization models (splatfacto): the
        batch is one full image + camera index, replicated over the mesh
        (gaussian splatting is data-parallel over images, not rays)."""
        model = self.model
        tx = self.tx
        replicated = mesh_lib.replicated_sharding(self.mesh)
        cameras = jax.tree.map(jnp.asarray, self.datamanager.train_cameras)
        H = int(self.datamanager.train_cameras.height[0])
        W = int(self.datamanager.train_cameras.width[0])

        def train_step(state: TrainState, batch):
            rng, key_model, key_loss = jax.random.split(state.rng, 3)
            step = state.step
            extra = model.update_extra_state(state.params, state.extra, step, rng)

            def loss_fn(params):
                outputs = model.render_camera(
                    params, cameras, batch["camera_index"],
                    alive=extra["alive"], train=True, rng=key_model,
                    width=W, height=H,
                )
                metrics = model.get_metrics_dict(params, outputs, batch, train=True)
                loss_dict = model.get_loss_dict(
                    params, outputs, batch, metrics, train=True, rng=key_loss
                )
                total = sum(jax.tree.leaves(loss_dict))
                return total, (loss_dict, metrics, outputs["radii"])

            (loss, (loss_dict, metrics, radii)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            extra = model.track_refinement_stats(extra, grads, {"radii": radii})
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=new_params, opt_state=new_opt_state, step=step + 1,
                rng=rng, extra=extra,
            )
            return new_state, {"loss": loss, **loss_dict, **metrics}

        self._train_step_jit = jax.jit(
            train_step,
            in_shardings=(replicated, replicated),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
        )
        self._image_batch = True

    def _build_generative_train_step(self):
        """Text-to-3D step (generfacto): the batch is one random camera pose;
        the model renders a full low-res image and applies SDS guidance."""
        model = self.model
        tx = self.tx
        replicated = mesh_lib.replicated_sharding(self.mesh)
        model.get_guidance()  # build guidance + prompt embeddings eagerly

        def train_step(state: TrainState, batch):
            rng, key_model, key_loss = jax.random.split(state.rng, 3)
            step = state.step

            def loss_fn(params):
                outputs = model.generative_forward(
                    params, batch, step=step, train=True, rng=key_model
                )
                loss_dict = model.generative_loss(
                    params, outputs, batch, step=step, rng=key_loss
                )
                return sum(jax.tree.leaves(loss_dict)), loss_dict

            (loss, loss_dict), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=new_params, opt_state=new_opt_state, step=step + 1, rng=rng
            )
            return new_state, {"loss": loss, **loss_dict}

        self._train_step_jit = jax.jit(
            train_step,
            in_shardings=(replicated, replicated),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
        )
        self._image_batch = True  # replicate the (tiny) pose batch

    # ------------------------------------------------------------------

    def train_iteration(self, step: int):
        batch = self.datamanager.next_train(step)
        if getattr(self, "_image_batch", False):
            device_batch = jax.device_put(
                {k: np.asarray(v) for k, v in batch.items()},
                mesh_lib.replicated_sharding(self.mesh),
            )
        else:
            device_batch = mesh_lib.shard_batch(
                {k: np.asarray(v) for k, v in batch.items()}, self.mesh
            )
        self.state, scalars = self._train_step_jit(self.state, device_batch)
        self._maybe_refine(step)
        after = getattr(self.pipeline, "after_train_iteration", None)
        if after is not None:
            # DynamicBatchPipeline resizes the next ray batch (fetches a
            # device scalar only on its update_every cadence)
            after(scalars, step)
        return scalars

    def _maybe_refine(self, step: int):
        """Host-side gaussian refinement (splatfacto densify/cull)."""
        model = self.model
        if not hasattr(model, "wants_host_refinement"):
            return
        if not model.wants_host_refinement(step):
            return
        # caller (train loop) already holds train_lock
        params, opt_state, extra = model.refine_host(
            self.state.params, self.state.opt_state, self.state.extra, step
        )
        new_state = self.state.replace(
            params=params, opt_state=opt_state, extra=extra
        )
        self.state = mesh_lib.replicate(new_state, self.mesh)
        if isinstance(extra, dict) and "alive" in extra:
            model._host_alive = np.asarray(extra["alive"])

    def train(self):
        self.writer.console_log(0, {})
        t_last = time.perf_counter()
        for step in range(self._start_step, self.config.max_num_iterations):
            # viewer pause: idle without holding train_lock so interactive
            # renders stay responsive; a 'step' grant runs one iteration
            if self._pause_event.is_set() and not self._step_once.is_set():
                while (self._pause_event.is_set()
                       and not self._step_once.is_set()):
                    time.sleep(0.05)
                # exclude the idle time from the rays/s / ETA window
                t_last = time.perf_counter()
            self._step_once.clear()
            self._last_logged_step = step
            with self.train_lock:
                scalars = self.train_iteration(step)
            if self._xla_profiler is not None:
                self._xla_profiler.step(step)

            if step % self.config.steps_per_log == 0:
                scalars = {k: float(v) for k, v in scalars.items()}
                t_now = time.perf_counter()
                iter_time = (t_now - t_last) / max(self.config.steps_per_log, 1)
                t_last = t_now
                num_rays = (
                    getattr(self.datamanager, "num_rays_override", None)
                    or self.datamanager.config.train_num_rays_per_batch
                )
                rays_per_sec = num_rays / max(iter_time, 1e-9)
                scalars[EventName.TRAIN_RAYS_PER_SEC] = rays_per_sec
                scalars[EventName.ITER_TRAIN_TIME] = iter_time
                remaining = self.config.max_num_iterations - step
                scalars[EventName.ETA] = remaining * iter_time
                # device memory (reference logs GPU memory, trainer.py:272-283)
                try:
                    stats = jax.local_devices()[0].memory_stats() or {}
                    if "bytes_in_use" in stats:
                        scalars["Device Memory (MB)"] = stats["bytes_in_use"] / 1e6
                except Exception:
                    pass
                self.writer.write_scalar_dict(scalars, step, group="train")
                self.writer.console_log(step, scalars)
                if self._viewer is not None:
                    stats = {
                        "step": step,
                        "rays_per_sec": round(rays_per_sec, 1),
                        "iter_ms": round(iter_time * 1e3, 2),
                        "eta_s": round(remaining * iter_time, 1),
                    }
                    loss = scalars.get("loss")
                    if loss is not None and math.isfinite(loss):
                        stats["loss"] = round(loss, 5)
                    self._viewer.update_train_stats(stats)

            if (
                self.config.steps_per_eval_batch > 0
                and step > 0
                and step % self.config.steps_per_eval_batch == 0
                and self._has_eval_data()
            ):
                self.eval_batch_iteration(step)
            if (
                self.config.steps_per_eval_image > 0
                and step > 0
                and step % self.config.steps_per_eval_image == 0
                and self._has_eval_data()
            ):
                self.eval_iteration(step)
            if (
                self.config.steps_per_eval_all_images > 0
                and step > 0
                and step % self.config.steps_per_eval_all_images == 0
                and self._has_eval_data()
            ):
                metrics = self.pipeline.get_average_eval_image_metrics(
                    self.host_params(), step
                )
                self.writer.write_scalar_dict(metrics, step, group="eval_all")
            if step > 0 and step % self.config.steps_per_save == 0:
                self.save_checkpoint(step)
        self.save_checkpoint(self.config.max_num_iterations)

    def _has_eval_data(self) -> bool:
        """True when the eval split is non-empty. Small datasets legitimately
        produce an empty split (the paired fraction split gives every pair to
        train below ~10 pairs at the default 0.9); evals are then skipped with
        a single notice instead of throwing every cadence."""
        ds = getattr(self.datamanager, "eval_dataset", None)
        try:
            n = len(ds) if ds is not None else 0
        except TypeError:
            n = 1  # datamanagers without a sized eval dataset: attempt evals
        if n == 0 and not getattr(self, "_warned_empty_eval", False):
            self._warned_empty_eval = True
            print(
                "eval split is empty (all images assigned to train); "
                "skipping batch/image evals for this run"
            )
        return n > 0

    def eval_batch_iteration(self, step: int):
        """Eval-ray-batch losses (reference trainer.py:501-517)."""
        if getattr(self.model, "is_rasterization", False) or getattr(
            self.model, "is_generative", False
        ):
            return  # these models eval on full images only
        try:
            batch = self.datamanager.next_eval(step)
            device_batch = mesh_lib.shard_batch(
                {k: np.asarray(v) for k, v in batch.items()}, self.mesh
            )
            if not hasattr(self, "_eval_batch_jit"):
                model = self.model
                eval_rays = jax.tree.map(
                    jnp.asarray, self.datamanager.eval_cameras
                )
                from nerfstudio_thermal_tpu.model_components.ray_generators import (
                    RayGenerator,
                )

                gen = RayGenerator(eval_rays)

                def eval_losses(params, batch, key):
                    bundle = gen(batch["ray_indices"])
                    outputs = model.forward(params, bundle, train=False, rng=None)
                    metrics = model.get_metrics_dict(params, outputs, batch, train=False)
                    losses = model.get_loss_dict(
                        params, outputs, batch, metrics, train=False, rng=key
                    )
                    return {**losses, **metrics}

                self._eval_batch_jit = jax.jit(eval_losses)
            scalars = self._eval_batch_jit(
                self.state.params, device_batch, jax.random.PRNGKey(step)
            )
            scalars = {f"eval_{k}": float(v) for k, v in scalars.items()}
            self.writer.write_scalar_dict(scalars, step, group="eval")
        except Exception as e:
            print(f"eval batch failed at step {step}: {e}")

    def eval_iteration(self, step: int):
        try:
            metrics, images = self.pipeline.get_eval_image_metrics_and_images(
                self.host_params(), step
            )
            metrics.pop("_num_rays", None)
            self.writer.write_scalar_dict(metrics, step, group="eval")
            self.writer.console_log(step, metrics)
            # GT|pred grids + prop-depth maps (reference writer put_image,
            # utils/writer.py:149-171; thermal_nerfacto.py:504-522)
            for name, img in images.items():
                self.writer.write_image(f"eval/{name}", img, step)
        except Exception as e:  # eval must not kill training (reference :352-356)
            print(f"eval failed at step {step}: {e}")

    def host_params(self):
        return jax.tree.map(np.asarray, self.state.params)

    # ------------------------------------------------------------------
    # Checkpointing (reference trainer.py:389-453; orbax replaces torch.save)
    # ------------------------------------------------------------------

    def save_checkpoint(self, step: int):
        if not mesh_lib.is_main_process():
            return
        import orbax.checkpoint as ocp

        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        path = (self.checkpoint_dir / f"step-{step:09d}").absolute()
        ckpt = {
            "params": jax.tree.map(np.asarray, self.state.params),
            "opt_state": jax.tree.map(np.asarray, self.state.opt_state),
            "step": int(self.state.step),
            "steps_since_update": int(self.state.steps_since_update),
            "steps_since_update_thermal": int(self.state.steps_since_update_thermal),
            # device RNG key: restoring it makes a resumed run bit-identical
            # to an uninterrupted one (host sampling is stateless per step)
            "rng": np.asarray(self.state.rng),
            "eval_image_index": int(
                getattr(self.datamanager, "_eval_image_index", 0)
            ),
        }
        if self.state.extra is not None:
            ckpt["extra"] = jax.tree.map(np.asarray, self.state.extra)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, ckpt, force=True)
        if self.config.save_only_latest_checkpoint:
            for p in sorted(self.checkpoint_dir.glob("step-*")):
                if p.resolve() != path.resolve():
                    import shutil

                    shutil.rmtree(p, ignore_errors=True)

    def _load_checkpoint(self):
        load_dir = self.config.load_dir
        if load_dir is None:
            return
        import orbax.checkpoint as ocp

        load_dir = Path(load_dir)
        if self.config.load_step is None:
            candidates = sorted(load_dir.glob("step-*"))
            if not candidates:
                raise FileNotFoundError(f"no checkpoints in {load_dir}")
            path = candidates[-1]
        else:
            path = load_dir / f"step-{self.config.load_step:09d}"
        ckptr = ocp.PyTreeCheckpointer()
        template = {
            "params": jax.tree.map(np.asarray, self.state.params),
            "opt_state": jax.tree.map(np.asarray, self.state.opt_state),
            "step": 0,
            "steps_since_update": 0,
            "steps_since_update_thermal": 0,
            "rng": np.asarray(self.state.rng),
            "eval_image_index": 0,
        }
        if self.state.extra is not None:
            template["extra"] = jax.tree.map(np.asarray, self.state.extra)
        try:
            restored = ckptr.restore(path.absolute(), item=template)
        except Exception:
            # pre-round-3 checkpoints lack rng/eval_image_index
            legacy = {
                k: v for k, v in template.items()
                if k not in ("rng", "eval_image_index")
            }
            restored = ckptr.restore(path.absolute(), item=legacy)
        self.state = self.state.replace(
            params=jax.tree.map(jnp.asarray, restored["params"]),
            opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
            step=jnp.asarray(restored["step"], jnp.int32),
            steps_since_update=jnp.asarray(restored["steps_since_update"], jnp.int32),
            steps_since_update_thermal=jnp.asarray(
                restored["steps_since_update_thermal"], jnp.int32
            ),
            extra=(
                jax.tree.map(jnp.asarray, restored["extra"])
                if "extra" in restored and self.state.extra is not None
                else self.state.extra
            ),
        )
        if "rng" in restored:
            self.state = self.state.replace(
                rng=jnp.asarray(restored["rng"], dtype=self.state.rng.dtype)
            )
        if "eval_image_index" in restored and hasattr(
            self.datamanager, "_eval_image_index"
        ):
            self.datamanager._eval_image_index = int(restored["eval_image_index"])
        self.state = mesh_lib.replicate(self.state, self.mesh)
        self._start_step = int(restored["step"])
        set_start = getattr(self.datamanager, "set_start_step", None)
        if set_start is not None:
            set_start(self._start_step)
        print(f"Loaded checkpoint {path} at step {self._start_step}")


def make_ray_train_step(model, tx):
    """Pure ray-batch train step factory: (state, batch, cameras) ->
    (new_state, scalars). Module-level so MultiSceneTrainer can vmap it over
    a stacked scene axis (engine/multi_scene.py); Trainer closes over its
    cameras and jits it 1:1."""
    cfg = model.config
    use_anneal = getattr(cfg, "use_proposal_weight_anneal", True)
    use_anneal_t = getattr(cfg, "use_proposal_thermal_weight_anneal", False)
    anneal_iters = getattr(cfg, "proposal_weights_anneal_max_num_iters", 1000)
    anneal_slope = getattr(cfg, "proposal_weights_anneal_slope", 10.0)
    warmup = getattr(cfg, "proposal_warmup", 5000)
    update_every = getattr(cfg, "proposal_update_every", 5)

    def train_step(state: TrainState, batch, cameras):
        ray_generator = RayGenerator(cameras)
        rng, key_model, key_loss, key_extra = jax.random.split(state.rng, 4)
        step = state.step
        extra = model.update_extra_state(state.params, state.extra, step, key_extra)

        anneal = (
            proposal_anneal(step, anneal_iters, anneal_slope) if use_anneal else 1.0
        )
        updated, new_ssu = proposal_updated(
            step, state.steps_since_update, warmup, update_every
        )
        if use_anneal_t:
            anneal_t = proposal_anneal(step, anneal_iters, anneal_slope)
            updated_t, new_ssu_t = proposal_updated(
                step, state.steps_since_update_thermal, warmup, update_every
            )
        else:
            # Reference default: thermal sampler callbacks not registered,
            # so its counter never advances -> always updated, anneal 1
            # (thermal_nerfacto.py:222-255).
            anneal_t = 1.0
            updated_t = jnp.asarray(True)
            new_ssu_t = state.steps_since_update_thermal

        thermal_kwargs = {}
        if hasattr(model, "output_suffixes"):
            thermal_kwargs = dict(
                anneal_thermal=anneal_t, updated_thermal=updated_t
            )

        def loss_fn(params):
            bundle = ray_generator(batch["ray_indices"])
            outputs = model.forward(
                params, bundle, train=True, rng=key_model,
                anneal=anneal, updated=updated, **thermal_kwargs,
                **model.extra_forward_kwargs(extra),
            )
            metrics = model.get_metrics_dict(params, outputs, batch, train=True)
            loss_dict = model.get_loss_dict(
                params, outputs, batch, metrics, train=True, rng=key_loss
            )
            total = sum(jax.tree.leaves(loss_dict))
            return total, (loss_dict, metrics)

        (loss, (loss_dict, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            opt_state=new_opt_state,
            step=step + 1,
            steps_since_update=new_ssu,
            steps_since_update_thermal=new_ssu_t,
            rng=rng,
            extra=extra,
        )
        scalars = {"loss": loss, **loss_dict, **metrics}
        return new_state, scalars

    return train_step
