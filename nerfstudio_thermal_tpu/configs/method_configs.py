"""Method registry: named training configurations.

Behavioral spec: reference `nerfstudio/configs/method_configs.py` — the
`thermal-nerfacto` entry (:255-310) with its eight optimizer groups, plus
`nerfacto` (:90-135). Third-party methods register via
`nerfstudio_thermal_tpu.plugins`.
"""

import copy
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Optional

from nerfstudio_thermal_tpu.cameras.camera_optimizers import CameraOptimizerConfig
from nerfstudio_thermal_tpu.data.datamanagers import VanillaDataManagerConfig
from nerfstudio_thermal_tpu.data.dataparsers.nerfstudio_dataparser import (
    Nerfstudio,
    NerfstudioDataParserConfig,
    ThermalNerf,
    ThermalNerfDataParserConfig,
)
from nerfstudio_thermal_tpu.engine.optimizers import (
    AdamOptimizerConfig,
    OptimizerGroupConfig,
)
from nerfstudio_thermal_tpu.engine.schedulers import ExponentialDecaySchedulerConfig
from nerfstudio_thermal_tpu.engine.trainer import Trainer, TrainerConfig
from nerfstudio_thermal_tpu.models.nerfacto import NerfactoModelConfig
from nerfstudio_thermal_tpu.pipelines.dynamic_batch import DynamicBatchPipelineConfig
from nerfstudio_thermal_tpu.models.thermal_nerfacto import ThermalNerfactoModelConfig


@dataclass
class MethodConfig:
    """A full experiment: trainer + data + model + optimizers."""

    method_name: str
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    dataparser: NerfstudioDataParserConfig = field(
        default_factory=NerfstudioDataParserConfig
    )
    datamanager: VanillaDataManagerConfig = field(
        default_factory=VanillaDataManagerConfig
    )
    model: NerfactoModelConfig = field(default_factory=NerfactoModelConfig)
    optimizers: Dict[str, OptimizerGroupConfig] = field(default_factory=dict)
    data: Optional[Path] = None
    description: str = ""
    dynamic_batch: Optional["DynamicBatchPipelineConfig"] = None
    """When set, wrap the pipeline in DynamicBatchPipeline (instant-ngp:
    reference dynamic_batch.py, pipelines/dynamic_batch.py here)."""


def _field_opt():
    return OptimizerGroupConfig(
        optimizer=AdamOptimizerConfig(lr=1e-2, eps=1e-15),
        scheduler=ExponentialDecaySchedulerConfig(lr_final=1e-4, max_steps=200000),
    )


def _camera_opt():
    return OptimizerGroupConfig(
        optimizer=AdamOptimizerConfig(lr=1e-3, eps=1e-15),
        scheduler=ExponentialDecaySchedulerConfig(lr_final=1e-4, max_steps=5000),
    )


def make_nerfacto() -> MethodConfig:
    """(reference method_configs.py:90-135)."""
    return MethodConfig(
        method_name="nerfacto",
        description="Recommended real-time model for unbounded scenes.",
        trainer=TrainerConfig(
            max_num_iterations=30000,
            steps_per_eval_batch=500,
            steps_per_save=2000,
            mixed_precision=True,
            method_name="nerfacto",
        ),
        dataparser=NerfstudioDataParserConfig(),
        datamanager=VanillaDataManagerConfig(
            train_num_rays_per_batch=4096, eval_num_rays_per_batch=4096
        ),
        model=NerfactoModelConfig(
            eval_num_rays_per_chunk=1 << 15,
            camera_optimizer=CameraOptimizerConfig(mode="SO3xR3"),
            compute_dtype="bfloat16",
        ),
        optimizers={
            "proposal_networks": _field_opt(),
            "fields": _field_opt(),
            "camera_opt": _camera_opt(),
        },
    )


def make_thermal_nerfacto() -> MethodConfig:
    """(reference method_configs.py:255-310)."""
    return MethodConfig(
        method_name="thermal-nerfacto",
        description="Multispectral RGB+thermal nerfacto (ThermalNeRF).",
        trainer=TrainerConfig(
            max_num_iterations=30000,
            steps_per_eval_batch=500,
            steps_per_save=2000,
            mixed_precision=True,
            method_name="thermal-nerfacto",
        ),
        dataparser=ThermalNerfDataParserConfig(),
        datamanager=VanillaDataManagerConfig(
            train_num_rays_per_batch=4096 * 2,
            eval_num_rays_per_batch=4096 * 2,
            patch_size=2,  # required by the TV/cross-channel losses
        ),
        model=ThermalNerfactoModelConfig(
            eval_num_rays_per_chunk=1 << 15,
            camera_optimizer=CameraOptimizerConfig(mode="SO3xR3"),
            compute_dtype="bfloat16",
        ),
        optimizers={
            "proposal_networks": _field_opt(),
            "fields": _field_opt(),
            "proposal_networks_thermal": _field_opt(),
            "fields_thermal": _field_opt(),
            "camera_opt": _camera_opt(),
            "camera_opt_thermal": _camera_opt(),
            "shared_camera_opt": _camera_opt(),
            "shared_camera_opt_thermal": _camera_opt(),
        },
    )


_FREQ_PROPOSAL_ARGS = [
    {"encoding": "freq", "hidden_dim": 64, "num_layers": 3, "num_frequencies": 5},
    {"encoding": "freq", "hidden_dim": 64, "num_layers": 3, "num_frequencies": 7},
]


def _tpu_variant(base: MethodConfig, name: str) -> MethodConfig:
    """Compute-dense TPU flagship: frequency-MLP proposal fields + deep
    frequency-MLP base field. On TPU v5e the hash grid's random gathers lower
    to a ~serial XLA path (~0.4 G rows/s measured) while MXU matmuls at these
    batch sizes are essentially free, so the fast configuration trades table
    lookups for FLOPs (MipNeRF-360-style MLP fields at nerfacto's sampling
    schedule). The `hash` configs remain for reference parity."""
    cfg = copy.deepcopy(base)
    cfg.method_name = name
    cfg.trainer.method_name = name
    cfg.description = base.description + " (TPU compute-dense variant)"
    cfg.model.field_encoding = "freq"
    cfg.model.proposal_net_args_list = copy.deepcopy(_FREQ_PROPOSAL_ARGS)
    cfg.model.compute_dtype = "bfloat16"
    # Small final-layer init on the deep base MLP: at lecun init its raw
    # density is ~unit-variance, and on few-view scenes some seeds collapse
    # the field to empty in the first steps (measured: RGB stuck at ~9.8 dB
    # in every ablation — not pallas/bf16/camera-opt). 0.1 starts the field
    # near-uniform like the hash table's near-zero init and fixed the
    # collapsing seed (9.8 -> 23.4 dB) with healthy seeds unchanged; 0.01
    # over-flattens (thermal -4 dB on one seed).
    cfg.model.freq_final_init_scale = 0.1
    # With dimension_semantics declared (parallel fwd / arbitrary bwd) the
    # fused Pallas base MLP BEATS XLA 1.5x (9.75 vs 14.75 ms fwd+bwd on the
    # 8x256+skip+enc workload) — it keeps activations in VMEM where XLA's
    # layer-by-layer is HBM-bound at roofline. MLP._fusable() restricts
    # fusion to wide/deep stacks, so this fuses exactly the base field MLP;
    # the 64-wide proposal/head stacks stay on XLA (Pallas loses 2.5x
    # there: narrow matmuls waste the MXU).
    cfg.model.use_pallas = True
    if hasattr(cfg.model, "density_loss_rays_fraction"):
        # cross-spectral density regularizer on a 25% ray subsample
        # (unbiased; saves ~28% of the step — see the config docstring)
        cfg.model.density_loss_rays_fraction = 0.25
    # fused_modalities (one vmapped program for both modality pipelines)
    # measured SLOWER on v5e: 67.2 vs 59.4 ms/step and 216 s vs 49 s compile —
    # the step is not dispatch-bound, and the stacked [2, N, ...] layouts
    # vectorize worse than two sequential chains. Left available as a config
    # knob (numerics regression-tested); off in the flagship.
    if hasattr(cfg.model, "proposal_camera_gradients"):
        # camera-pose gradients through the PROPOSAL fields are a
        # second-order term whose f32 encoding-backward chain is the top
        # cost cluster in the step trace; dropping it is 59.5 -> 52.7
        # ms/step (+13%) with PSNR quality-neutral (4-seed 700-step A/B on
        # the convergence scene: RGB delta mean -0.1 dB / sd 2.2 across
        # seeds, thermal +0.1; the spread is trajectory noise, both signs
        # appear). Camera opt still trains through the base field.
        cfg.model.proposal_camera_gradients = False
    # Leaner sampling schedule for MLP fields: per-sample cost is ~100x a
    # hash lookup, and (128,48)/32 matched (256,96)/48 PSNR within noise on
    # the synthetic validation scene (tests/engine/test_convergence.py
    # fixture; MipNeRF-360 itself uses 64x2/32). Parity configs keep the
    # reference constants.
    cfg.model.num_proposal_samples_per_ray = (128, 48)
    cfg.model.num_nerf_samples_per_ray = 32
    # Fused ray-march (posgen + contraction + freq encoding inside the
    # Pallas MLP kernel) ships OFF: its r3-measured upside was 1.6%
    # (fray-base 180.9k vs 178.0k off), but the fused program was the
    # candidate that twice timed out compiling under the driver's bench
    # budget (BENCH_r03 rc=124) while the plain config completed — a 1.6%
    # win doesn't buy a fragile default. bench.py still autotunes over the
    # fused candidates and ships the fastest line, so any on-device win is
    # captured without making it the first-compile path. Whole-field
    # (175.9k) and fused-proposal (90.3k, sequential backward) variants
    # also measured slower, so all three knobs stay off.
    if hasattr(cfg.model, "fused_raymarch"):
        cfg.model.fused_raymarch = False
    return cfg


method_configs: Dict[str, MethodConfig] = {}
descriptions: Dict[str, str] = {}


def register_method(config: MethodConfig):
    method_configs[config.method_name] = config
    descriptions[config.method_name] = config.description


def make_vanilla_nerf() -> MethodConfig:
    """(reference method_configs.py vanilla-nerf entry)."""
    from nerfstudio_thermal_tpu.data.dataparsers.blender_dataparser import (
        BlenderDataParserConfig,
    )
    from nerfstudio_thermal_tpu.models.vanilla_nerf import VanillaModelConfig

    return MethodConfig(
        method_name="vanilla-nerf",
        description="Original NeRF (coarse/fine frequency-encoded fields).",
        trainer=TrainerConfig(max_num_iterations=300000, method_name="vanilla-nerf"),
        dataparser=BlenderDataParserConfig(),
        datamanager=VanillaDataManagerConfig(
            train_num_rays_per_batch=4096, eval_num_rays_per_batch=4096
        ),
        model=VanillaModelConfig(eval_num_rays_per_chunk=1 << 14, compute_dtype="bfloat16"),
        optimizers={
            "fields": OptimizerGroupConfig(
                optimizer=AdamOptimizerConfig(lr=5e-4, eps=1e-8),
                scheduler=ExponentialDecaySchedulerConfig(
                    lr_final=5e-5, max_steps=300000
                ),
            ),
        },
    )


def make_mipnerf() -> MethodConfig:
    """(reference method_configs.py mipnerf entry)."""
    from nerfstudio_thermal_tpu.data.dataparsers.blender_dataparser import (
        BlenderDataParserConfig,
    )
    from nerfstudio_thermal_tpu.models.mipnerf import MipNerfModelConfig

    return MethodConfig(
        method_name="mipnerf",
        description="MipNeRF: integrated positional encodings over cone frustums.",
        trainer=TrainerConfig(max_num_iterations=1000000, method_name="mipnerf"),
        dataparser=BlenderDataParserConfig(),
        datamanager=VanillaDataManagerConfig(
            train_num_rays_per_batch=1024, eval_num_rays_per_batch=1024
        ),
        model=MipNerfModelConfig(
            eval_num_rays_per_chunk=1 << 14, compute_dtype="bfloat16"
        ),
        optimizers={
            "fields": OptimizerGroupConfig(
                optimizer=AdamOptimizerConfig(lr=5e-4, eps=1e-8),
                scheduler=ExponentialDecaySchedulerConfig(
                    lr_final=5e-6, max_steps=1000000
                ),
            ),
        },
    )


def make_nerfacto_big() -> MethodConfig:
    """(reference method_configs.py:126-172)."""
    cfg = make_nerfacto()
    cfg.method_name = "nerfacto-big"
    cfg.trainer.method_name = "nerfacto-big"
    cfg.trainer.max_num_iterations = 100000
    cfg.description = "Larger nerfacto for bigger scenes."
    cfg.datamanager.train_num_rays_per_batch = 8192
    m = cfg.model
    m.num_nerf_samples_per_ray = 128
    m.num_proposal_samples_per_ray = (512, 256)
    m.hidden_dim = 128
    m.hidden_dim_color = 128
    m.appearance_embed_dim = 128
    m.max_res = 4096
    m.log2_hashmap_size = 21
    return cfg


def make_nerfacto_huge() -> MethodConfig:
    """(reference method_configs.py:174-230)."""
    cfg = make_nerfacto()
    cfg.method_name = "nerfacto-huge"
    cfg.trainer.method_name = "nerfacto-huge"
    cfg.trainer.max_num_iterations = 100000
    cfg.description = "Even larger nerfacto; long training."
    cfg.datamanager.train_num_rays_per_batch = 16384
    m = cfg.model
    m.num_nerf_samples_per_ray = 64
    m.num_proposal_samples_per_ray = (512, 512)
    m.proposal_net_args_list = [
        {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5,
         "max_res": 512, "use_linear": False},
        {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 7,
         "max_res": 2048, "use_linear": False},
    ]
    m.hidden_dim = 256
    m.hidden_dim_color = 256
    m.appearance_embed_dim = 32
    m.max_res = 8192
    m.log2_hashmap_size = 21
    return cfg


def make_instant_ngp_bounded() -> MethodConfig:
    """(reference method_configs.py:336-369): single-level grid, no scene
    contraction, black background — for bounded synthetic scenes."""
    cfg = make_instant_ngp()
    cfg.method_name = "instant-ngp-bounded"
    cfg.trainer.method_name = "instant-ngp-bounded"
    cfg.description = "Instant-NGP for bounded real/synthetic scenes."
    from nerfstudio_thermal_tpu.data.dataparsers.instant_ngp_dataparser import (
        InstantNGPDataParserConfig,
    )

    cfg.dataparser = InstantNGPDataParserConfig()
    cfg.datamanager.train_num_rays_per_batch = 8192
    m = cfg.model
    m.disable_scene_contraction = True
    m.near_plane = 0.01
    m.background_color = "black"
    return cfg


register_method(make_nerfacto())
register_method(make_thermal_nerfacto())
register_method(_tpu_variant(make_nerfacto(), "nerfacto-tpu"))
register_method(_tpu_variant(make_thermal_nerfacto(), "thermal-nerfacto-tpu"))
register_method(make_nerfacto_big())
register_method(make_nerfacto_huge())
def make_instant_ngp() -> MethodConfig:
    """(reference method_configs.py instant-ngp entry :313-350)."""
    from nerfstudio_thermal_tpu.models.instant_ngp import InstantNGPModelConfig

    return MethodConfig(
        method_name="instant-ngp",
        description="Instant-NGP: hash field with occupancy-grid skipping.",
        trainer=TrainerConfig(
            max_num_iterations=30000, steps_per_eval_batch=500,
            steps_per_save=2000, mixed_precision=True, method_name="instant-ngp",
        ),
        dataparser=NerfstudioDataParserConfig(),
        datamanager=VanillaDataManagerConfig(
            train_num_rays_per_batch=4096, eval_num_rays_per_batch=4096
        ),
        model=InstantNGPModelConfig(
            eval_num_rays_per_chunk=8192, compute_dtype="bfloat16"
        ),
        dynamic_batch=DynamicBatchPipelineConfig(),
        optimizers={
            "fields": OptimizerGroupConfig(
                optimizer=AdamOptimizerConfig(lr=1e-2, eps=1e-15),
                scheduler=ExponentialDecaySchedulerConfig(
                    lr_final=1e-4, max_steps=200000
                ),
            ),
        },
    )


register_method(make_vanilla_nerf())
register_method(make_mipnerf())
def make_depth_nerfacto() -> MethodConfig:
    """(reference method_configs.py depth-nerfacto entry)."""
    from nerfstudio_thermal_tpu.models.depth_nerfacto import DepthNerfactoModelConfig

    cfg = make_nerfacto()
    cfg.method_name = "depth-nerfacto"
    cfg.trainer.method_name = "depth-nerfacto"
    cfg.description = "Nerfacto with depth supervision (DS-NeRF/URF losses)."
    base = cfg.model
    cfg.model = DepthNerfactoModelConfig(**{
        f.name: getattr(base, f.name) for f in __import__("dataclasses").fields(base)
    })
    return cfg


register_method(make_instant_ngp())
register_method(make_instant_ngp_bounded())
def make_tensorf() -> MethodConfig:
    """(reference method_configs.py tensorf entry)."""
    from nerfstudio_thermal_tpu.data.dataparsers.blender_dataparser import (
        BlenderDataParserConfig,
    )
    from nerfstudio_thermal_tpu.models.tensorf import TensoRFModelConfig

    return MethodConfig(
        method_name="tensorf",
        description="TensoRF: vector-matrix tensor-decomposed radiance field.",
        trainer=TrainerConfig(max_num_iterations=30000, method_name="tensorf"),
        dataparser=BlenderDataParserConfig(),
        datamanager=VanillaDataManagerConfig(
            train_num_rays_per_batch=4096, eval_num_rays_per_batch=4096
        ),
        model=TensoRFModelConfig(eval_num_rays_per_chunk=1 << 14),
        optimizers={
            "fields": OptimizerGroupConfig(
                optimizer=AdamOptimizerConfig(lr=1e-2, eps=1e-8),
                scheduler=ExponentialDecaySchedulerConfig(
                    lr_final=1e-3, max_steps=30000
                ),
            ),
        },
    )


def make_neus() -> MethodConfig:
    """(reference method_configs.py:576-605)."""
    from nerfstudio_thermal_tpu.engine.schedulers import CosineDecaySchedulerConfig
    from nerfstudio_thermal_tpu.models.neus import NeuSModelConfig

    def _opt():
        return OptimizerGroupConfig(
            optimizer=AdamOptimizerConfig(lr=5e-4, eps=1e-15),
            scheduler=CosineDecaySchedulerConfig(
                warm_up_end=5000, learning_rate_alpha=0.05, max_steps=300000
            ),
        )

    return MethodConfig(
        method_name="neus",
        description="NeuS: neural implicit surfaces by volume rendering. (slow)",
        trainer=TrainerConfig(
            max_num_iterations=100000, steps_per_eval_batch=5000,
            steps_per_save=20000, steps_per_eval_image=500,
            steps_per_eval_all_images=0, mixed_precision=False,
            method_name="neus",
        ),
        dataparser=NerfstudioDataParserConfig(),
        datamanager=VanillaDataManagerConfig(
            train_num_rays_per_batch=1024, eval_num_rays_per_batch=1024
        ),
        model=NeuSModelConfig(eval_num_rays_per_chunk=1024),
        optimizers={"fields": _opt(), "field_background": _opt()},
    )


def make_neus_facto() -> MethodConfig:
    """(reference method_configs.py:607-651)."""
    from nerfstudio_thermal_tpu.engine.schedulers import (
        CosineDecaySchedulerConfig,
        MultiStepSchedulerConfig,
    )
    from nerfstudio_thermal_tpu.models.neus_facto import NeuSFactoModelConfig

    def _cos():
        return OptimizerGroupConfig(
            optimizer=AdamOptimizerConfig(lr=5e-4, eps=1e-15),
            scheduler=CosineDecaySchedulerConfig(
                warm_up_end=500, learning_rate_alpha=0.05, max_steps=20001
            ),
        )

    return MethodConfig(
        method_name="neus-facto",
        description="NeuS-Facto: NeuS with proposal-network sampling. (slow)",
        trainer=TrainerConfig(
            max_num_iterations=20001, steps_per_eval_batch=5000,
            steps_per_save=2000, steps_per_eval_image=5000,
            steps_per_eval_all_images=0, mixed_precision=False,
            method_name="neus-facto",
        ),
        dataparser=NerfstudioDataParserConfig(),
        datamanager=VanillaDataManagerConfig(
            train_num_rays_per_batch=2048, eval_num_rays_per_batch=2048
        ),
        model=NeuSFactoModelConfig(
            # proposal sampling allows a much smaller sdf/color net
            # (reference :633-642)
            sdf_num_layers=2,
            sdf_num_layers_color=2,
            sdf_hidden_dim=256,
            sdf_bias=0.5,
            sdf_beta_init=0.8,
            sdf_use_grid_feature=True,
            background_model="none",
            eval_num_rays_per_chunk=2048,
        ),
        optimizers={
            "proposal_networks": OptimizerGroupConfig(
                optimizer=AdamOptimizerConfig(lr=1e-2, eps=1e-15),
                scheduler=MultiStepSchedulerConfig(
                    max_steps=20001, milestones=(10000, 1500, 18000)
                ),
            ),
            "fields": _cos(),
        },
    )


def make_splatfacto() -> MethodConfig:
    """(reference method_configs.py:653-722): full-image batches, per-group
    optimizers over the gaussian attributes."""
    from nerfstudio_thermal_tpu.data.datamanagers import FullImageDatamanagerConfig
    from nerfstudio_thermal_tpu.models.splatfacto import SplatfactoModelConfig

    def _adam(lr, lr_final=None, max_steps=30000):
        return OptimizerGroupConfig(
            optimizer=AdamOptimizerConfig(lr=lr, eps=1e-15),
            scheduler=(
                ExponentialDecaySchedulerConfig(lr_final=lr_final, max_steps=max_steps)
                if lr_final is not None
                else None
            ),
        )

    return MethodConfig(
        method_name="splatfacto",
        description="Gaussian Splatting model (TPU scan rasterizer).",
        trainer=TrainerConfig(
            max_num_iterations=30000, steps_per_eval_image=100,
            steps_per_eval_batch=0, steps_per_save=2000,
            steps_per_eval_all_images=1000, mixed_precision=False,
            method_name="splatfacto",
        ),
        dataparser=NerfstudioDataParserConfig(),
        datamanager=FullImageDatamanagerConfig(),
        model=SplatfactoModelConfig(),
        optimizers={
            "xyz": _adam(1.6e-4, lr_final=1.6e-6, max_steps=30000),
            "features_dc": _adam(0.0025),
            "features_rest": _adam(0.0025 / 20),
            "opacities": _adam(0.05),
            "scales": _adam(0.005),
            "quats": _adam(0.001),
        },
    )


def make_semantic_nerfw() -> MethodConfig:
    """(reference method_configs.py semantic-nerfw entry)."""
    from nerfstudio_thermal_tpu.models.semantic_nerfw import (
        SemanticNerfWModelConfig,
    )

    cfg = make_nerfacto()
    cfg.method_name = "semantic-nerfw"
    cfg.trainer.method_name = "semantic-nerfw"
    cfg.description = "Semantic NeRF-W: semantics head + transient filtering."
    base = cfg.model
    cfg.model = SemanticNerfWModelConfig(**{
        f.name: getattr(base, f.name)
        for f in __import__("dataclasses").fields(base)
    })
    cfg.datamanager.train_num_rays_per_batch = 4096
    return cfg


register_method(make_depth_nerfacto())
register_method(make_tensorf())
register_method(make_neus())
register_method(make_neus_facto())
def make_generfacto() -> MethodConfig:
    """(reference method_configs.py generfacto entry: random cameras, SDS)."""
    from nerfstudio_thermal_tpu.data.datamanagers import (
        RandomCamerasDataManagerConfig,
    )
    from nerfstudio_thermal_tpu.models.generfacto import GenerfactoModelConfig

    return MethodConfig(
        method_name="generfacto",
        description="Generative Text to NeRF model (SDS guidance).",
        trainer=TrainerConfig(
            max_num_iterations=30000, steps_per_eval_batch=0,
            steps_per_eval_image=0, steps_per_eval_all_images=0,
            steps_per_save=2000, mixed_precision=False,
            method_name="generfacto",
        ),
        dataparser=NerfstudioDataParserConfig(),  # unused (random cameras)
        datamanager=RandomCamerasDataManagerConfig(),
        model=GenerfactoModelConfig(),
        optimizers={
            "fields": OptimizerGroupConfig(
                optimizer=AdamOptimizerConfig(lr=5e-3, eps=1e-15),
            ),
            "field_background": OptimizerGroupConfig(
                optimizer=AdamOptimizerConfig(lr=5e-3, eps=1e-15),
            ),
            "proposal_networks": OptimizerGroupConfig(
                optimizer=AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            ),
        },
    )


register_method(make_splatfacto())
register_method(make_semantic_nerfw())
register_method(make_generfacto())


def get_method_config(name: str) -> MethodConfig:
    from nerfstudio_thermal_tpu.plugins.registry import discover_methods

    discover_methods(method_configs)
    if name not in method_configs:
        raise KeyError(
            f"unknown method '{name}'; available: {sorted(method_configs)}"
        )
    return copy.deepcopy(method_configs[name])


def resolve_model_class(model_config):
    """Model config dataclass -> model class (most-derived config first)."""
    from nerfstudio_thermal_tpu.models.depth_nerfacto import (
        DepthNerfactoModel, DepthNerfactoModelConfig,
    )
    from nerfstudio_thermal_tpu.models.instant_ngp import (
        InstantNGPModel, InstantNGPModelConfig,
    )
    from nerfstudio_thermal_tpu.models.mipnerf import MipNerfModel, MipNerfModelConfig
    from nerfstudio_thermal_tpu.models.nerfacto import NerfactoModel
    from nerfstudio_thermal_tpu.models.neus import NeuSModel, NeuSModelConfig
    from nerfstudio_thermal_tpu.models.neus_facto import (
        NeuSFactoModel, NeuSFactoModelConfig,
    )
    from nerfstudio_thermal_tpu.models.semantic_nerfw import (
        SemanticNerfWModel, SemanticNerfWModelConfig,
    )
    from nerfstudio_thermal_tpu.models.splatfacto import (
        SplatfactoModel, SplatfactoModelConfig,
    )
    from nerfstudio_thermal_tpu.models.tensorf import TensoRFModel, TensoRFModelConfig
    from nerfstudio_thermal_tpu.models.thermal_nerfacto import (
        ThermalNerfactoModel, ThermalNerfactoModelConfig,
    )
    from nerfstudio_thermal_tpu.models.vanilla_nerf import NeRFModel, VanillaModelConfig

    for cfg_cls, model_cls in (
        (SplatfactoModelConfig, SplatfactoModel),
        (NeuSFactoModelConfig, NeuSFactoModel),
        (NeuSModelConfig, NeuSModel),
        (SemanticNerfWModelConfig, SemanticNerfWModel),
        (TensoRFModelConfig, TensoRFModel),
        (InstantNGPModelConfig, InstantNGPModel),
        (DepthNerfactoModelConfig, DepthNerfactoModel),
        (ThermalNerfactoModelConfig, ThermalNerfactoModel),
        (MipNerfModelConfig, MipNerfModel),
        (VanillaModelConfig, NeRFModel),
    ):
        if isinstance(model_config, cfg_cls):
            return model_cls
    return NerfactoModel


def setup_trainer(config: MethodConfig, base_dir: Optional[Path] = None) -> Trainer:
    """Wire dataparser -> datamanager -> model -> pipeline -> trainer
    (the reference's InstantiateConfig.setup() chain, configs/base_config.py:47-56)."""
    from nerfstudio_thermal_tpu.configs.dataparser_configs import build_dataparser
    from nerfstudio_thermal_tpu.models.nerfacto import NerfactoModel
    from nerfstudio_thermal_tpu.models.thermal_nerfacto import ThermalNerfactoModel
    from nerfstudio_thermal_tpu.models.vanilla_nerf import NeRFModel, VanillaModelConfig
    from nerfstudio_thermal_tpu.pipelines.base_pipeline import VanillaPipeline

    # generative methods train from random cameras: no dataparser/images
    from nerfstudio_thermal_tpu.data.datamanagers import (
        RandomCamerasDataManager,
        RandomCamerasDataManagerConfig,
    )
    from nerfstudio_thermal_tpu.models.generfacto import (
        GenerfactoModel,
        GenerfactoModelConfig,
    )

    if isinstance(config.model, GenerfactoModelConfig):
        datamanager = RandomCamerasDataManager(config.datamanager)
        model = GenerfactoModel(
            config.model,
            scene_aabb=datamanager.train_dataparser_outputs.scene_box,
            num_train_data=1,
            metadata={},
        )
        pipeline = VanillaPipeline(datamanager, model)
        return Trainer(config.trainer, pipeline, config.optimizers, base_dir=base_dir)

    if config.data is not None:
        config.dataparser.data = Path(config.data)

    dataparser = build_dataparser(config.dataparser)

    from nerfstudio_thermal_tpu.data.datamanagers import (
        FullImageDatamanager,
        FullImageDatamanagerConfig,
        VanillaDataManager,
    )

    # per-process seed offset so multihost workers sample different rays
    # (reference scripts/train.py:97)
    import jax as _jax

    # Random gathers into large hash tables run at ~0.06-0.09 G rows/s on
    # TPU v5e (see docs/ROOFLINE_hash.md): warn users picking the hash-grid
    # reference-parity config on TPU and point at the MXU-dense flagship.
    if (
        getattr(config.model, "field_encoding", "hash") == "hash"
        and getattr(config.model, "log2_hashmap_size", 0) >= 17
    ):
        try:
            platform = _jax.devices()[0].platform
        except Exception:
            platform = "unknown"
        if platform not in ("cpu",):
            print(
                f"WARNING: '{config.method_name}' uses a 2^"
                f"{config.model.log2_hashmap_size} hash grid; large-table "
                "random gathers are ~two orders of magnitude slower on TPU "
                "than on GPU (measured ~0.6-2k rays/s training here). For "
                "TPU throughput use the MXU-dense flagship variant "
                f"'{config.method_name}-tpu' (frequency-MLP fields, "
                "PSNR-parity validated). See docs/ROOFLINE_hash.md."
            )

    config.datamanager.seed = config.datamanager.seed + 7919 * _jax.process_index()
    dm_cls = (
        FullImageDatamanager
        if isinstance(config.datamanager, FullImageDatamanagerConfig)
        else VanillaDataManager
    )
    datamanager = dm_cls(config.datamanager, dataparser)

    metadata = dict(datamanager.train_dataparser_outputs.metadata)
    if "is_thermal" not in metadata:
        metadata["is_thermal"] = list(datamanager.train_dataset.is_thermal)

    from nerfstudio_thermal_tpu.models.mipnerf import MipNerfModel, MipNerfModelConfig
    from nerfstudio_thermal_tpu.models.instant_ngp import (
        InstantNGPModel,
        InstantNGPModelConfig,
    )

    from nerfstudio_thermal_tpu.models.depth_nerfacto import (
        DepthNerfactoModel,
        DepthNerfactoModelConfig,
    )

    from nerfstudio_thermal_tpu.models.tensorf import TensoRFModel, TensoRFModelConfig
    from nerfstudio_thermal_tpu.models.semantic_nerfw import (
        SemanticNerfWModel,
        SemanticNerfWModelConfig,
    )
    from nerfstudio_thermal_tpu.models.neus import NeuSModel, NeuSModelConfig
    from nerfstudio_thermal_tpu.models.neus_facto import (
        NeuSFactoModel,
        NeuSFactoModelConfig,
    )

    from nerfstudio_thermal_tpu.models.splatfacto import (
        SplatfactoModel,
        SplatfactoModelConfig,
    )

    if isinstance(config.model, SplatfactoModelConfig):
        md = datamanager.train_dataparser_outputs.metadata
        seed_points = None
        if md.get("points3D_xyz") is not None:
            seed_points = (md["points3D_xyz"], md.get("points3D_rgb"))
        model = SplatfactoModel(
            config.model,
            scene_aabb=datamanager.train_dataparser_outputs.scene_box,
            num_train_data=len(datamanager.train_dataset),
            metadata=metadata,
            seed_points=seed_points,
        )
        pipeline = VanillaPipeline(datamanager, model)
        return Trainer(config.trainer, pipeline, config.optimizers, base_dir=base_dir)
    model_cls = resolve_model_class(config.model)
    model = model_cls(
        config.model,
        scene_aabb=datamanager.train_dataparser_outputs.scene_box,
        num_train_data=len(datamanager.train_dataset),
        metadata=metadata,
    )
    if config.dynamic_batch is not None:
        from nerfstudio_thermal_tpu.pipelines.dynamic_batch import (
            DynamicBatchPipeline,
        )

        pipeline = DynamicBatchPipeline(datamanager, model, config.dynamic_batch)
    else:
        pipeline = VanillaPipeline(datamanager, model)
    return Trainer(config.trainer, pipeline, config.optimizers, base_dir=base_dir)
