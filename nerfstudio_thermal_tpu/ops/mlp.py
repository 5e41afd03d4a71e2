"""MLPs as MXU-friendly XLA dot chains.

Behavioral spec: reference `nerfstudio/field_components/mlp.py:60-292` (plain
MLP and the fused hash+MLP `MLPWithHashEncoding`, the training hot kernel —
tiny-cuda-nn FullyFusedMLP in the reference). On TPU the fused form is simply
the hash gather followed by bf16 matmuls; XLA fuses the elementwise chain and
tiles the dots onto the MXU, so no hand-written fusion is needed for the MLP
portion. Params are kept fp32; compute runs in `compute_dtype` (bf16 on TPU),
matching the reference's fp16-tcnn / fp32-params split (see SURVEY.md §2.8).
"""

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfstudio_thermal_tpu.ops.encodings import HashEncoding


class MLP(nn.Module):
    """Plain MLP: `num_layers` Dense layers of `layer_width`, then out layer.

    Layer-count semantics match reference mlp.py:142-160: num_layers == 1 is a
    single in->out Linear; otherwise (num_layers - 1) hidden layers + output.
    """

    num_layers: int
    layer_width: int
    out_dim: int
    skip_connections: Tuple[int, ...] = ()
    activation: Optional[Callable] = nn.relu
    out_activation: Optional[Callable] = None
    compute_dtype: jnp.dtype = jnp.float32
    fused: bool = False
    """Run the whole stack as one Pallas kernel (ops/pallas/fused_mlp.py) —
    activations never touch HBM. Requires relu hidden activation and
    None/sigmoid output activation; interprets on CPU automatically."""
    fused_block_size: int = 2048
    """Best measured on v5e (blk sweep: 2048 edges 1024/4096/8192)."""
    freq_encoding: Optional[Tuple[int, float, float, bool]] = None
    """(num_frequencies, min_exp, max_exp, include_input): compute the NeRF
    frequency encoding INSIDE the fused kernel (x must then be raw f32
    coordinates) — the tcnn NetworkWithInputEncoding analogue. Forces the
    fused path; the [N, enc_dim] encoding never touches HBM."""
    ray_input_grads: bool = True
    """rays mode: compute d(origins)/d(dirs)/d(ts) in the backward kernel.
    False when the caller stop-gradients the ray geometry (proposal fields
    with proposal_camera_gradients=False) — skips the encoding/contraction/
    posgen backward chain entirely."""
    final_init_scale: float = 1.0
    """Scale on the LAST layer's kernel init. Deep frequency-MLP base fields
    emit ~unit-variance raw density at lecun init, so trunc_exp starts wildly
    noisy — the hash field's U(-1e-4,1e-4) table starts near zero instead
    (reference encodings.py:375-379), which is why the hash configs never
    show the seed-dependent early density collapse the freq configs can.
    <1 starts the field near-uniform like the reference's."""

    def _relu_out_ok(self) -> bool:
        relu_ok = self.activation in (nn.relu, jax.nn.relu)
        out_ok = self.out_activation in (None, nn.sigmoid, jax.nn.sigmoid)
        return relu_ok and out_ok

    def will_fuse_rays(self) -> bool:
        """Whether __call__(rays=...) runs the fused ray-march kernel. No
        width gate: even narrow (proposal) stacks win once position
        generation + contraction + encoding fold into the kernel — the XLA
        alternative pays HBM for every [N, enc]/[N, width] intermediate."""
        return (
            self.fused and self._relu_out_ok() and self.freq_encoding is not None
        )

    def _fusable(self) -> bool:
        relu_ok = self.activation in (nn.relu, jax.nn.relu)
        out_ok = self.out_activation in (None, nn.sigmoid, jax.nn.sigmoid)
        # Fusing only pays off for deep/wide stacks — even WITH the in-kernel
        # frequency encoding. Measured on v5e (fwd+bwd, with
        # dimension_semantics declared): base 8x256+skip+enc 9.75 ms Pallas
        # vs 14.75 ms XLA (1.5x win), but 2x64+enc proposal 15.8 vs 6.4 ms
        # (2.5x LOSS: 64-wide matmuls waste the MXU and the per-block
        # encoding VPU work dominates). So use_pallas=True fuses exactly the
        # base field MLP and leaves proposal/head stacks to XLA.
        big_enough = self.layer_width >= 128 and self.num_layers >= 4
        return self.fused and relu_ok and out_ok and big_enough

    def _enc_dim(self) -> int:
        nf, _, _, include_input = self.freq_encoding
        return 3 * nf * 2 + (3 if include_input else 0)

    def _fused_params(self, in_dim: int):
        """Per-layer (weights, biases) params with the fused-path naming."""
        skips = set(self.skip_connections)
        num_linears = 1 if self.num_layers == 1 else self.num_layers
        weights, biases = [], []
        prev = in_dim
        for i in range(num_linears):
            is_last = i == num_linears - 1
            width = self.out_dim if is_last else self.layer_width
            din = prev + (in_dim if (i in skips and i != 0) else 0)
            init = nn.initializers.lecun_normal()
            if is_last and self.final_init_scale != 1.0:
                init = nn.initializers.variance_scaling(
                    self.final_init_scale**2, "fan_in", "truncated_normal"
                )
            weights.append(
                self.param(f"Dense_{i}_kernel", init, (din, width), jnp.float32)
            )
            biases.append(
                self.param(
                    f"Dense_{i}_bias", nn.initializers.zeros, (width,), jnp.float32
                )
            )
            prev = width
        return tuple(weights), tuple(biases)

    @nn.compact
    def __call__(
        self,
        x: Optional[jax.Array],
        rays: Optional[Tuple[jax.Array, jax.Array, jax.Array, int]] = None,
        export_params: Optional[int] = None,
    ) -> jax.Array:
        if export_params is not None:
            # Return this stack's (weights, biases) with the fused-path
            # naming so a parent module can feed them into a combined kernel
            # (fields/nerfacto_field.py fused_field path). The int is the
            # input dim (the MLP normally infers it from x).
            return self._fused_params(export_params)
        if rays is not None:
            # Fused ray-march: (origins [R,3], dirs [R,3], ts [R*S,1], S).
            # Position generation + inf-norm contraction + selector +
            # frequency encoding + MLP run in one Pallas kernel; returns
            # [R*S, out_dim + 1] with the in-scene selector as the last lane.
            # Callers gate on will_fuse_rays().
            from nerfstudio_thermal_tpu.ops.pallas.fused_mlp import fused_ray_mlp

            assert self.will_fuse_rays()
            origins, dirs, ts, num_samples = rays
            weights, biases = self._fused_params(self._enc_dim())
            out_act = "sigmoid" if self.out_activation is not None else None
            return fused_ray_mlp(
                origins.astype(jnp.float32),
                dirs.astype(jnp.float32),
                ts.astype(jnp.float32),
                weights,
                biases,
                num_samples,
                "relu",
                out_act,
                self.fused_block_size,
                jax.default_backend() == "cpu",
                tuple(sorted(set(self.skip_connections))),
                self.freq_encoding,
                jnp.dtype(self.compute_dtype).name,
                self.ray_input_grads,
            )

        use_fused = self._fusable()
        in_kernel_enc = use_fused and self.freq_encoding is not None
        if in_kernel_enc:
            # raw coords stay f32; the kernel encodes then runs in bf16
            x = x.astype(jnp.float32)
        else:
            if self.freq_encoding is not None:
                # unfusable config (e.g. non-relu): same math outside the
                # kernel so params/behavior stay identical
                from nerfstudio_thermal_tpu.ops.encodings import NeRFEncoding

                nf, mn, mx, inc = self.freq_encoding
                x = NeRFEncoding(
                    in_dim=3, num_frequencies=nf, min_freq_exp=mn,
                    max_freq_exp=mx, include_input=inc,
                )(x.astype(jnp.float32))
            x = x.astype(self.compute_dtype)
        in_tensor = x
        skips = set(self.skip_connections)
        num_linears = 1 if self.num_layers == 1 else self.num_layers

        if use_fused:
            from nerfstudio_thermal_tpu.ops.pallas.fused_mlp import fused_mlp

            in_dim = self._enc_dim() if in_kernel_enc else x.shape[-1]
            weights, biases = self._fused_params(in_dim)
            out_act = "sigmoid" if self.out_activation is not None else None
            return fused_mlp(
                x.reshape(-1, x.shape[-1]),
                weights,
                biases,
                "relu",
                out_act,
                self.fused_block_size,
                jax.default_backend() == "cpu",
                tuple(sorted(skips)),
                self.freq_encoding if in_kernel_enc else None,
                jnp.dtype(self.compute_dtype).name,
            ).reshape(*x.shape[:-1], self.out_dim)

        for i in range(num_linears):
            is_last = i == num_linears - 1
            width = self.out_dim if is_last else self.layer_width
            if i in skips and i != 0:
                x = jnp.concatenate([in_tensor, x], axis=-1)
            if is_last and self.final_init_scale != 1.0:
                x = nn.Dense(
                    width, dtype=self.compute_dtype, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.variance_scaling(
                        self.final_init_scale**2, "fan_in", "truncated_normal"
                    ),
                )(x)
            else:
                x = nn.Dense(width, dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
            if not is_last and self.activation is not None:
                x = self.activation(x)
        if self.out_activation is not None:
            x = self.out_activation(x)
        return x


class MLPWithHashEncoding(nn.Module):
    """Hash-grid encoding feeding an MLP — the base field of every nerfacto
    variant (reference mlp.py:186-292, used at fields/nerfacto_field.py:135).
    """

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 1024
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    num_layers: int = 2
    layer_width: int = 64
    out_dim: int = 16
    activation: Optional[Callable] = nn.relu
    out_activation: Optional[Callable] = None
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, positions: jax.Array) -> jax.Array:
        encoded = HashEncoding(
            num_levels=self.num_levels,
            min_res=self.min_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            name="encoding",
        )(positions)
        return MLP(
            num_layers=self.num_layers,
            layer_width=self.layer_width,
            out_dim=self.out_dim,
            activation=self.activation,
            out_activation=self.out_activation,
            compute_dtype=self.compute_dtype,
            name="mlp",
        )(encoded)
