"""Mixed-precision policy for TPU.

The reference trains with Lightning ``precision: 16-mixed`` (fp16 compute,
fp32 master weights — /root/reference/configs/eo-vae.yaml:79) and forces
fp32 islands for the FFT loss (/root/reference/eo_vae/models/modules/ffl.py:35-41)
and the stage-1 distillation trainer (weight_distill_train.py:540).

On TPU the idiomatic equivalent is **bfloat16** compute with fp32 parameters
and fp32 islands for normalization statistics, FFT, and MS-SSIM. bf16 shares
fp32's exponent range, so the reference's fp16-overflow workarounds are not
needed — but we keep the fp32 islands for numerical parity of reductions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy threaded through model code.

    Attributes:
        param_dtype: dtype in which parameters are stored (always fp32 here).
        compute_dtype: dtype for conv/matmul compute (bf16 on TPU for speed).
        norm_dtype: dtype for normalization statistics and softmax (fp32).
        precision: matmul/conv precision. TPU runs fp32 contractions at
            bf16 by default; the fp32 policy pins HIGHEST so results match
            the torch reference bit-near. The bf16 policy uses the native
            bf16×bf16→fp32 MXU path (precision=None).
        conv_algorithm: how the large 3×3 stride-1 convs run —
            "direct" (XLA conv; the default and the training path),
            "winograd" (eovax.kernels.winograd — kept negative result),
            or "int8" (eovax.kernels.qconv: W8A8 on the double-rate int8
            MXU; inference-only — round() has zero gradient), or
            "int8-calib" (direct bf16 convs that additionally sow the
            per-conv activation percentile-amax into a ``calib``
            collection — the offline calibration pass for static
            activation scales, see eovax.kernels.qconv).
        calib_percentile: |activation| percentile recorded by the
            "int8-calib" pass (99.9 keeps outliers from inflating the
            int8 range; saturating the top 0.1% costs less than losing
            resolution on the body of the distribution).
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision | None = jax.lax.Precision.HIGHEST
    conv_algorithm: str = "direct"
    calib_percentile: float = 99.9

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_norm(self, x):
        return jnp.asarray(x, self.norm_dtype)


#: fp32 everywhere — used for parity tests and stage-1 distillation.
FULL_PRECISION = Policy()

#: bf16 compute / fp32 params — the TPU production policy (stage-2/3 training
#: and inference). Matches the reference's "16-mixed" intent.
DEFAULT_POLICY = Policy(compute_dtype=jnp.bfloat16, precision=None)

#: DEFAULT_POLICY + Winograd F(2×2,3×3) for the big 3×3 convs.
WINOGRAD_POLICY = dataclasses.replace(DEFAULT_POLICY, conv_algorithm="winograd")

#: DEFAULT_POLICY + W8A8 int8 body convs — quantized inference serving.
INT8_POLICY = dataclasses.replace(DEFAULT_POLICY, conv_algorithm="int8")

#: Calibration pass for static int8 activation scales: bf16 convs +
#: percentile-amax sown per conv (run with mutable=["calib"]).
INT8_CALIB_POLICY = dataclasses.replace(DEFAULT_POLICY, conv_algorithm="int8-calib")


def policy_from_name(name: str) -> Policy:
    """Map config strings ('32-true', '16-mixed', 'bf16-mixed', ...) to a Policy."""
    name = str(name).lower()
    if name in ("32", "32-true", "fp32", "float32"):
        return FULL_PRECISION
    if name in ("16-mixed", "bf16-mixed", "bf16", "bfloat16", "mixed"):
        return DEFAULT_POLICY
    if name in ("bf16-winograd", "winograd"):
        return WINOGRAD_POLICY
    if name in ("int8", "w8a8"):
        return INT8_POLICY
    raise ValueError(f"Unknown precision policy: {name!r}")
