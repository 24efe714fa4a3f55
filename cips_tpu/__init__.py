"""cips_tpu — Causality-Informed PET Synthesis, TPU-native.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`jessyblues/Causality-Informed-PET-Synthesis-from-Multi-modal-Data`
(reference mounted read-only at /root/reference): synthesis of 3-D PET
volumes (AV45 amyloid / AV1451 tau) from T1-weighted MRI plus tabular
"causal" covariates, with adversarial training, a causal unified
generator, a BMGAN baseline, a downstream MCI-converter classifier, and
the full clinical preprocessing / SUVR validation tool-chain.

Design stance (not a port):
  * channels-last (N, D, H, W, C) layouts — XLA's native conv layout on TPU;
  * functional flax.linen models, single jitted train step per workload;
  * data parallel + optional spatial-grid parallel over a `jax.sharding.Mesh`;
  * bf16 compute with fp32 parameters / norm statistics;
  * Orbax checkpointing, manifest-driven packed-array data pipeline;
  * Pallas kernels for voxel-token attention.

Package layout:
  models/    model zoo (AttenUNet, encoder/decoder, AutoencoderKL, BMGAN, PatchGAN)
  ops/       resampling, registration, masking, metrics, SSIM, SUVR, pallas kernels
  data/      NIfTI IO, CSV manifests, covariates, packed-array datasets
  parallel/  mesh + sharding helpers
  training/  train states, alternating-GAN trainer core, workload tasks
  inference/ volume synthesis / prediction
  eval/      classifier metrics, SUVR analysis, cohort summaries
  cli/       command-line entry points mirroring the reference scripts
  runtime/   native (C++) data-loading runtime
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the (96,128,96) train step takes minutes
# to compile cold (remote-compile tunnel); cached reruns start instantly.
_cache_dir = _os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.jax_cache")
)
try:  # pragma: no cover - depends on jax runtime state
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # CIPS_PLATFORM=cpu forces the backend for CLI subprocesses. The ambient
    # JAX_PLATFORMS env var is clobbered by the hosting environment's
    # interpreter bootstrap, so only the config-level override is reliable
    # (e.g. running preprocessing/metrics CLIs while the TPU is busy or the
    # tunnel is down).
    if _os.environ.get("CIPS_PLATFORM"):
        _jax.config.update("jax_platforms", _os.environ["CIPS_PLATFORM"])
except Exception:
    pass
