"""Convenience namespace: the framework's cross-cutting utilities.

The reference keeps helpers under per-workload `utils/` directories
(unet/utils, pet_for_classification/...); here the canonical homes are the
data/ ops/ training/ packages — this module re-exports the pieces users
reach for most, mirroring the reference's `utils` entry point.
"""

from cips_tpu.data import mgz, nifti  # noqa: F401
from cips_tpu.data.dataset import (  # noqa: F401
    BatchLoader,
    MCIClassificationDataset,
    PackedDataset,
    PairedLatentDataset,
    PairedVolumeDataset,
    StreamingLoader,
    pack_pairs,
)
from cips_tpu.ops.metrics import mae, ms_ssim, psnr, ssim  # noqa: F401
from cips_tpu.training.common import (  # noqa: F401
    CheckpointManager,
    MetricWriter,
    StepTimer,
    guard_nonfinite,
)
from cips_tpu.training.profiling import device_memory_report, timed_steps, trace  # noqa: F401
