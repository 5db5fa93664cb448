from timeviper_tpu.ops.norms import rms_norm, gated_rms_norm
from timeviper_tpu.ops.conv import causal_conv1d, causal_conv1d_update
from timeviper_tpu.ops.ssd import (
    ssd_reference,
    ssd_chunked,
    ssd_update_step,
)

__all__ = [
    "rms_norm",
    "gated_rms_norm",
    "causal_conv1d",
    "causal_conv1d_update",
    "ssd_reference",
    "ssd_chunked",
    "ssd_update_step",
]
