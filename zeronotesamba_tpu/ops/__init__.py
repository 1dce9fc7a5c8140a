"""TPU compute primitives: VQT/CQT front-end, resampling, RMS, HPSS."""

from zeronotesamba_tpu.ops.filterbank import XQTParams
from zeronotesamba_tpu.ops.vqt import generate_xqt, log_xqt, xqt_magnitude

__all__ = ["XQTParams", "generate_xqt", "log_xqt", "xqt_magnitude"]
