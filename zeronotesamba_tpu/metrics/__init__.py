from zeronotesamba_tpu.metrics.beat import (
    continuity,
    evaluate_beats,
    f_measure,
    information_gain,
    trim_beats,
)

__all__ = ["continuity", "evaluate_beats", "f_measure", "information_gain", "trim_beats"]
