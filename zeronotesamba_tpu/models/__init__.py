from zeronotesamba_tpu.models.baseline import BockTCN
from zeronotesamba_tpu.models.encoder import (
    CONV_SPECS,
    EMBED_DIM,
    POOL_AFTER,
    BeatHead,
    DSCNN,
    Encoder,
    FusedDownstream,
    TwinPretext,
)

__all__ = [
    "CONV_SPECS",
    "EMBED_DIM",
    "POOL_AFTER",
    "BeatHead",
    "BockTCN",
    "DSCNN",
    "Encoder",
    "FusedDownstream",
    "TwinPretext",
]
