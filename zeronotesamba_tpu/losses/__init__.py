from zeronotesamba_tpu.losses.bce import masked_bce
from zeronotesamba_tpu.losses.ntxent import ntxent, ntxent_global

__all__ = ["masked_bce", "ntxent", "ntxent_global"]
