from aps_tpu.ops.pallas.attention import flash_attention, mha_reference
from aps_tpu.ops.pallas.rel_attention import (flash_attention_rel,
                                              rel_mha_reference)

__all__ = ["flash_attention", "mha_reference", "flash_attention_rel",
           "rel_mha_reference"]
