from aps_tpu.ops.pallas.attention import flash_attention, mha_reference

__all__ = ["flash_attention", "mha_reference"]
