from aps_tpu.loader.utils import (BatchSampler, SimpleDataLoader,
                                  derive_indices, pad_seqs, quantize_len)

__all__ = [
    "BatchSampler", "SimpleDataLoader", "derive_indices", "pad_seqs",
    "quantize_len"
]
