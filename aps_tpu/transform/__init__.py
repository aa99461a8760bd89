from aps_tpu.transform.asr import FeatureTransform as AsrTransform
from aps_tpu.transform.enh import FeatureTransform as EnhTransform
from aps_tpu.transform.enh import StftCtx
from aps_tpu.transform.utils import forward_stft, inverse_stft

__all__ = [
    "AsrTransform", "EnhTransform", "StftCtx", "forward_stft", "inverse_stft"
]
