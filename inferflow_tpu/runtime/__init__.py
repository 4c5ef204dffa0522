from .engine import InferenceEngine, InferenceResult  # noqa: F401
from .encoder_engine import EncoderOnlyEngine, EncDecEngine  # noqa: F401
from .factory import make_engine  # noqa: F401
from .kv_cache import KVCache  # noqa: F401
