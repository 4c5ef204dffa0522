"""Runtime: engines, KV cache, batching, offload.

Exports are lazy (module __getattr__): models/decoder.py imports
runtime.kv_cache while runtime.engine imports models/decoder — eager
re-exports here would create an import cycle.
"""

_EXPORTS = {
    "InferenceEngine": ("engine", "InferenceEngine"),
    "InferenceResult": ("engine", "InferenceResult"),
    "EncoderOnlyEngine": ("encoder_engine", "EncoderOnlyEngine"),
    "EncDecEngine": ("encoder_engine", "EncDecEngine"),
    "make_engine": ("factory", "make_engine"),
    "KVCache": ("kv_cache", "KVCache"),
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib
        mod, attr = _EXPORTS[name]
        return getattr(importlib.import_module(f".{mod}", __name__), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = list(_EXPORTS)
