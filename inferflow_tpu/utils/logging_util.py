"""Logging + memory statistics.

reference: sslib Logger with leveled macros writing console+file per
[app_env.logging] (3rd_party/sslib/log.h:208-228, app_environment.h), and
the engine's VRAM statistics at startup (CalculateStat,
inference_engine.cc:1879-1910; KV cost inference_worker.cc:178-182).
"""

from __future__ import annotations

import logging
import sys
from typing import Optional

_FMT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"


def init_logging(level: str = "info", log_file: str = "",
                 console: bool = True) -> logging.Logger:
    """InitAppEnv-style logging setup (console + optional file)."""
    root = logging.getLogger("inferflow_tpu")
    root.setLevel(getattr(logging, level.upper(), logging.INFO))
    root.handlers.clear()
    fmt = logging.Formatter(_FMT)
    if console:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(fmt)
        root.addHandler(h)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        root.addHandler(fh)
    return root


def get_logger(name: str = "") -> logging.Logger:
    return logging.getLogger("inferflow_tpu" + (f".{name}" if name else ""))


def memory_stat(params: dict, cache=None) -> dict:
    """Weight/KV byte accounting (the CalculateStat analog)."""
    from ..models.zoo import model_weight_bytes

    stat = {"weight_bytes": model_weight_bytes(params)}
    if cache is not None:
        kv = int(cache.k.size) * cache.k.dtype.itemsize * 2
        if cache.quantized:
            kv += int(cache.k_scale.size) * cache.k_scale.dtype.itemsize * 2
        stat["kv_cache_bytes"] = kv
    try:
        import jax
        dev = jax.devices()[0]
        ms = getattr(dev, "memory_stats", None)
        if callable(ms):
            info = ms() or {}
            for key in ("bytes_in_use", "bytes_limit"):
                if key in info:
                    stat[key] = info[key]
    except Exception:
        pass
    return stat


def log_memory_stat(params: dict, cache=None, logger=None) -> dict:
    stat = memory_stat(params, cache)
    lg = logger or get_logger("engine")
    parts = [f"{k}={v / 1e9:.2f}GB" if "bytes" in k else f"{k}={v}"
             for k, v in stat.items()]
    lg.info("memory: %s", " ".join(parts))
    return stat
