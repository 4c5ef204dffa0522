"""Sampling / decoding strategies.

reference: src/transformer/sampling_strategy.{h,cc},
decoding_strategies.{h,cc}.
"""

from .strategies import (DecodingStrategies, SamplingOptions,  # noqa: F401
                         get_strategy_id, STRATEGY_IDS)
