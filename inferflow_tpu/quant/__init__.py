from .formats import (FORMATS, ALIASES, DENSE_TYPES, GLOBAL_TYPES,
                      QuantFormat, get_format, is_quantized,
                      normalize_element_type)
from .codec_np import quantize_np, dequantize_np
from .codec_jax import (QuantizedTensor, quantize, dequantize,
                        quantize_q8_sym, dequantize_q8_sym)
