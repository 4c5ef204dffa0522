"""Pallas TPU kernels: the hot compute paths.

TPU-native replacements for the reference's CUDA kernel headers
(reference: src/kernels/gemv.h, gemm.h, tensor_quant.h): fused
dequantize-matmul over packed block-quantized weights, so weights stream
from HBM in their packed form and are expanded on the VPU inside VMEM
tiles feeding the MXU.
"""

from .dequant_matmul import quantized_matmul, register_default  # noqa: F401
