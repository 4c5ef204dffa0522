"""inferflow-tpu: a TPU-native LLM serving engine with Inferflow's capabilities.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Inferflow
C++/CUDA serving engine (reference: /root/reference):

- Config-file-driven model support (model_spec.json + ini-style service config).
- Weight-only block quantization at 2/3/3.5/4/5/6/8 bits (incl. the novel
  3.5-bit Q3H scheme) with fused Pallas dequant-matmul kernels.
- Quantized (8-bit) KV cache.
- Decoder-only / encoder-only / encoder-decoder archetypes, MoE, GQA,
  RoPE/ALiBi/sinusoidal position embeddings.
- Checkpoint loading: safetensors, pickle (safe non-executing parser), GGUF,
  llama2.c.
- Multi-device partitioning via jax.sharding Mesh + GSPMD (tensor / layer /
  hybrid parallel), replacing the reference's custom phase-barrier backend.
- Continuous batching, streaming HTTP service with OpenAI-compatible API.
"""

__version__ = "0.1.0"


def _register_kernels():
    """Register the Pallas fused dequant-matmul as the linear() fast path."""
    from .kernels import register_default
    register_default()


_register_kernels()
