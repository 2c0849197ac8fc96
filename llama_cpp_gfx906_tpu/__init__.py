"""TPU-native GGUF inference engine.

A from-scratch JAX/XLA/Pallas re-imagination of the capabilities of
``skyne98/llama.cpp-gfx906`` (a llama.cpp fork with hand-tuned HIP kernels
for the AMD MI50).  Where the reference hand-writes GCN-level HIP kernels
and a C++ backend scheduler, this engine:

- parses GGUF files with a numpy memmap reader (``gguf``),
- decodes the same block-quant formats (Q4_0/Q8_0/Q4_K/Q5_K/Q6_K/MXFP4 ...),
- runs transformer forward passes as functional JAX programs under ``jit``,
- fuses block dequantization into MXU matmuls with Pallas kernels (``ops``),
- shards weights/KV over a ``jax.sharding.Mesh`` with GSPMD collectives
  (``parallel``) instead of layer/row splits + TCP RPC,
- serves an OpenAI-compatible continuous-batching HTTP API (``server``).

Reference layer map: /root/reference SURVEY.md section 1.
"""

__version__ = "0.1.0"
