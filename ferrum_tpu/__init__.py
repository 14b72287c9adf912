"""ferrum_tpu — a TPU-native LLM serving/inference framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference engine `sizzlecar/ferrum-infer-rs` (Rust/CUDA/Metal): continuous
batching with chunked prefill, paged KV cache with prefix caching and
recompute-preemption, weight-only INT4 (GPTQ / GGUF Q4_K) fused
dequant-matmul, fused MoE, OpenAI-compatible serving with streaming,
tool calling and structured output, speculative decoding, and
multi-device sharding via jax.sharding meshes.

Architecture notes (TPU-first, not a port):
  - The whole decode step for all sequence slots is ONE jit-compiled XLA
    program with static shapes (the reference's CUDA-Graph capture is
    subsumed by XLA compilation; ref: crates/ferrum-kernels/src/backend/
    cuda/cuda_graph.rs:1-4).
  - Paged KV lives in HBM as [L, num_blocks, page, kv_heads, head_dim]
    arrays with int32 block tables (ref: crates/ferrum-kv/src/blocks/).
  - Hot kernels (ragged paged attention, int4 dequant+matmul, fused MoE)
    are Pallas/Mosaic kernels; a pure-jnp reference implementation exists
    for every kernel and is the correctness oracle for parity tests
    (the reference's `_eq` test pattern, SURVEY §4.5).
  - Parallelism is declared, not hand-written: jax.sharding.Mesh +
    NamedSharding; XLA inserts/overlaps ICI collectives (replaces the
    reference's NCCL persistent-thread TP, cuda/tp_decode.rs).
"""

__version__ = "0.1.0"
