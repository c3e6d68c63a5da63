"""Compute ops: RoPE, KV quantization, top-k selection, sparse attention.

Each op has a pure-jnp reference implementation (the numerics anchor) and,
where it is on the hot path, a fused Pallas TPU kernel.
"""
