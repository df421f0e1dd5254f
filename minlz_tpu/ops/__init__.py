"""Device (JAX/Pallas) kernels for TPU-MinLZ.

Layout convention: a *segment* is the unit of lane parallelism — a span of a
block's output (default 4KiB) that begins at a token boundary.  Our encoder
emits segment parse hints (chunk 0x88) so decode can run all segments of a
block in lockstep lanes; foreign (hint-less) streams fall back to the host
codec.

Kernels:
  decode_kernel — phase 1 byte-lockstep transducer parse (one byte per step,
      all lanes advance together; divergence lives in state space, not
      address space), phase 2 scalar-loop span executor.
  encode_kernel — batched-sort candidate finder + lockstep greedy parse +
      scalar serializer.
"""

from .decode_kernel import decode_segments_jnp

__all__ = ["decode_segments_jnp"]
