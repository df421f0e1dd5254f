"""Stream-facing device codec: block encode/decode + parse-hint wire format.

Parse hints (user-skippable chunk 0x88, TPU-MinLZ extension): emitted before
each compressed data chunk, they record where each fixed-size output segment's
token stream begins, making the block decodable segment-parallel in lockstep
lanes.  Spec-conformant readers skip the chunk; the block itself stays 100%
standard MinLZ.

Payload: "MZPH" + version(1B) + uvarint(segment_size) + uvarint(n_segments)
+ delta-uvarint compressed offsets (first absolute, then deltas).
"""

from __future__ import annotations

from ..minlz import CorruptError, put_uvarint, read_uvarint

HINT_MAGIC = b"MZPH"
HINT_VERSION = 1


def marshal_hints(seg_size: int, hints) -> bytes:
    """hints: list of (comp_offset, out_offset); out offsets are implied by
    the fixed segment size, so only comp offsets go on the wire."""
    out = bytearray(HINT_MAGIC)
    out.append(HINT_VERSION)
    out += put_uvarint(seg_size)
    out += put_uvarint(len(hints))
    prev = 0
    for coff, _ in hints:
        out += put_uvarint(coff - prev)
        prev = coff
    return bytes(out)


def parse_hints(payload: bytes):
    """Returns (seg_size, [comp_offset...]) or raises CorruptError."""
    if payload[:4] != HINT_MAGIC:
        raise CorruptError("bad parse-hint magic")
    if payload[4] != HINT_VERSION:
        raise CorruptError(f"unsupported parse-hint version {payload[4]}")
    pos = 5
    seg_size, pos = read_uvarint(payload, pos)
    n, pos = read_uvarint(payload, pos)
    offs = []
    cur = 0
    for _ in range(n):
        d, pos = read_uvarint(payload, pos)
        cur += d
        offs.append(cur)
    return seg_size, offs


def split_body(body: bytes, comp_offsets):
    """Slice a block body into per-segment token streams."""
    segs = []
    for i, off in enumerate(comp_offsets):
        end = comp_offsets[i + 1] if i + 1 < len(comp_offsets) else len(body)
        segs.append(body[off:end])
    return segs


class DeviceCodec:
    """Block codec backed by the TPU kernels, for the stream layer.

    encode(data, level) -> (chunk_body_without_marker, hint_payload) | None
    decode(body, hint_payload, decoded_len) -> bytes
    """

    def __init__(self):
        from . import encode_kernel, pallas_decode

        self._enc = encode_kernel
        self._dec = pallas_decode

    @staticmethod
    def _seg_for(n: int) -> int:
        """Segment size scaling: <=2MiB blocks use 4KiB segments (256-512
        lanes); bigger blocks grow segments so 8MiB still fits 512 lanes."""
        seg = 4096
        while n > seg * 512:
            seg *= 2
        return seg

    def encode(self, data: bytes, level: int = 1):
        seg = self._seg_for(len(data))
        block, hints = self._enc.encode_block_device(bytes(data), seg)
        if block is None:
            return None
        # Strip the 0x00 marker + uvarint for stream framing is done by the
        # caller; here return the full block plus the hint payload.
        return block, marshal_hints(seg, hints)

    def encode_batch(self, blocks, level: int = 1):
        """Encode many blocks with one device dispatch.  Returns a list of
        (block, hint_payload) | None entries, aligned with the input."""
        seg = self._seg_for(max(len(b) for b in blocks))
        results = self._enc.encode_blocks_device(
            [bytes(b) for b in blocks], seg
        )
        out = []
        for block, hints in results:
            if block is None:
                out.append(None)
            else:
                out.append((block, marshal_hints(seg, hints)))
        return out

    def decode(self, body: bytes, hint_payload: bytes, decoded_len: int):
        seg_size, offs = parse_hints(hint_payload)
        if seg_size % 128 or not 4096 <= seg_size <= (1 << 20):
            raise CorruptError(
                f"unsupported hint segment size {seg_size}"
            )
        segs = split_body(body, offs)
        # VMEM budget: the executor holds the whole decoded block as int32
        # rows plus the compressed lanes (~5x the block size); ~1MiB output
        # is the practical ceiling on 16MB-VMEM parts.  Bigger blocks take
        # the host codec.  (Roadmap: int8 output storage lifts this 4x.)
        import jax

        max_out = (1 << 20) if jax.default_backend() == "tpu" else (2 << 20)
        max_lanes = 512
        if len(segs) <= max_lanes and decoded_len <= max_out:
            return self._dec.decode_block_tpu(segs, decoded_len, seg_size)
        # Large blocks: decode in lane-sized sub-batches.  Cross-batch
        # back-references require earlier output; for now route oversized
        # blocks to the host codec.
        raise CorruptError("block exceeds device lane budget")


_codec = None


def get_device_codec():
    global _codec
    if _codec is None:
        _codec = DeviceCodec()
    return _codec
