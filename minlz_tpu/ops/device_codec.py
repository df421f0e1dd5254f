"""Stream-facing device codec: block encode/decode + parse-hint wire format.

Parse hints (user-skippable chunk 0x88, TPU-MinLZ extension): emitted before
each compressed data chunk, they record where each fixed-size output segment's
token stream begins, making the block decodable segment-parallel in lockstep
lanes.  Spec-conformant readers skip the chunk; the block itself stays 100%
standard MinLZ.

Payload v1: "MZPH" + 0x01 + uvarint(segment_size) + uvarint(n_segments)
+ delta-uvarint compressed offsets (first absolute, then deltas).
Payload v2: same with version 0x02 and uvarint(range) inserted after
n_segments — `range` > 0 guarantees every match source lies in the
range-aligned window of its destination, enabling the chained parallel
executor (exec_chain.py).
"""

from __future__ import annotations

from ..minlz import CorruptError, put_uvarint, read_uvarint

HINT_MAGIC = b"MZPH"
HINT_VERSION = 2


def marshal_hints(seg_size: int, hints, rng: int = 0) -> bytes:
    """hints: list of (comp_offset, out_offset); out offsets are implied by
    the fixed segment size, so only comp offsets go on the wire."""
    out = bytearray(HINT_MAGIC)
    out.append(HINT_VERSION)
    out += put_uvarint(seg_size)
    out += put_uvarint(len(hints))
    out += put_uvarint(rng)
    prev = 0
    for coff, _ in hints:
        out += put_uvarint(coff - prev)
        prev = coff
    return bytes(out)


def parse_hints(payload: bytes):
    """Returns (seg_size, [comp_offset...], rng) or raises CorruptError."""
    if payload[:4] != HINT_MAGIC:
        raise CorruptError("bad parse-hint magic")
    version = payload[4]
    if version not in (1, 2):
        raise CorruptError(f"unsupported parse-hint version {version}")
    pos = 5
    seg_size, pos = read_uvarint(payload, pos)
    n, pos = read_uvarint(payload, pos)
    rng = 0
    if version >= 2:
        rng, pos = read_uvarint(payload, pos)
    offs = []
    cur = 0
    for _ in range(n):
        d, pos = read_uvarint(payload, pos)
        cur += d
        offs.append(cur)
    return seg_size, offs, rng


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
        from . import encode_kernel, exec_chain, pallas_decode

        self._enc = encode_kernel
        self._dec = pallas_decode
        self._chain = exec_chain

    @staticmethod
    def _seg_for(n: int) -> int:
        """Segment size scaling: <=2MiB blocks use 4KiB segments (256-512
        lanes); bigger blocks grow segments so 8MiB still fits 512 lanes."""
        seg = 4096
        while n > seg * 512:
            seg *= 2
        return seg

    # Stream levels map onto device effort tiers: LEVEL_SUPER_FAST (-1)
    # drops sort passes, 1/2 scale tier count, LEVEL_SMALLEST (3) deepens
    # candidate sets and relaxes the emit profit gate (see
    # encode_kernel.find_matches_dyn and codec.cpp parse_serialize_range;
    # reference per-level machines encode_l0.go:32..encode_l3.go:38).
    def encode(self, data: bytes, level: int = 2):
        seg = self._seg_for(len(data))
        rng = self._chain.RANGE
        block, hints = self._enc.encode_block_device(
            bytes(data), seg, rng, level
        )
        if block is None:
            return None
        # Strip the 0x00 marker + uvarint for stream framing is done by the
        # caller; here return the full block plus the hint payload.
        return block, marshal_hints(seg, hints, rng)

    def encode_emit(self, data: bytes, level: int = 2):
        """FULLY on-device encode: match find -> greedy parse -> byte-exact
        verify -> token emission all on device (ops/emit.py); the host only
        frames the header.  Byte-exact by construction, but measured ~25x
        slower than the fused host serializer on v5e (the XLA scatter
        emission dominates) at a ~7-point ratio cost — this path exists
        for host-CPU-free pipelines and the sharded mesh writer
        (parallel/mesh.py), not single-chip throughput.  Reference
        emitters: asm_none.go:84-353."""
        import jax.numpy as jnp
        import numpy as np

        from ..minlz import put_uvarint
        from . import encode_kernel as ek
        from ..ops import emit

        n = len(data)
        if n == 0:
            return None
        seg = self._seg_for(n)
        rng = self._chain.RANGE
        N = -(-max(n, 1) // seg) * seg
        N = -(-N // (2 * ek.WINDOW)) * (2 * ek.WINDOW)
        flat = np.zeros(N, np.uint8)
        flat[:n] = np.frombuffer(bytes(data), np.uint8)
        out, lens = emit.encode_block_emit(
            jnp.asarray(flat, jnp.int32)[None, :], n, seg, rng, level
        )
        lens = np.asarray(lens)
        out = np.asarray(out)
        nseg = -(-n // seg)
        body = b"".join(
            out[i, : lens[i]].tobytes() for i in range(nseg)
        )
        if len(body) >= n:
            return None
        offs = np.concatenate([[0], np.cumsum(lens[:nseg])[:-1]])
        hints = [(int(o), i * seg) for i, o in enumerate(offs)]
        block = b"\x00" + put_uvarint(n) + body
        return block, marshal_hints(seg, hints, rng)

    def _emit_batch_arrays(self, blocks, level: int, mesh=None):
        """Shared batched device-emit core: pad blocks to one window-sized
        geometry, emit every block's token streams in ONE dispatch (vmap on
        a single chip, or ``shard_map`` data-parallel over ``mesh``), and
        return (block, hint_payload) | None entries in submission order."""
        import jax.numpy as jnp
        import numpy as np

        from ..minlz import put_uvarint
        from . import encode_kernel as ek

        rng = self._chain.RANGE
        seg = self._seg_for(max(len(b) for b in blocks))
        N = -(-max(max(len(b) for b in blocks), 1) // seg) * seg
        N = -(-N // (2 * ek.WINDOW)) * (2 * ek.WINDOW)
        B = len(blocks)
        if mesh is not None:
            ax = mesh.devices.size
            B = -(-B // ax) * ax  # pad batch to the mesh axis size
        arr = np.zeros((B, N), np.int32)
        ns = np.zeros((B,), np.int32)
        for i, b in enumerate(blocks):
            arr[i, : len(b)] = np.frombuffer(bytes(b), np.uint8)
            ns[i] = len(b)
        ns = np.maximum(ns, 1)  # emit needs >= 1 segment per lane

        if mesh is not None:
            from ..parallel.mesh import sharded_encode_blocks

            out, lens, _sizes, _offs = sharded_encode_blocks(
                mesh, jnp.asarray(arr), jnp.asarray(ns), seg=seg,
                rng=rng, level=level,
            )
        else:
            from . import emit

            def one(b, nv):
                return emit.encode_block_emit(
                    b[None, :], nv, seg, rng, level
                )

            import jax

            out, lens = jax.jit(jax.vmap(one))(
                jnp.asarray(arr), jnp.asarray(ns)
            )
        out = np.asarray(out)
        lens = np.asarray(lens)

        results = []
        for i, b in enumerate(blocks):
            n = len(b)
            if n == 0:
                results.append(None)
                continue
            nseg = -(-n // seg)
            body = b"".join(
                out[i, s, : lens[i, s]].tobytes() for s in range(nseg)
            )
            if len(body) >= n:
                results.append(None)
                continue
            offs = np.concatenate([[0], np.cumsum(lens[i, :nseg])[:-1]])
            hints = [(int(o), s * seg) for s, o in enumerate(offs)]
            block = b"\x00" + put_uvarint(n) + body
            results.append((block, marshal_hints(seg, hints, rng)))
        return results

    def encode_batch_emit(self, blocks, level: int = 2):
        """Fully on-device batched encode: ONE dispatch emits every
        block's token streams (vs the per-block ``encode_emit`` calls the
        r4 writer paid a kernel launch each for)."""
        return self._emit_batch_arrays(blocks, level)

    def encode_batch_mesh(self, mesh, blocks, level: int = 2):
        """Data-parallel batched encode over a device mesh: blocks are
        sharded over the mesh axis, each device runs match-find -> parse ->
        verify -> emit on its shard, and per-block sizes are exchanged with
        an all-gather + exclusive scan (parallel/mesh.py) — the stream
        Writer's production multi-chip path.  Reference concurrency analog:
        writer.go:214-272."""
        return self._emit_batch_arrays(blocks, level, mesh=mesh)

    def encode_batch(self, blocks, level: int = 2):
        """Encode many blocks with one device dispatch.  Returns a list of
        (block, hint_payload) | None entries, aligned with the input."""
        seg = self._seg_for(max(len(b) for b in blocks))
        rng = self._chain.RANGE
        results = self._enc.encode_blocks_device(
            [bytes(b) for b in blocks], seg, rng, level
        )
        out = []
        for block, hints in results:
            if block is None:
                out.append(None)
            else:
                out.append((block, marshal_hints(seg, hints, rng)))
        return out

    @staticmethod
    def _chained_ok(seg_size: int, rng: int, decoded_len: int) -> bool:
        return bool(
            rng
            and rng % seg_size == 0
            and seg_size <= 8192
            and decoded_len <= (8 << 20)
        )

    # Per-dispatch VMEM ceiling for the chained executor's packed arena.
    CHAIN_DISPATCH_BYTES = 4 << 20

    def decode(self, body: bytes, hint_payload: bytes, decoded_len: int):
        seg_size, offs, rng = parse_hints(hint_payload)
        if seg_size % 128 or not 4096 <= seg_size <= (1 << 20):
            raise CorruptError(
                f"unsupported hint segment size {seg_size}"
            )
        segs = split_body(body, offs)
        import jax

        # Range-clamped streams (hints v2) take the chained executor: C
        # parallel op chains over range-aligned spans, packed int32 arena
        # (~2.2x block VMEM).  Blocks past the per-dispatch VMEM ceiling
        # split into range-aligned groups — ranges never reference each
        # other, so a spec-max 8 MiB block decodes as two independent
        # dispatches instead of falling back to the host.
        if self._chained_ok(seg_size, rng, decoded_len):
            if decoded_len <= self.CHAIN_DISPATCH_BYTES:
                return self._chain.decode_block_chained(
                    segs, decoded_len, seg_size, rng
                )
            spr = rng // seg_size
            group_segs = (self.CHAIN_DISPATCH_BYTES // rng) * spr
            out = []
            done = 0
            for i in range(0, len(segs), group_segs):
                part = segs[i : i + group_segs]
                want = min(len(part) * seg_size, decoded_len - done)
                out.append(
                    self._chain.decode_block_chained(
                        part, want, seg_size, rng
                    )
                )
                done += want
            return b"".join(out)
        # v1 hints (no range guarantee): sequential-op executor, ~1MiB cap
        # (int32 byte rows cost ~5x the block in VMEM).
        max_out = (1 << 20) if jax.default_backend() == "tpu" else (2 << 20)
        max_lanes = 512
        if len(segs) <= max_lanes and decoded_len <= max_out:
            return self._dec.decode_block_tpu(segs, decoded_len, seg_size)
        raise CorruptError("block exceeds device lane budget")

    # Per-dispatch budget for batched decode: the scheduled executor holds
    # [comp || out] in one packed VMEM arena (~2.2x the output bytes).
    BATCH_BYTES = 4 << 20
    BATCH_BLOCKS = 8

    def decode_batch(self, items):
        """Decode many blocks with as few device dispatches as possible.

        items: list of (body, hint_payload, decoded_len).  Blocks whose
        hints are range-clamped (v2) and share a segment geometry are
        decoded in batched dispatches via the scheduled chained executor
        (reference DecodeConcurrent, reader.go:575-668 — goroutine fan-out
        replaced by multi-block kernel batching); the rest fall back to
        single-block decode.  Returns a list of bytes, aligned with items.
        """
        out = [None] * len(items)
        groups = {}
        for i, (body, hint_payload, dlen) in enumerate(items):
            seg_size, offs, rng = parse_hints(hint_payload)
            if seg_size % 128 or not 4096 <= seg_size <= (1 << 20):
                raise CorruptError(
                    f"unsupported hint segment size {seg_size}"
                )
            if (
                self._chained_ok(seg_size, rng, dlen)
                and dlen <= self.CHAIN_DISPATCH_BYTES
            ):
                groups.setdefault((seg_size, rng), []).append(
                    (i, split_body(body, offs), dlen)
                )
            else:
                # Over-ceiling blocks go through decode()'s range-aligned
                # split; non-chained blocks use the v1 executor.
                out[i] = self.decode(body, hint_payload, dlen)
        for (seg_size, rng), entries in groups.items():
            # Split into dispatches bounded by the VMEM arena budget.
            batch = []
            size = 0
            for e in entries + [None]:
                if e is None or (
                    batch
                    and (
                        size + e[2] > self.BATCH_BYTES
                        or len(batch) >= self.BATCH_BLOCKS
                    )
                ):
                    res = self._chain.decode_blocks_chained(
                        [b[1] for b in batch], [b[2] for b in batch],
                        seg_size, rng,
                    )
                    for (i, _, _), r in zip(batch, res):
                        out[i] = r
                    batch = []
                    size = 0
                if e is not None:
                    batch.append(e)
                    size += e[2]
        return out


_codec = None


def get_device_codec():
    global _codec
    if _codec is None:
        _codec = DeviceCodec()
    return _codec
