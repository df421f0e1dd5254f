"""Sidecar search index streams (SPEC_SEARCH.md §1.1, §2.3).

A sidecar carries search tables for an existing stream WITHOUT the data:
stream header + 0x44 info + per-block [0x45 table + 0x47 remote block
reference] + EOF.  Searching walks the small sidecar; the main stream is
touched only for must-decode blocks via ``ReaderAt``-style access.

Parity surface: reference sidecar.go (BuildSidecar/ExtractSidecar) and
sidecar_search.go (SidecarSearcher).
"""

from __future__ import annotations

import io

from .. import block as blockapi
from ..minlz import (
    CHUNK_TYPE_EOF,
    CHUNK_TYPE_MINLZ_COMPRESSED,
    CHUNK_TYPE_MINLZ_COMPRESSED_CRC,
    CHUNK_TYPE_REMOTE_BLOCK_REF,
    CHUNK_TYPE_SEARCH_TABLE,
    CHUNK_TYPE_STREAM_ID,
    CHUNK_TYPE_UNCOMPRESSED_DATA,
    MAGIC_CHUNK,
    CorruptError,
    put_uvarint,
    read_uvarint,
)
from .build import build_table
from .searcher import BlockSearcher, SearchResult, SearchStats
from .table import SearchTableConfig, parse_table_chunk


def _remote_ref(block_offset: int, max_block: int, actual_uncomp: int) -> bytes:
    payload = put_uvarint(block_offset) + put_uvarint(
        max(max_block - actual_uncomp, 0)
    )
    return (
        bytes([CHUNK_TYPE_REMOTE_BLOCK_REF])
        + len(payload).to_bytes(3, "little")
        + payload
    )


def build_sidecar(src, cfg: SearchTableConfig) -> bytes:
    """Build a sidecar for an existing MinLZ stream: decode each block,
    build fresh search tables, and reference blocks remotely (reference
    BuildSidecar, sidecar.go:321)."""
    raw = src.read() if hasattr(src, "read") else bytes(src)
    out = bytearray()
    pos = 0
    max_block = 1 << 23
    wrote_header = False
    pending = []  # (chunk_offset, decoded_bytes)

    # First pass: collect blocks with offsets.
    blocks = []
    while pos + 4 <= len(raw):
        ctype = raw[pos]
        clen = int.from_bytes(raw[pos + 1 : pos + 4], "little")
        if ctype == CHUNK_TYPE_STREAM_ID:
            if not wrote_header:
                out += raw[pos : pos + 4 + clen]
                wrote_header = True
                max_block = 1 << ((raw[pos + 9] & 0x0F) + 10)
        elif ctype in (
            CHUNK_TYPE_MINLZ_COMPRESSED,
            CHUNK_TYPE_MINLZ_COMPRESSED_CRC,
            CHUNK_TYPE_UNCOMPRESSED_DATA,
        ):
            payload = raw[pos + 4 : pos + 4 + clen]
            if ctype == CHUNK_TYPE_UNCOMPRESSED_DATA:
                data = payload[4:]
            else:
                data = blockapi.decode(b"\x00" + payload[4:])
            blocks.append((pos, data))
        pos += 4 + clen
    if not wrote_header:
        raise CorruptError("no stream identifier in source stream")

    out += cfg.marshal_info(max_block)
    for i, (boff, data) in enumerate(blocks):
        overlap = blocks[i + 1][1][:16] if i + 1 < len(blocks) else b""
        res = build_table(data, cfg, overlap, max_block)
        if res is not None:
            table, reductions = res
            out += cfg.marshal_table(max_block, table, reductions)
        out += _remote_ref(boff, max_block, len(data))
    out += bytes([CHUNK_TYPE_EOF, 0, 0, 0])
    return bytes(out)


def extract_sidecar(src) -> bytes:
    """Extract existing 0x44/0x45/0x46 chunks from a stream into a sidecar
    with remote refs (reference ExtractSidecar, sidecar.go:557)."""
    raw = src.read() if hasattr(src, "read") else bytes(src)
    out = bytearray()
    pos = 0
    pending_tables = bytearray()
    while pos + 4 <= len(raw):
        ctype = raw[pos]
        clen = int.from_bytes(raw[pos + 1 : pos + 4], "little")
        chunk = raw[pos : pos + 4 + clen]
        if ctype == CHUNK_TYPE_STREAM_ID and not out:
            out += chunk
        elif ctype in (0x44, 0x45, 0x46):
            pending_tables += chunk
        elif ctype in (
            CHUNK_TYPE_MINLZ_COMPRESSED,
            CHUNK_TYPE_MINLZ_COMPRESSED_CRC,
            CHUNK_TYPE_UNCOMPRESSED_DATA,
        ):
            payload = raw[pos + 4 : pos + 4 + clen]
            if ctype == CHUNK_TYPE_UNCOMPRESSED_DATA:
                dlen = clen - 4
            else:
                dlen, _ = read_uvarint(payload, 4)
            out += pending_tables
            pending_tables = bytearray()
            out += _remote_ref(pos, 1 << 23, dlen)
        pos += 4 + clen
    out += bytes([CHUNK_TYPE_EOF, 0, 0, 0])
    return bytes(out)


class SidecarSearcher:
    """Search using a sidecar; fetch main-stream blocks only when needed
    (reference SidecarSearcher, sidecar_search.go)."""

    def __init__(self, sidecar, main_reader_at, pattern: bytes):
        self._sidecar = (
            sidecar.read() if hasattr(sidecar, "read") else bytes(sidecar)
        )
        self._main = main_reader_at  # object with .seek/.read
        self._pattern = bytes(pattern)
        self.stats = SearchStats()

    def _fetch_block(self, offset: int) -> bytes:
        self._main.seek(offset)
        hdr = self._main.read(4)
        ctype = hdr[0]
        clen = int.from_bytes(hdr[1:4], "little")
        payload = self._main.read(clen)
        if ctype == CHUNK_TYPE_UNCOMPRESSED_DATA:
            return payload[4:]
        return blockapi.decode(b"\x00" + payload[4:])

    def search(self, callback=None):
        # Reuse BlockSearcher's decision machinery with a shim that walks
        # the sidecar and pulls remote blocks lazily.
        results = []
        searcher = BlockSearcher(io.BytesIO(b""), self._pattern)
        pos = 0
        raw = self._sidecar
        pending_table = None
        uoff = 0
        max_block = 1 << 23
        tail = b""
        force_next = False
        while pos + 4 <= len(raw):
            ctype = raw[pos]
            clen = int.from_bytes(raw[pos + 1 : pos + 4], "little")
            payload = raw[pos + 4 : pos + 4 + clen]
            pos += 4 + clen
            if ctype == CHUNK_TYPE_STREAM_ID:
                if len(payload) >= 6 and payload[:5] == MAGIC_CHUNK[4:9]:
                    max_block = 1 << ((payload[5] & 0x0F) + 10)
            elif ctype == CHUNK_TYPE_SEARCH_TABLE:
                pending_table = parse_table_chunk(payload)
                self.stats.tables_seen += 1
                self.stats.table_bytes += len(payload)
            elif ctype == 0x46:
                from .compressed import parse_compressed_table_chunk

                pending_table = parse_compressed_table_chunk(payload)
                self.stats.tables_seen += 1
                self.stats.tables_compressed += 1
                self.stats.table_bytes += len(payload)
            elif ctype == CHUNK_TYPE_REMOTE_BLOCK_REF:
                boff, p2 = read_uvarint(payload, 0)
                max_minus_actual, p2 = read_uvarint(payload, p2)
                dlen = max_block - max_minus_actual
                self.stats.blocks_total += 1
                table_info = pending_table
                pending_table = None
                if table_info is None:
                    maybe = True
                    self.stats.blocks_no_table += 1
                else:
                    # The sidecar walker does not defer: boundary-only
                    # blocks are fetched (correct, just less lazy).
                    maybe = searcher._decide(table_info) != "skip"
                if force_next:
                    maybe = True
                if not maybe:
                    self.stats.blocks_skipped += 1
                    tail = b""
                    # The remote ref encodes maxBlock - actualSize, so the
                    # uncompressed offset stays exact across skips.
                    uoff += dlen
                    continue
                data = self._fetch_block(boff)
                self.stats.blocks_decoded += 1
                hay = tail + data
                base = uoff - len(tail)
                start = 0
                while True:
                    j = hay.find(self._pattern, start)
                    if j < 0:
                        break
                    r = SearchResult(offset=base + j, block_start=boff)
                    results.append(r)
                    self.stats.matches += 1
                    if callback is not None and callback(r) is False:
                        return results
                    start = j + 1
                keep = len(self._pattern) - 1
                tail = hay[len(hay) - keep :] if keep else b""
                force_next = any(
                    tail.endswith(self._pattern[:k])
                    for k in range(1, min(keep, len(self._pattern) - 1) + 1)
                )
                uoff += len(data)
        return results
