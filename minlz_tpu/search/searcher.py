"""BlockSearcher: pattern search over compressed streams with block skipping.

Parity surface: reference ``search_reader.go`` (chunk-driven state machine,
table decision, window enumeration per type, first-window boundary rule,
rolling decoded tail for straddling matches, stats).  Deferred-decode and
compressed tables are roadmap items.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .. import block as blockapi
from ..minlz import (
    CHUNK_TYPE_EOF,
    CHUNK_TYPE_MINLZ_COMPRESSED,
    CHUNK_TYPE_MINLZ_COMPRESSED_CRC,
    CHUNK_TYPE_SEARCH_INFO,
    CHUNK_TYPE_SEARCH_TABLE,
    CHUNK_TYPE_STREAM_ID,
    CHUNK_TYPE_UNCOMPRESSED_DATA,
    CorruptError,
    read_uvarint,
)
from .table import (
    TYPE_BYTE_PREFIX,
    TYPE_LONG_PREFIX,
    TYPE_MASK_PREFIX,
    TYPE_NO_PREFIX,
    hash_value,
    parse_table_chunk,
)


@dataclass
class SearchResult:
    offset: int  # uncompressed stream offset of the match
    block_start: int  # uncompressed offset of the containing block


@dataclass
class SearchStats:
    blocks_total: int = 0
    blocks_skipped: int = 0
    blocks_decoded: int = 0
    blocks_no_table: int = 0
    tables_seen: int = 0
    table_bytes: int = 0
    matches: int = 0

    def fprint(self, f) -> None:
        f.write(
            f"blocks: {self.blocks_total} skipped: {self.blocks_skipped}"
            f" decoded: {self.blocks_decoded}"
            f" (no table: {self.blocks_no_table})\n"
            f"tables: {self.tables_seen} ({self.table_bytes} bytes)"
            f" matches: {self.matches}\n"
        )


class BlockSearcher:
    """Search a MinLZ stream for a byte pattern using 0x45 block tables.

    Guarantee: tables may produce false positives (extra decodes) but never
    false negatives — every real occurrence is reported.
    """

    def __init__(self, src, pattern: bytes, *, bail_no_table: bool = False):
        if not pattern:
            raise ValueError("empty search pattern")
        self._src = src
        self._pattern = bytes(pattern)
        self._bail = bail_no_table
        self.stats = SearchStats()
        self._pending_table = None
        self._uoff = 0  # uncompressed offset of next block
        self._tail = b""  # rolling decoded tail for boundary straddles
        self._force_next = False  # previous decoded tail may start a match

    # --- Table decision ----------------------------------------------------

    def _pattern_windows(self, cfg):
        """Hash windows of the pattern to check, per table type (Appendix A).

        Returns (windows, usable) where windows is a list of (index, is_first)
        and usable=False means the table cannot filter this pattern."""
        p = self._pattern
        m = cfg.match_len
        if len(p) < m:
            return [], False
        wins = []
        if cfg.table_type == TYPE_NO_PREFIX:
            for i in range(len(p) - m + 1):
                wins.append((i, i == 0))
            return wins, True
        if cfg.table_type in (TYPE_BYTE_PREFIX, TYPE_MASK_PREFIX):
            pset = (
                set(cfg.prefixes)
                if cfg.table_type == TYPE_BYTE_PREFIX
                else cfg.prefix_mask
            )
            for i in range(1, len(p) - m + 1):
                if p[i - 1] in pset:
                    wins.append((i, False))
            return wins, bool(wins)
        # Long prefix: find prefix occurrences inside the pattern.
        pl = cfg.prefixes
        start = 0
        while True:
            j = p.find(pl, start)
            if j < 0:
                break
            base = j + len(pl)
            for k in range(cfg.extra_matches + 1):
                if base + k + m <= len(p):
                    wins.append((base + k, False))
            start = j + 1
        return wins, bool(wins)

    def _may_contain(self, table_info) -> bool:
        cfg, bits, reductions, table = table_info
        wins, usable = self._pattern_windows(cfg)
        if not usable:
            return True  # cannot filter; must decode
        mask = (1 << (bits - reductions)) - 1
        p = self._pattern
        m = cfg.match_len
        for i, is_first in wins:
            val = int.from_bytes(p[i : i + m], "little")
            h = hash_value(val, bits, m) & mask
            present = table[h >> 3] & (1 << (h & 7))
            if not present:
                if is_first:
                    return False
                # Later window absent: the pattern cannot occur entirely in
                # this block, but could straddle into the next (B.2.1): only
                # skippable when the FIRST window is also absent.
                val0 = int.from_bytes(p[0:m], "little")
                h0 = hash_value(val0, bits, m) & mask
                if not table[h0 >> 3] & (1 << (h0 & 7)):
                    return False
                return True
        return True

    # --- Stream walk -------------------------------------------------------

    def search(self, callback=None):
        """Scan the stream; returns list of SearchResult (also passed to
        ``callback`` as they are found; callback returning False stops)."""
        results = []
        read = self._src.read
        while True:
            hdr = read(4)
            if len(hdr) < 4:
                break
            ctype = hdr[0]
            clen = int.from_bytes(hdr[1:4], "little")
            payload = read(clen)
            if len(payload) < clen:
                raise CorruptError("truncated stream during search")

            if ctype == CHUNK_TYPE_STREAM_ID:
                self._pending_table = None
                self._tail = b""
                self._uoff = 0
            elif ctype == CHUNK_TYPE_SEARCH_INFO:
                self.stats.tables_seen += 0  # informational only
            elif ctype == CHUNK_TYPE_SEARCH_TABLE:
                self._pending_table = parse_table_chunk(payload)
                self.stats.tables_seen += 1
                self.stats.table_bytes += len(payload)
            elif ctype in (
                CHUNK_TYPE_MINLZ_COMPRESSED,
                CHUNK_TYPE_MINLZ_COMPRESSED_CRC,
                CHUNK_TYPE_UNCOMPRESSED_DATA,
            ):
                stop = self._handle_block(ctype, payload, results, callback)
                if stop:
                    return results
            elif ctype == CHUNK_TYPE_EOF:
                pass
            # Other chunks (index, hints, padding, user) are skipped.
        return results

    def _handle_block(self, ctype, payload, results, callback) -> bool:
        table_info = self._pending_table
        self._pending_table = None
        self.stats.blocks_total += 1

        if ctype == CHUNK_TYPE_UNCOMPRESSED_DATA:
            dlen = len(payload) - 4
        else:
            body = payload[4:]
            dlen, _ = read_uvarint(body, 0)
            if dlen == 0:
                dlen = len(body) - 1  # literal-only approximation

        if table_info is None:
            self.stats.blocks_no_table += 1
            if self._bail:
                raise CorruptError("block without search table (bail)")
            maybe = True
        else:
            maybe = self._may_contain(table_info)
        if self._force_next:
            # The previous decoded block ends with a potential pattern start;
            # this block must be decoded to resolve the straddle
            # (reference: ErrSearchForward protocol, search_reader.go:1034).
            maybe = True

        if not maybe:
            self.stats.blocks_skipped += 1
            # Check the straddle region: tail + first bytes cannot be checked
            # without decoding IF the tail suffix could start a match and the
            # first window was present.  _may_contain already enforces the
            # first-window rule, so a skip here is safe; just advance.
            self._tail = b""
            self._uoff += dlen
            return False

        # Decode and scan.
        self.stats.blocks_decoded += 1
        if ctype == CHUNK_TYPE_UNCOMPRESSED_DATA:
            data = payload[4:]
        else:
            data = blockapi.decode(b"\x00" + payload[4:])
        hay = self._tail + data
        base = self._uoff - len(self._tail)
        start = 0
        while True:
            j = hay.find(self._pattern, start)
            if j < 0:
                break
            r = SearchResult(offset=base + j, block_start=self._uoff)
            results.append(r)
            self.stats.matches += 1
            if callback is not None and callback(r) is False:
                return True
            start = j + 1
        keep = len(self._pattern) - 1
        self._tail = hay[len(hay) - keep :] if keep else b""
        # Straddle guard: if the tail ends with a proper pattern prefix, the
        # next block is decoded unconditionally.
        self._force_next = any(
            self._tail.endswith(self._pattern[:k])
            for k in range(1, min(keep, len(self._pattern) - 1) + 1)
        )
        self._uoff += len(data)
        return False
