"""Snappy fallback decoding.

MinLZ blocks whose first byte is non-zero may be Snappy-compressed data
(SPEC.md §1.0: "decoders may implement fallback to Snappy"), and streams may
carry the sNaPpY identifier.  This module implements the classic Snappy block
format (tag bits 00 literal / 01 copy1 / 10 copy2 / 11 copy4) so our block
and stream readers can transparently decode Snappy-era archives the way the
reference falls back to the s2 package (decode.go:59-68).

S2-extended streams (S2sTwO magic) are detected but not yet decoded.
"""

from __future__ import annotations

from .minlz import CorruptError, read_uvarint


def snappy_decoded_len(src) -> int:
    n, _ = read_uvarint(src, 0)
    return n


def snappy_decode_block(src) -> bytes:
    """Decode a raw Snappy block (uvarint length + token stream)."""
    src = bytes(src)
    try:
        want, pos = read_uvarint(src, 0)
    except ValueError as e:
        raise CorruptError(f"snappy: {e}") from e
    out = bytearray()
    n = len(src)
    while pos < n:
        tag = src[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > n:
                    raise CorruptError("snappy: truncated literal length")
                ln = int.from_bytes(src[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > n:
                raise CorruptError("snappy: literal exceeds input")
            out += src[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy with 1-byte offset
            if pos >= n:
                raise CorruptError("snappy: truncated copy1")
            ln = ((tag >> 2) & 7) + 4
            off = ((tag >> 5) << 8) | src[pos]
            pos += 1
        elif kind == 2:  # copy with 2-byte offset
            if pos + 2 > n:
                raise CorruptError("snappy: truncated copy2")
            ln = (tag >> 2) + 1
            off = int.from_bytes(src[pos : pos + 2], "little")
            pos += 2
        else:  # copy with 4-byte offset
            if pos + 4 > n:
                raise CorruptError("snappy: truncated copy4")
            ln = (tag >> 2) + 1
            off = int.from_bytes(src[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise CorruptError("snappy: invalid copy offset")
        if len(out) + ln > want:
            raise CorruptError("snappy: output exceeds declared size")
        start = len(out) - off
        for i in range(ln):
            out.append(out[start + i])
    if len(out) != want:
        raise CorruptError(
            f"snappy: decoded {len(out)} bytes, expected {want}"
        )
    return bytes(out)


def snappy_encode_block(src) -> bytes:
    """Minimal Snappy encoder (literal-only + simple matches), used to
    produce fallback-path test vectors."""
    from .minlz import put_uvarint

    src = bytes(src)
    out = bytearray(put_uvarint(len(src)))
    i = 0
    n = len(src)
    table = {}
    anchor = 0

    def emit_lit(lits):
        m = len(lits)
        while m > 0:
            take = min(m, 65536)
            chunk = lits[:take]
            lits = lits[take:]
            if take <= 60:
                out.append((take - 1) << 2)
            elif take <= 256:
                out.append(60 << 2)
                out.append(take - 1)
            else:
                out.append(61 << 2)
                out.extend((take - 1).to_bytes(2, "little"))
            out.extend(chunk)
            m -= take

    while i + 4 <= n:
        key = src[i : i + 4]
        cand = table.get(key, -1)
        table[key] = i
        if cand >= 0 and i - cand <= 65535:
            ln = 4
            while i + ln < n and src[i + ln] == src[cand + ln]:
                ln += 1
            emit_lit(src[anchor:i])
            off = i - cand
            rem = ln
            while rem > 0:
                take = min(rem, 64)
                if rem - take in (1, 2, 3) and take == 64:
                    take = 60  # avoid sub-4 tail copies
                if take >= 4 and take <= 11 and off < 2048:
                    out.append(1 | ((take - 4) << 2) | ((off >> 8) << 5))
                    out.append(off & 0xFF)
                else:
                    out.append(2 | ((take - 1) << 2))
                    out.extend(off.to_bytes(2, "little"))
                rem -= take
            i += ln
            anchor = i
        else:
            i += 1
    emit_lit(src[anchor:])
    return bytes(out)
