"""mz-compatible command line interface.

Parity surface with the reference CLI (cmd/mz): ``c`` (compress), ``d``
(decompress), ``cat``, ``tail``, ``stats``, plus ``bench``.  Search and
sidecar front-ends arrive with the search subsystem.

Usage:
  python -m minlz_tpu.cli c  [-1|-2|-3|-xfast] [-block] [-bs N] [-index]
                             [-pad N] [-device] [-o OUT] FILE...
  python -m minlz_tpu.cli d  [-offset N] [-tail N] [-limit N] [-o OUT] FILE...
  python -m minlz_tpu.cli cat FILE...
  python -m minlz_tpu.cli tail -n BYTES FILE
  python -m minlz_tpu.cli stats FILE...
  python -m minlz_tpu.cli bench [-n ITERS] FILE
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time

from . import block as blockapi
from . import minlz
from .stream import Index, Reader, ReadSeeker, Writer


def _out_path(path: str, suffix: str, explicit=None) -> str:
    if explicit:
        return explicit
    return path + suffix if suffix else path


def cmd_compress(args) -> int:
    level = (
        minlz.LEVEL_SUPER_FAST
        if args.xfast
        else minlz.LEVEL_SMALLEST
        if args.l3
        else minlz.LEVEL_BALANCED
        if args.l2
        else minlz.LEVEL_FASTEST
    )
    for path in args.files:
        with open(path, "rb") as f:
            data = f.read()
        t0 = time.time()
        if args.block:
            if len(data) > minlz.MAX_BLOCK_SIZE:
                print(f"{path}: exceeds 8MiB block limit", file=sys.stderr)
                return 1
            out = blockapi.encode(data, level)
            opath = _out_path(path, ".mzb", args.output)
        else:
            buf = io.BytesIO()
            with Writer(
                buf,
                level=level,
                block_size=args.bs,
                add_index=args.index,
                padding=args.pad,
                device=args.device,
            ) as w:
                w.encode_buffer(data)
            out = buf.getvalue()
            opath = _out_path(path, ".mz", args.output)
        dt = time.time() - t0
        with open(opath, "wb") as f:
            f.write(out)
        red = 100 - 100 * len(out) / max(len(data), 1)
        print(
            f"{path}: {len(data)} -> {len(out)} bytes ({red:.2f}% reduction,"
            f" {len(data) / max(dt, 1e-9) / 1e6:.0f} MB/s)"
        )
    return 0


def cmd_decompress(args, to_stdout=False) -> int:
    for path in args.files:
        with open(path, "rb") as f:
            raw = f.read()
        t0 = time.time()
        if path.endswith(".mzb") or (raw[:1] == b"\x00" and not raw.startswith(minlz.MAGIC_CHUNK)):
            data = blockapi.decode(raw)
        else:
            if args.offset or args.tail is not None:
                bio = io.BytesIO(raw)
                rs = ReadSeeker(bio)
                if args.tail is not None:
                    start = max(rs._index.total_uncompressed - args.tail, 0)
                else:
                    start = args.offset
                rs.seek(start)
                data = rs.read(args.limit if args.limit else -1)
            else:
                data = Reader(
                    io.BytesIO(raw), device=getattr(args, "device", False)
                ).readall()
                if args.limit:
                    data = data[: args.limit]
        dt = time.time() - t0
        if to_stdout:
            sys.stdout.buffer.write(data)
            continue
        opath = args.output or (
            path[:-3] if path.endswith(".mz") else
            path[:-4] if path.endswith(".mzb") else path + ".out"
        )
        with open(opath, "wb") as f:
            f.write(data)
        print(
            f"{path}: {len(raw)} -> {len(data)} bytes"
            f" ({len(data) / max(dt, 1e-9) / 1e6:.0f} MB/s)",
            file=sys.stderr,
        )
    return 0


def cmd_tail(args) -> int:
    path = args.files[0]
    with open(path, "rb") as f:
        rs = ReadSeeker(f)
        start = max(rs._index.total_uncompressed - args.n, 0)
        rs.seek(start)
        sys.stdout.buffer.write(rs.read(-1))
    return 0


def cmd_stats(args) -> int:
    for path in args.files:
        with open(path, "rb") as f:
            raw = f.read()
        stats = {
            "file": path,
            "size": len(raw),
            "chunks": {},
            "blocks": 0,
            "uncompressed": 0,
        }
        pos = 0
        while pos + 4 <= len(raw):
            ctype = raw[pos]
            clen = int.from_bytes(raw[pos + 1 : pos + 4], "little")
            name = {
                0x00: "legacy",
                0x01: "uncompressed",
                0x02: "minlz",
                0x03: "minlz-ccrc",
                0x20: "eof",
                0x40: "index",
                0x88: "parse-hint",
                0xFE: "padding",
                0xFF: "stream-id",
            }.get(ctype, f"0x{ctype:02x}")
            ent = stats["chunks"].setdefault(name, {"count": 0, "bytes": 0})
            ent["count"] += 1
            ent["bytes"] += clen + 4
            if ctype in (0x01, 0x02, 0x03):
                stats["blocks"] += 1
                if ctype == 0x01:
                    stats["uncompressed"] += clen - 4
                else:
                    try:
                        body = raw[pos + 8 : pos + 4 + clen]
                        v, _ = minlz.read_uvarint(body, 0)
                        stats["uncompressed"] += v
                    except ValueError:
                        pass
            pos += 4 + clen
        if stats["uncompressed"]:
            stats["ratio"] = round(len(raw) / stats["uncompressed"], 4)
        print(json.dumps(stats, indent=2))
    return 0


def cmd_search(args) -> int:
    from .search import BlockSearcher

    pattern = args.pattern.encode() if isinstance(args.pattern, str) else args.pattern
    rc = 1
    for path in args.files:
        with open(path, "rb") as f:
            s = BlockSearcher(f, pattern, bail_no_table=args.bail)
            n = [0]

            def cb(r):
                n[0] += 1
                if not args.quiet:
                    print(f"{path}:{r.offset}")
                if args.count and n[0] >= args.count:
                    return False
                return True

            s.search(cb)
            if n[0]:
                rc = 0
            if args.stats:
                s.stats.fprint(sys.stderr)
    return rc


def cmd_bench(args) -> int:
    path = args.files[0]
    with open(path, "rb") as f:
        data = f.read()
    best_enc = best_dec = 1e9
    out = None
    for _ in range(args.n):
        t0 = time.time()
        buf = io.BytesIO()
        with Writer(buf, add_index=False, device=args.device) as w:
            w.encode_buffer(data)
        best_enc = min(best_enc, time.time() - t0)
        out = buf.getvalue()
        t0 = time.time()
        dec = Reader(io.BytesIO(out), device=args.device).readall()
        best_dec = min(best_dec, time.time() - t0)
        if dec != data:
            print("VERIFY FAILED", file=sys.stderr)
            return 1
    print(
        f"{path}: {len(data)}B -> {len(out)}B"
        f" ({100 - 100 * len(out) / len(data):.2f}%)"
        f" enc {len(data) / best_enc / 1e6:.1f} MB/s"
        f" dec {len(data) / best_dec / 1e6:.1f} MB/s (verified)"
    )
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mz", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pc = sub.add_parser("c", help="compress")
    pc.add_argument("-xfast", action="store_true", help="level -1 SuperFast")
    pc.add_argument("-1", dest="l1", action="store_true", help="level 1")
    pc.add_argument("-2", dest="l2", action="store_true", help="level 2")
    pc.add_argument("-3", dest="l3", action="store_true", help="level 3")
    pc.add_argument("-block", action="store_true", help="single block (.mzb)")
    pc.add_argument("-bs", type=int, default=minlz.DEFAULT_BLOCK_SIZE)
    pc.add_argument("-index", action="store_true", default=True)
    pc.add_argument("-no-index", dest="index", action="store_false")
    pc.add_argument("-pad", type=int, default=0)
    pc.add_argument("-device", action="store_true", help="TPU encode path")
    pc.add_argument("-o", dest="output")
    pc.add_argument("files", nargs="+")
    pc.set_defaults(fn=cmd_compress)

    for name, stdout in (("d", False), ("cat", True)):
        pd = sub.add_parser(name, help="decompress" + (" to stdout" if stdout else ""))
        pd.add_argument("-offset", type=int, default=0)
        pd.add_argument("-tail", type=int, default=None)
        pd.add_argument("-limit", type=int, default=0)
        pd.add_argument("-device", action="store_true")
        pd.add_argument("-o", dest="output")
        pd.add_argument("files", nargs="+")
        pd.set_defaults(fn=lambda a, s=stdout: cmd_decompress(a, s))

    pt = sub.add_parser("tail", help="output last N uncompressed bytes")
    pt.add_argument("-n", type=int, required=True)
    pt.add_argument("files", nargs=1)
    pt.set_defaults(fn=cmd_tail)

    ps = sub.add_parser("stats", help="stream anatomy")
    ps.add_argument("files", nargs="+")
    ps.set_defaults(fn=cmd_stats)

    pq = sub.add_parser("s", help="search compressed stream")
    pq.add_argument("-q", dest="quiet", action="store_true")
    pq.add_argument("-c", dest="count", type=int, default=0,
                    help="stop after N matches")
    pq.add_argument("-bail", action="store_true",
                    help="error if stream has no search tables")
    pq.add_argument("-stats", action="store_true")
    pq.add_argument("pattern")
    pq.add_argument("files", nargs="+")
    pq.set_defaults(fn=cmd_search)

    pb = sub.add_parser("bench", help="compress/decompress benchmark")
    pb.add_argument("-n", type=int, default=3)
    pb.add_argument("-device", action="store_true")
    pb.add_argument("files", nargs=1)
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except BrokenPipeError:
        return 0


if __name__ == "__main__":
    sys.exit(main())
