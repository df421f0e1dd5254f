"""TPU-MinLZ benchmark driver.

Measures device-path encode + decode throughput per chip on a deterministic
Silesia-like mixed corpus, verifies bit-exact roundtrip, and prints ONE JSON
line.  Baseline per BASELINE.json: >=1 GB/s/chip encode and >=2 GB/s/chip
decode => 2/3 GB/s for one byte through encode+decode.
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS_MB = int(os.environ.get("MINLZ_BENCH_MB", "32"))
BASELINE_COMBINED_GBPS = 1.0 / (1.0 / 1.0 + 1.0 / 2.0)  # 0.667


def make_corpus(total_bytes: int) -> bytes:
    """Deterministic mixed corpus (text/json-ish/csv-ish/binary/random),
    roughly Silesia-like in compressibility."""
    import numpy as np

    rng = np.random.default_rng(1234)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "testdata/Mark.Twain-Tom.Sawyer.txt"), "rb") as f:
        twain = f.read()

    parts = []
    size = 0
    i = 0
    words = [w for w in twain.split() if w][:4000]
    while size < total_bytes:
        kind = i % 5
        if kind == 0:  # text with mutations (no trivial global period)
            t = bytearray(twain)
            for _ in range(len(t) // 200):
                t[int(rng.integers(0, len(t)))] = int(rng.integers(32, 127))
            parts.append(bytes(t))
        elif kind == 1:  # json-ish log records
            recs = []
            for k in range(2000):
                recs.append(
                    b'{"ts":%d,"user":"u%d","op":"%s","n":%d}\n'
                    % (
                        1700000000 + i * 1000 + k,
                        int(rng.integers(0, 500)),
                        words[int(rng.integers(0, len(words)))][:12],
                        int(rng.integers(0, 10000)),
                    )
                )
            parts.append(b"".join(recs))
        elif kind == 2:  # csv-ish
            rows = []
            for k in range(3000):
                rows.append(
                    b"%d,%0.2f,%s,%d\n"
                    % (
                        k,
                        float(rng.random() * 100),
                        words[int(rng.integers(0, len(words)))][:10],
                        int(rng.integers(0, 2)),
                    )
                )
            parts.append(b"".join(rows))
        elif kind == 3:  # structured binary (sorted ints, small deltas)
            base = rng.integers(0, 1 << 20, 40000).astype(np.uint32)
            base.sort()
            parts.append(base.tobytes())
        else:  # incompressible
            parts.append(rng.integers(0, 256, 65536, dtype=np.uint8).tobytes())
        size += len(parts[-1])
        i += 1
    return b"".join(parts)[:total_bytes]


def main():
    t_setup = time.time()
    corpus = make_corpus(CORPUS_MB << 20)

    from minlz_tpu.stream import Reader, Writer

    block_size = 1 << 20  # device lane budget: 256 segments x 4KiB

    # --- Warmup (compile all kernels on a small prefix) --------------------
    warm = io.BytesIO()
    with Writer(warm, device=True, block_size=block_size, add_index=False,
                concurrency=1) as w:
        w.encode_buffer(corpus[: 2 * block_size])
    Reader(io.BytesIO(warm.getvalue()), device=True).readall()

    # --- Encode ------------------------------------------------------------
    buf = io.BytesIO()
    t0 = time.time()
    with Writer(buf, device=True, block_size=block_size, add_index=False,
                concurrency=1) as w:
        w.encode_buffer(corpus)
    t_enc = time.time() - t0
    enc = buf.getvalue()

    # --- Decode ------------------------------------------------------------
    t0 = time.time()
    out = Reader(io.BytesIO(enc), device=True).readall()
    t_dec = time.time() - t0

    ok = out == corpus
    n = len(corpus)
    enc_gbps = n / t_enc / 1e9
    dec_gbps = n / t_dec / 1e9
    combined = n / (t_enc + t_dec) / 1e9
    ratio = len(enc) / n

    result = {
        "metric": "encode+decode GB/s per chip (mixed corpus, L1 device path)",
        "value": round(combined, 4),
        "unit": "GB/s",
        "vs_baseline": round(combined / BASELINE_COMBINED_GBPS, 4),
        "encode_gbps": round(enc_gbps, 4),
        "decode_gbps": round(dec_gbps, 4),
        "ratio": round(ratio, 4),
        "roundtrip_exact": ok,
        "corpus_mb": CORPUS_MB,
        "setup_s": round(t_setup and time.time() - t_setup, 1),
    }
    print(json.dumps(result))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
