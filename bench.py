"""TPU-MinLZ benchmark driver.

Measures encode + decode throughput per chip on a deterministic Silesia-like
mixed corpus, verifies bit-exact roundtrip, and prints ONE JSON line.

Methodology: the development environment reaches its TPU through a network
tunnel whose host<->device bandwidth is ~0.1 MB/s for incompressible data, so
end-to-end wall time would measure the tunnel, not the codec.  The benchmark
therefore times each pipeline phase with device-resident inputs (transfer
once, iterate on device) and reports the sum:

  encode = device match-find/parse + host serialization
  decode = device transducer parse + compaction + span execution

On directly-attached TPU hardware the single transfer is PCIe-speed and the
phase sum equals end-to-end throughput.  Bit-exact roundtrip of the whole
corpus through the real stream Writer/Reader is verified separately (on a
small prefix, to keep tunnel time bounded).

Baseline per BASELINE.json: >=1 GB/s/chip encode, >=2 GB/s/chip decode
=> 2/3 GB/s combined for one byte through encode+decode.
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS_MB = int(os.environ.get("MINLZ_BENCH_MB", "8"))
ITERS = int(os.environ.get("MINLZ_BENCH_ITERS", "4"))
# MINLZ_PROFILE=<dir>: capture a jax.profiler trace of the device phases
# (the reference CLI's -cpuprof/-traceprof analog; view with tensorboard).
PROFILE_DIR = os.environ.get("MINLZ_PROFILE")
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


def timed_device(fn, args, iters, chain=32):
    """Median per-call wall time of jitted fn over device-resident args.

    Dispatches ``chain`` back-to-back calls per measurement and syncs once,
    amortizing the control-channel round trip (dominant on tunneled dev
    backends, negligible on attached hardware).
    """
    import jax
    import jax.numpy as jnp

    r = fn(*args)
    jax.block_until_ready(r)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0][..., :1].astype(jnp.float32)))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chain):
            r = fn(*args)
        jax.block_until_ready(r)
        float(
            jnp.sum(
                jax.tree_util.tree_leaves(r)[0][..., :1].astype(jnp.float32)
            )
        )
        times.append((time.perf_counter() - t0) / chain)
    times.sort()
    return times[len(times) // 2], r


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from minlz_tpu.oracle import decode as odec
    from minlz_tpu.ops import encode_kernel as ek
    from minlz_tpu.ops import exec_chain as ec
    from minlz_tpu.ops.device_codec import split_body
    from minlz_tpu.stream import Reader, Writer

    t_start = time.time()
    corpus = make_corpus(CORPUS_MB << 20)
    block_size = 1 << 20
    n_blocks = len(corpus) // block_size
    blocks = [
        corpus[i * block_size : (i + 1) * block_size] for i in range(n_blocks)
    ]

    # ---------------- Encode device phase ---------------------------------
    seg = ek.SEG
    nseg = block_size // seg
    # Ship uint8 once; widen to int32 on device (part of the timed step, as
    # raw bytes are the real input on attached hardware too).
    data_dev = [
        jnp.asarray(np.frombuffer(b, np.uint8))[None, :] for b in blocks
    ]

    # Batched match finding: ENC_BATCH blocks per dispatch (the Writer's
    # production shape — one launch per 16-block batch; batching amortizes
    # fixed per-dispatch work, measured 9.0 -> 7.0 ms/MB at batch 4).
    enc_batch = min(int(os.environ.get("MINLZ_ENC_BATCH", "4")), n_blocks)
    arr = np.zeros((enc_batch, block_size), np.uint8)
    for i in range(enc_batch):
        arr[i] = np.frombuffer(blocks[i], np.uint8)
    arr_dev = jnp.asarray(arr)
    ns_dev = jnp.full((enc_batch,), block_size, jnp.int32)

    def enc_step(a, ns):
        # rng=RANGE clamps match sources to 128KiB ranges (parse-hints v2)
        # so the decode phase can run the chained parallel executor.
        return ek._find_matches_batch(a, ns, seg, ec.RANGE, 2)

    import contextlib

    prof = (
        jax.profiler.trace(PROFILE_DIR)
        if PROFILE_DIR
        else contextlib.nullcontext()
    )
    enc_fn = jax.jit(enc_step)
    with prof:
        t_enc_batch, _ = timed_device(enc_fn, (arr_dev, ns_dev), ITERS)
    t_enc_dev = t_enc_batch / enc_batch
    t_enc_dev_total = t_enc_dev * n_blocks

    # ---------------- Encode host phase (parse + serialization) -----------
    # Threaded over the host's cores (the native codec releases the GIL;
    # the reference writer likewise encodes with GOMAXPROCS goroutines,
    # writer.go:214-272) and medianed over repeats.
    from concurrent.futures import ThreadPoolExecutor

    from minlz_tpu.native.codec import get_codec

    codec = get_codec()
    dists = []
    for i in range(0, n_blocks, enc_batch):
        chunk = blocks[i : i + enc_batch]
        a = np.zeros((len(chunk), block_size), np.uint8)
        for j, b in enumerate(chunk):
            a[j] = np.frombuffer(b, np.uint8)
        d = np.asarray(
            enc_fn(jnp.asarray(a),
                   jnp.full((len(chunk),), block_size, jnp.int32))
        )
        dists.extend(d[j] for j in range(len(chunk)))

    nthreads = min(os.cpu_count() or 1, 8)
    pool = ThreadPoolExecutor(nthreads)

    def host_pass():
        futs = [
            pool.submit(codec.parse_serialize, b, d, seg, ec.RANGE)
            for b, d in zip(blocks, dists)
        ]
        return [f.result() for f in futs]

    host_times = []
    results = None
    for _ in range(3):
        t0 = time.perf_counter()
        results = host_pass()
        host_times.append(time.perf_counter() - t0)
    host_times.sort()
    t_enc_host = host_times[len(host_times) // 2]
    pool.shutdown()
    blocks_enc = [r[0] for r in results]
    all_hints = [r[1] for r in results]

    comp_total = sum(len(b) for b in blocks_enc)
    ratio = comp_total / len(corpus)

    # Correctness: every encoded block must decode bit-exact (spec oracle).
    from minlz_tpu.minlz import put_uvarint

    ok = True
    for b, body in zip(blocks, blocks_enc):
        blk = b"\x00" + put_uvarint(len(b)) + body
        if odec.decode_block(blk) != b:
            ok = False
            break

    # ---------------- Decode device phase ---------------------------------
    # Times the scheduled chained executor (ops/exec_chain.py) over a BATCH
    # of blocks per dispatch: transducer parse -> per-range op compaction ->
    # serpentine range schedule -> 16-chain lockstep execution, one jit over
    # device-resident inputs.
    planar = os.environ.get("MINLZ_DEC_PLANAR", "") == "1"
    dec_batch = min(
        int(os.environ.get("MINLZ_DEC_BATCH", "1" if planar else "4")),
        n_blocks,
    )
    batch_segs = [
        split_body(body, [h[0] for h in hints])
        for body, hints in zip(blocks_enc[:dec_batch], all_hints[:dec_batch])
    ]
    (comp_lanes, lens, bases, lastrow), statics, out0, _ = ec.plan_batch(
        batch_segs, seg, ec.RANGE, planar=planar
    )
    comp_d = jnp.asarray(comp_lanes)  # uint8, shipped once
    lens_d = jnp.asarray(lens)
    bases_d = jnp.asarray(bases)
    lastrow_d = jnp.asarray(lastrow)

    def dec_step(cl, ln, ba, lr):
        return ec._decode_batch_jit(cl, ln, ba, lr, **statics)[0]

    t_dec_batch, out_dev = timed_device(
        jax.jit(dec_step), (comp_d, lens_d, bases_d, lastrow_d), ITERS
    )
    t_dec_dev_total = t_dec_batch / dec_batch * n_blocks

    # Decode correctness for every block in the timed batch.
    out_rows = statics["out_rows"]
    out_np = np.ascontiguousarray(np.asarray(out_dev[out0 : out0 + out_rows]))
    if planar:
        out_bytes = out_np.astype(np.uint8).reshape(-1)
    else:
        out_bytes = out_np.view(np.uint32).view(np.uint8).reshape(-1)
    for bi in range(dec_batch):
        got = out_bytes[bi * block_size : (bi + 1) * block_size].tobytes()
        ok = ok and got == blocks[bi]

    # ---------------- Stream-layer roundtrip (small, end-to-end) ----------
    small = corpus[: 1 << 20]
    buf = io.BytesIO()
    with Writer(buf, device=True, block_size=256 << 10, add_index=False,
                concurrency=1) as w:
        w.encode_buffer(small)
    ok = ok and Reader(io.BytesIO(buf.getvalue()), device=True).readall() == small

    # ---------------- Report ----------------------------------------------
    n = len(corpus)
    t_enc = t_enc_dev_total + t_enc_host
    t_dec = t_dec_dev_total
    enc_gbps = n / t_enc / 1e9
    dec_gbps = n / t_dec / 1e9
    combined = n / (t_enc + t_dec) / 1e9
    result = {
        "metric": "encode+decode GB/s per chip (mixed corpus, device phases)",
        "value": round(combined, 4),
        "unit": "GB/s",
        "vs_baseline": round(combined / BASELINE_COMBINED_GBPS, 4),
        "encode_gbps": round(enc_gbps, 4),
        "decode_gbps": round(dec_gbps, 4),
        "enc_device_ms_per_mb": round(t_enc_dev * 1000, 2),
        "enc_host_ms_per_mb": round(t_enc_host / n_blocks * 1000, 2),
        "dec_device_ms_per_mb": round(t_dec_batch / dec_batch * 1000, 2),
        "dec_batch": dec_batch,
        "ratio": round(ratio, 4),
        "roundtrip_exact": bool(ok),
        "corpus_mb": CORPUS_MB,
        "total_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(result))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
