#!/usr/bin/env python
"""ONE-SESSION measurement sweep: everything in a single TPU client process.

Round-4 finding (docs/perf_notes.md "Round 4"): the axon tunnel admits new
client sessions only in short windows (~minutes, roughly every ~40 min),
but an ESTABLISHED session keeps dispatching fine for 10+ minutes of heavy
kernel work. The per-item batch (one process per measurement) therefore
loses most windows to client-admission wedges. This script is the antidote:
once admitted, it runs the ENTIRE round-4 measurement queue inside one
process — headline bench, lightweight headroom A/Bs, every BASELINE config,
int8 site timings and schedules, and the quality/int8-dB eval — each
section in try/except with flushed output, ordered most-valuable-first.

Run (the launcher probes for a window first):  python -u scripts/tpu_mega.py
Skip sections:  NERVE_MEGA_SKIP=eval_parity,diag_rdb_int8 python -u ...
"""

from __future__ import annotations

import os as _os
import sys as _sys
import time as _time
import traceback as _tb

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import jax  # noqa: E402


def _section(name, fn):
    skip = _os.environ.get("NERVE_MEGA_SKIP", "").split(",")
    if name in skip:
        print(f"##### SKIP {name}", flush=True)
        return
    print(f"##### BEGIN {name} {_time.strftime('%H:%M:%S')}", flush=True)
    t0 = _time.time()
    try:
        fn()
        print(f"##### END {name} ok ({_time.time() - t0:.0f}s)", flush=True)
    except Exception:  # noqa: BLE001 — keep the session going
        _tb.print_exc()
        print(f"##### END {name} FAILED ({_time.time() - t0:.0f}s)", flush=True)


def main() -> None:
    assert jax.default_backend() == "tpu", "run on the chip"

    # 1. Headline (the driver-recorded metric's own measurement function).
    def headline():
        import json

        import bench

        print(json.dumps(bench.run_lightweight_bench()), flush=True)

    _section("headline", headline)

    # 2. Lightweight headroom A/Bs (layouts, batching, stages).
    def lightweight2():
        import diag_lightweight2

        _sys.argv = ["diag_lightweight2"]
        diag_lightweight2.main()

    _section("diag_lightweight2", lightweight2)

    # 3. Every BASELINE config (sr_full bf16/int8/int8full, engine, train,
    #    continual, federated, abr) — bench_suite's own functions.
    import bench_suite

    for cfg in ("sr_full", "sr_full_int8", "sr_full_int8full", "engine",
                "train", "continual", "federated", "abr"):
        _section(f"suite_{cfg}", bench_suite.ALL[cfg])

    # 4. int8 conv-chain site timings (bf16 vs int8 at serving shapes).
    def chain_int8():
        import diag_chain_int8

        _sys.argv = ["diag_chain_int8"]
        diag_chain_int8.main()

    _section("diag_chain_int8", chain_int8)

    # 5. int8 RDB schedules (dx-major / per-channel, never yet timed).
    def rdb_int8_variants():
        import diag_rdb_int8

        for args in (["--skip-bf16"],
                     ["--skip-bf16", "--dx-major"],
                     ["--skip-bf16", "--per-channel"],
                     ["--skip-bf16", "--per-channel", "--dx-major"]):
            print(f"--- diag_rdb_int8 {' '.join(args)}", flush=True)
            _sys.argv = ["diag_rdb_int8"] + args
            diag_rdb_int8.main()

    _section("diag_rdb_int8", rdb_int8_variants)

    # 6. Quality + int8 dB cost (trains 40 epochs on-chip; longest, last).
    def eval_parity():
        import eval_parity as ep

        ep.main(["--epochs", "40"])

    _section("eval_parity", eval_parity)

    print("##### MEGA DONE", flush=True)


if __name__ == "__main__":
    main()
