#!/usr/bin/env python
"""The ONE tunnel-health probe used by every TPU orchestration script.

Asserts, in a single process: the backend is the real TPU, an XLA matmul
completes, a Mosaic-compiled Pallas kernel dispatches, and (with --delay N)
a second matmul still completes N seconds later — the delayed dispatch
catches the flap mode where a fresh client runs one program and then wedges
(observed round 4). Exits 0 healthy, non-zero (or hangs — callers wrap in
`timeout`) otherwise.

Previously copy-pasted into tpu_watch.sh / tpu_mega_watch.sh /
tpu_batch_r4.sh with drifting details (round-4 advisor finding); callers
now run `timeout <T> python scripts/tpu_probe.py [--delay 20]`.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--delay", type=float, default=0.0,
                   help="seconds to sleep before a second dispatch (0 = skip)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()
    x = jnp.ones((256, 256))
    assert float((x @ x).sum()) == 256.0 ** 3

    from jax.experimental import pallas as pl

    def k(a, o):
        o[...] = a[...] * 2.0

    y = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(jnp.ones((8, 128), jnp.float32))
    assert float(y.sum()) == 2048.0

    if args.delay > 0:
        time.sleep(args.delay)
        z = jnp.ones((512, 512))
        assert float((z @ z).sum()) == 512.0 ** 3
    print("probe ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
