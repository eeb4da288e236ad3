#!/usr/bin/env python
"""Height-s2d RDB kernel experiment.

Runs the dense chain in height-space-to-depth form: the (2·TH2, TW, C) tile
is folded to (TH2, TW, 2C) inside the kernel (outer-dim strided reads — no
XLA layout ops), each dense layer becomes three per-u matmuls

  u= 0: (M2, 8+2K)·(·, 3·64)   — both row phases, 3 dx taps
  u=-1: (M2, 8+2K)·(·, 3·32)   — qy=1 inputs → py=0 outputs (zero rows for qy=0)
  u=+1: (M2, 8+2K)·(·, 3·32)   — qy=0 inputs → py=1 outputs

followed by dx-shifted adds at HALF the row count of the full-res kernel.
Timed against the production kernel and checked against the XLA RDB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerve_tpu.ops.rdb import GROWTH, HALO, NUM_LAYERS, _rdb_xla
from nerve_tpu.utils.profiling import measure_dispatch_overhead, timed_scan

BIAS = 8
KPAD2 = 512  # 8 + 2*(64 + 5*32) = 456 → padded


def _k2(i, features):
    return BIAS + 2 * (features + GROWTH * i)


def _pack_s2d(params, features):
    """Per layer: (K2_i, 9·64) for u=0 and (K2_i, 9·32) for u=±1, + lff.

    Scratch slot layout: [0:8) ones; feats qy-major: [8 : 8+C) = qy0,
    [8+C : 8+2C) = qy1; growth slot i: 64 wide, py-major.
    Column layout u=0: (dx, py, o) → col dx·64 + py·32 + o.
    Column layout u=±1: (dx, o) → col dx·32 + o (u=-1 emits py=0, u=+1 py=1).
    """
    packed = []
    c = features
    for i in range(NUM_LAYERS):
        w, b = params[2 * i], params[2 * i + 1]
        k_in = w.shape[2]  # features + 32*i
        k2 = _k2(i, features)
        w0 = jnp.zeros((k2, 9 * 2 * GROWTH), w.dtype)
        wm = jnp.zeros((k2, 9 * GROWTH), w.dtype)
        wp = jnp.zeros((k2, 9 * GROWTH), w.dtype)

        def krow(qy, ch):
            # channel ch of phase qy in the dense concat: input feats first
            # (c channels), then growth slots (32 each) — all qy-major within
            # their own slot group.
            if ch < c:
                return BIAS + qy * c + ch
            g = ch - c
            slot = g // GROWTH
            off = g % GROWTH
            base = BIAS + 2 * c + slot * 2 * GROWTH
            return base + qy * GROWTH + off

        for dy in range(3):   # original tap dy-1 ∈ {-1,0,1}
            for dx in range(3):
                for py in range(2):
                    tot = py + (dy - 1)       # py + dy
                    qy = tot % 2
                    uy = (tot - qy) // 2      # ∈ {-1, 0, 1}
                    rows = [krow(qy, ch) for ch in range(k_in)]
                    vals = w[dy, dx, :, :]    # (k_in, 32)
                    if uy == 0:
                        col0 = dx * 2 * GROWTH + py * GROWTH
                        w0 = w0.at[jnp.asarray(rows), col0 : col0 + GROWTH].add(vals)
                    elif uy == -1:
                        assert py == 0
                        col0 = dx * GROWTH
                        wm = wm.at[jnp.asarray(rows), col0 : col0 + GROWTH].add(vals)
                    else:
                        assert py == 1
                        col0 = dx * GROWTH
                        wp = wp.at[jnp.asarray(rows), col0 : col0 + GROWTH].add(vals)
        # biases once per output: u=0, dx=1 (center) blocks, ones row 0.
        for py in range(2):
            col0 = 1 * 2 * GROWTH + py * GROWTH
            w0 = w0.at[0, col0 : col0 + GROWTH].add(b)
        packed += [w0, wm, wp]

    lw, lb = params[10], params[11]  # (K5, C), (C,)
    kl = _k2(NUM_LAYERS, features)
    k5 = lw.shape[0]
    lff = jnp.zeros((kl, 2 * c), lw.dtype)
    # build lff rows via krow of the final concat width
    def krow5(qy, ch):
        if ch < c:
            return BIAS + qy * c + ch
        g = ch - c
        slot = g // GROWTH
        off = g % GROWTH
        return BIAS + 2 * c + slot * 2 * GROWTH + qy * GROWTH + off

    for qy in range(2):
        rows = jnp.asarray([krow5(qy, ch) for ch in range(k5)])
        lff = lff.at[rows, qy * c : (qy + 1) * c].add(lw)
        lff = lff.at[0, qy * c : (qy + 1) * c].add(lb)
    packed.append(lff)
    return [p.astype(params[0].dtype) for p in packed]


def make_kernel(th2, tw, features, img_h2, img_w, nh_static, nw_static):
    c = features

    def kernel(b00, b01, b10, b11, *rest):
        w_refs = rest[: 3 * NUM_LAYERS + 1]
        out_ref = rest[3 * NUM_LAYERS + 1]
        scratch = rest[3 * NUM_LAYERS + 2]

        hh, ww = th2 + 2 * HALO, tw + 2 * HALO
        ph = hh + 2
        pw = ww + 2 + ((-(ww + 2)) % 8)
        m = ph * pw

        step0 = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                 & (pl.program_id(2) == 0))

        @pl.when(step0)
        def _init():
            scratch[...] = jnp.zeros((ph, pw, KPAD2), scratch.dtype)

        scratch[:, :, 0:1] = jnp.ones((ph, pw, 1), scratch.dtype)

        hi, wi = pl.program_id(1), pl.program_id(2)

        def zero_strips():
            @pl.when(hi == 0)
            def _t():
                scratch[1:1 + HALO, :, :] = jnp.zeros((HALO, pw, KPAD2), scratch.dtype)

            @pl.when(wi == 0)
            def _l():
                scratch[:, 1:1 + HALO, :] = jnp.zeros((ph, HALO, KPAD2), scratch.dtype)

            for gi in range(max(nh_static - 2, 0), nh_static):
                off = img_h2 + HALO - gi * th2
                if off < hh:
                    @pl.when(hi == gi)
                    def _b(off=off):
                        scratch[1 + off:1 + hh, :, :] = jnp.zeros(
                            (hh - off, pw, KPAD2), scratch.dtype)
            for gj in range(max(nw_static - 2, 0), nw_static):
                off = img_w + HALO - gj * tw
                if off < ww:
                    @pl.when(wi == gj)
                    def _r(off=off):
                        scratch[:, 1 + off:1 + ww, :] = jnp.zeros(
                            (ph, ww - off, KPAD2), scratch.dtype)

        # s2d assembly: quad blocks are (1, 2·th2, tw, C) in ORIGINAL layout;
        # even rows → qy0 slots, odd rows → qy1 (outer-dim strides).
        def put(blk, r0, r1, c0, c1):
            # Outer-dim split instead of stride-2 slicing (Mosaic lowers
            # strided outer slices to >2-D gathers, which it rejects).
            n2, twb, cb = blk.shape
            folded = blk.reshape(n2 // 2, 2, twb, cb)
            scratch[1 + r0 : 1 + r1, 1 + c0 : 1 + c1, BIAS : BIAS + c] = folded[:, 0]
            scratch[1 + r0 : 1 + r1, 1 + c0 : 1 + c1, BIAS + c : BIAS + 2 * c] = folded[:, 1]

        put(b00[0], 0, th2, 0, tw)
        put(b01[0, :, : ww - tw], 0, th2, tw, ww)
        put(b10[0, : 2 * (hh - th2)], th2, hh, 0, tw)
        put(b11[0, : 2 * (hh - th2), : ww - tw], th2, hh, tw, ww)
        zero_strips()

        def matmul(w_ref, k, n0, n1):
            x = scratch[:, :, :k].reshape(m, k)
            y = lax.dot_general(x, w_ref[:, n0:n1],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return y.reshape(ph, pw, n1 - n0)

        for i in range(NUM_LAYERS):
            w0_ref = w_refs[3 * i]
            wm_ref = w_refs[3 * i + 1]
            wp_ref = w_refs[3 * i + 2]
            k2 = _k2(i, features)
            # out(Y) += W_u · in(Y+u): acc row i reads y[i + 1 + u].
            acc0 = jnp.zeros((hh, ww, GROWTH), jnp.float32)  # py=0
            acc1 = jnp.zeros((hh, ww, GROWTH), jnp.float32)  # py=1
            # u=0: both phases, 3 dx chunks of 64.
            for dx in range(3):
                y = matmul(w0_ref, k2, dx * 2 * GROWTH, (dx + 1) * 2 * GROWTH)
                y = y.astype(scratch.dtype)
                acc0 = acc0 + y[1 : 1 + hh, dx : dx + ww, :GROWTH].astype(jnp.float32)
                acc1 = acc1 + y[1 : 1 + hh, dx : dx + ww, GROWTH:].astype(jnp.float32)
            # u=-1 → py=0 outputs (qy=1 inputs one s2d row up).
            for dx in range(3):
                y = matmul(wm_ref, k2, dx * GROWTH, (dx + 1) * GROWTH)
                y = y.astype(scratch.dtype)
                acc0 = acc0 + y[0:hh, dx : dx + ww, :].astype(jnp.float32)
            # u=+1 → py=1 outputs.
            for dx in range(3):
                y = matmul(wp_ref, k2, dx * GROWTH, (dx + 1) * GROWTH)
                y = y.astype(scratch.dtype)
                acc1 = acc1 + y[2 : 2 + hh, dx : dx + ww, :].astype(jnp.float32)
            f = jnp.maximum(jnp.concatenate([acc0, acc1], axis=-1), 0.0)
            base = BIAS + 2 * c + i * 2 * GROWTH
            scratch[1 : 1 + hh, 1 : 1 + ww, base : base + 2 * GROWTH] = f.astype(
                scratch.dtype)
            zero_strips()

        lff_ref = w_refs[3 * NUM_LAYERS]
        kl = _k2(NUM_LAYERS, features)
        lff = matmul(lff_ref, kl, 0, 2 * c)
        x0 = scratch[1 : 1 + hh, 1 : 1 + ww, BIAS : BIAS + c].astype(jnp.float32)
        x1 = scratch[1 : 1 + hh, 1 : 1 + ww, BIAS + c : BIAS + 2 * c].astype(jnp.float32)
        o0 = lff[1 : 1 + hh, 1 : 1 + ww, :c] * 0.2 + x0
        o1 = lff[1 : 1 + hh, 1 : 1 + ww, c:] * 0.2 + x1
        # d2s back to original rows: outer-axis interleave via stack+reshape.
        c0_ = o0[HALO : HALO + th2, HALO : HALO + tw]
        c1_ = o1[HALO : HALO + th2, HALO : HALO + tw]
        inter = jnp.stack([c0_, c1_], axis=1).reshape(2 * th2, tw, c)
        out_ref[0] = inter.astype(out_ref.dtype)

    return kernel


def rdb_s2d(x, params, th2=16, tw=240):
    b, h, w, c = x.shape
    assert h % 2 == 0
    h2 = h // 2
    tw = tw - tw % 8
    nh = -(-h2 // th2)
    nw = -(-w // tw)
    pad_h2 = (nh + 1) * th2 - (h2 + HALO)
    pad_w = (nw + 1) * tw - (w + HALO)
    # pad in ORIGINAL rows: 2*HALO top, 2*pad_h2 bottom
    xp = jnp.pad(x, ((0, 0), (2 * HALO, 2 * pad_h2), (HALO, pad_w), (0, 0)))

    packed = _pack_s2d(params, c)
    kernel = make_kernel(th2, tw, c, h2, w, nh, nw)
    quad = lambda sh, sw: pl.BlockSpec(  # noqa: E731
        (1, 2 * th2, tw, c),
        lambda bi, hi, wi, sh=sh, sw=sw: (bi, hi + sh, wi + sw, 0),
        memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda bi, hi, wi: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nh * 2 * th2, nw * tw, c), x.dtype),
        grid=(b, nh, nw),
        in_specs=[quad(0, 0), quad(0, 1), quad(1, 0), quad(1, 1)]
        + [full(p) for p in packed],
        out_specs=pl.BlockSpec(
            (1, 2 * th2, tw, c), lambda bi, hi, wi: (bi, hi, wi, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th2 + 2 * HALO + 2,
                        tw + 2 * HALO + 2 + ((-(tw + 2 * HALO + 2)) % 8), KPAD2),
                       x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, xp, xp, xp, *packed)
    return out[:, :h, :w, :]


def main():
    import sys
    import numpy as np
    check = "--check" in sys.argv

    rng = np.random.default_rng(0)
    c = 64
    if check:
        from jax.experimental.pallas import tpu as pltpu2
        x = jnp.asarray(rng.standard_normal((1, 52, 44, 16)).astype(np.float32)) * 0.1
        cc = 16
    else:
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1080, 1920, c), jnp.bfloat16)
        cc = c
    params = []
    k = cc
    for i in range(5):
        params.append(jnp.asarray(rng.standard_normal((3, 3, k, 32)).astype(np.float32)) * 0.05)
        params.append(jnp.asarray(rng.standard_normal((32,)).astype(np.float32)) * 0.05)
        k += 32
    params.append(jnp.asarray(rng.standard_normal((k, cc)).astype(np.float32)) * 0.05)
    params.append(jnp.zeros((cc,), jnp.float32))
    params = tuple(p.astype(x.dtype) for p in params)

    if check:
        ref = _rdb_xla(x, params)
        with pltpu.force_tpu_interpret_mode():
            got = rdb_s2d(x, params, th2=12, tw=16)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"s2d maxerr vs xla: {err:.3e}", flush=True)
        return

    over = measure_dispatch_overhead()
    for th2, tw in ((16, 240), (16, 120), (24, 240)):
        try:
            r = timed_scan(lambda xx, pp: rdb_s2d(xx, pp, th2=th2, tw=tw),
                           x, params, iters=6, dispatch_overhead_ms=over)
            print(f"s2d th2={th2} tw={tw}: {r['ms_per_call']:7.2f} ms/block", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"s2d th2={th2} tw={tw}: FAILED {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
