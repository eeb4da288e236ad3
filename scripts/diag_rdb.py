#!/usr/bin/env python
"""Cost attribution inside the fused RDB kernel.

Runs structurally-identical kernel variants that disable pieces of the work:
  full      — the real kernel
  noshift   — matmuls only; conv geometry replaced by the centre tap
              (wrong math, same MXU work) → isolates the shifted-add cost
  nolff     — full dense chain, skip the final 1x1 fusion matmul
  matonly   — matmuls with NO y_scratch store (result reduced to one lane)

Round-3 store/VPU-gap candidates (exact math, different VPU schedules):
  chunk_dx      — dx-major weight packing: each chunk takes ONE whole-chunk
                  sublane shift, and its three tap adds become major-dim
                  (row-offset) slices; vs chunk_dy's six sublane-offset
                  slices per layer.
  chunk_dy_pet  — the production chunk_dy schedule but the matmul emits
                  bf16 directly (preferred_element_type), skipping the
                  explicit f32→bf16 cast pass over each (ph, pw, 96) chunk.
  chunk_dx_pet  — both of the above.

Not part of the package — a measurement harness for docs/perf_notes.md.
Small-shape interpret-mode parity: DIAG_INTERPRET=1 DIAG_TILES=32x120.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerve_tpu.ops.rdb import (
    FEAT_OFF, GROWTH, HALO, KPAD, NUM_LAYERS, _layer_k, _pack_weights,
)
from nerve_tpu.utils.profiling import measure_dispatch_overhead, timed_scan


def _pack_weights_dx(params, features):
    """dx-major repack: column block (3·dx+dy) holds tap (dy, dx).

    The centre tap (dy=1, dx=1) stays in block 4, so the bias row placement
    matches _pack_weights.
    """
    packed = _pack_weights(params, features)
    # packed[i] has columns ordered (3·dy+dx); dst block (3·dx+dy) = that.
    out = []
    for wcat in packed[:NUM_LAYERS]:
        blocks = [wcat[:, (3 * dy + dx) * GROWTH:(3 * dy + dx + 1) * GROWTH]
                  for dx in range(3) for dy in range(3)]
        out.append(jnp.concatenate(blocks, axis=1))
    out.append(packed[NUM_LAYERS])
    return out


def make_kernel(th, tw, features, mode, img_h=1080, img_w=1920):
    def kernel(b00_ref, b01_ref, b10_ref, b11_ref,
               w0_ref, w1_ref, w2_ref, w3_ref, w4_ref, lw_ref,
               out_ref, scratch, y_scratch):
        hh, ww = th + 2 * HALO, tw + 2 * HALO
        ph = hh + 2
        pw = ww + 2 + ((-(ww + 2)) % 8)
        m = ph * pw

        step0 = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                 & (pl.program_id(2) == 0))

        @pl.when(step0)
        def _init():
            scratch[...] = jnp.zeros((ph, pw, KPAD), scratch.dtype)
            scratch[:, :, 0:1] = jnp.ones((ph, pw, 1), scratch.dtype)

        f0, f1 = FEAT_OFF, FEAT_OFF + features
        scratch[1:1 + th, 1:1 + tw, f0:f1] = b00_ref[0]
        scratch[1:1 + th, 1 + tw:1 + ww, f0:f1] = b01_ref[0, :, :ww - tw]
        scratch[1 + th:1 + hh, 1:1 + tw, f0:f1] = b10_ref[0, :hh - th]
        scratch[1 + th:1 + hh, 1 + tw:1 + ww, f0:f1] = b11_ref[0, :hh - th, :ww - tw]

        def matmul(w_ref):
            k = w_ref.shape[0]
            x = scratch[:, :, :k].reshape(m, k)
            y = lax.dot_general(x, w_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return y.reshape(ph, pw, w_ref.shape[1])

        def matmul_cols(w_ref, n0, n1, out_dtype=jnp.float32):
            k = w_ref.shape[0]
            x = scratch[:, :, :k].reshape(m, k)
            y = lax.dot_general(x, w_ref[:, n0:n1], (((1,), (0,)), ((), ())),
                                preferred_element_type=out_dtype)
            return y.reshape(ph, pw, n1 - n0)

        negmask = None
        if mode == "chunk_negmask":
            row_g = jax.lax.broadcasted_iota(jnp.int32, (hh, ww, GROWTH), 0)
            col_g = jax.lax.broadcasted_iota(jnp.int32, (hh, ww, GROWTH), 1)
            hi, wi = pl.program_id(1), pl.program_id(2)
            row_g = row_g + hi * th
            col_g = col_g + wi * tw
            inval = ((row_g < HALO) | (row_g >= img_h + HALO)
                     | (col_g < HALO) | (col_g >= img_w + HALO))
            negmask = inval.astype(jnp.float32) * (-1e9)

        def zero_strips_full():
            hi, wi = pl.program_id(1), pl.program_id(2)
            nh = pl.num_programs(1)
            nw = pl.num_programs(2)
            @pl.when(hi == 0)
            def _t():
                scratch[1:1 + HALO, :, :] = jnp.zeros((HALO, pw, KPAD), scratch.dtype)
            @pl.when(wi == 0)
            def _l():
                scratch[:, 1:1 + HALO, :] = jnp.zeros((ph, HALO, KPAD), scratch.dtype)
            # serving 1080x1920 grid: bottom/right offsets for the last tiles
            bot = img_h + HALO - ((-(-img_h // th)) - 1) * th
            if bot < hh:
                @pl.when(hi == nh - 1)
                def _b():
                    scratch[1 + bot:1 + hh, :, :] = jnp.zeros((hh - bot, pw, KPAD), scratch.dtype)
            rgt = img_w + HALO - ((-(-img_w // tw)) - 1) * tw
            if rgt < ww:
                @pl.when(wi == nw - 1)
                def _r():
                    scratch[:, 1 + rgt:1 + ww, :] = jnp.zeros((ph, ww - rgt, KPAD), scratch.dtype)

        def make_layer(i, w_ref):
            if mode == "chunk_strips_full":
                def run(_):
                    acc = jnp.zeros((hh, ww, GROWTH), jnp.float32)
                    for dy in range(3):
                        y = matmul_cols(w_ref, 3 * dy * GROWTH, (3 * dy + 3) * GROWTH)
                        y = y.astype(jnp.bfloat16)
                        for dx in range(3):
                            acc = acc + y[dy:dy + hh, dx:dx + ww,
                                          dx * GROWTH:(dx + 1) * GROWTH].astype(jnp.float32)
                    f = jnp.maximum(acc, 0.0)
                    ki = _layer_k(i, features)
                    scratch[1:1 + hh, 1:1 + ww, ki:ki + GROWTH] = f.astype(scratch.dtype)
                    zero_strips_full()
                    return 0
                return run
            if mode == "chunk_negmask":
                def run(_):
                    acc = jnp.zeros((hh, ww, GROWTH), jnp.float32)
                    for dy in range(3):
                        y = matmul_cols(w_ref, 3 * dy * GROWTH, (3 * dy + 3) * GROWTH)
                        y = y.astype(jnp.bfloat16)
                        for dx in range(3):
                            acc = acc + y[dy:dy + hh, dx:dx + ww,
                                          dx * GROWTH:(dx + 1) * GROWTH].astype(jnp.float32)
                    f = jnp.maximum(acc + negmask, 0.0)
                    ki = _layer_k(i, features)
                    scratch[1:1 + hh, 1:1 + ww, ki:ki + GROWTH] = f.astype(scratch.dtype)
                    return 0
                return run
            if mode in ("chunk_dx", "chunk_dx_pet"):
                def run(_):
                    # dx-major packing: one whole-chunk sublane shift, then
                    # three major-dim (row-offset) tap adds.
                    acc = jnp.zeros((hh, ww, GROWTH), jnp.float32)
                    for dx in range(3):
                        if mode == "chunk_dx_pet":
                            y = matmul_cols(w_ref, 3 * dx * GROWTH,
                                            (3 * dx + 3) * GROWTH,
                                            out_dtype=jnp.bfloat16)
                        else:
                            y = matmul_cols(w_ref, 3 * dx * GROWTH,
                                            (3 * dx + 3) * GROWTH)
                            y = y.astype(jnp.bfloat16)
                        ysub = y[:, dx:dx + ww, :]
                        for dy in range(3):
                            acc = acc + ysub[
                                dy:dy + hh, :, dy * GROWTH:(dy + 1) * GROWTH
                            ].astype(jnp.float32)
                    f = jnp.maximum(acc, 0.0)
                    ki = _layer_k(i, features)
                    scratch[1:1 + hh, 1:1 + ww, ki:ki + GROWTH] = f.astype(scratch.dtype)
                    return 0
                return run
            if mode == "chunk_dy_pet":
                def run(_):
                    acc = jnp.zeros((hh, ww, GROWTH), jnp.float32)
                    for dy in range(3):
                        y = matmul_cols(w_ref, 3 * dy * GROWTH,
                                        (3 * dy + 3) * GROWTH,
                                        out_dtype=jnp.bfloat16)
                        for dx in range(3):
                            acc = acc + y[dy:dy + hh, dx:dx + ww,
                                          dx * GROWTH:(dx + 1) * GROWTH].astype(jnp.float32)
                    f = jnp.maximum(acc, 0.0)
                    ki = _layer_k(i, features)
                    scratch[1:1 + hh, 1:1 + ww, ki:ki + GROWTH] = f.astype(scratch.dtype)
                    return 0
                return run
            if mode in ("chunk_dy", "chunk_dy_bf16", "chunk_tap"):
                def run(_):
                    acc = jnp.zeros((hh, ww, GROWTH), jnp.float32)
                    if mode == "chunk_tap":
                        for dy in range(3):
                            for dx in range(3):
                                t = 3 * dy + dx
                                y = matmul_cols(w_ref, t * GROWTH, (t + 1) * GROWTH)
                                acc = acc + y[dy:dy + hh, dx:dx + ww, :]
                    else:
                        for dy in range(3):
                            y = matmul_cols(w_ref, 3 * dy * GROWTH,
                                            (3 * dy + 3) * GROWTH)
                            if mode == "chunk_dy_bf16":
                                y = y.astype(jnp.bfloat16)
                            for dx in range(3):
                                acc = acc + y[
                                    dy:dy + hh, dx:dx + ww,
                                    dx * GROWTH:(dx + 1) * GROWTH
                                ].astype(jnp.float32)
                    f = jnp.maximum(acc, 0.0)
                    ki = _layer_k(i, features)
                    scratch[1:1 + hh, 1:1 + ww, ki:ki + GROWTH] = f.astype(scratch.dtype)
                    return 0
                return run

            def run(_):
                if mode == "matonly":
                    y = matmul(w_ref)
                    # keep a data dependence, minimal stores
                    scratch[1:2, 1:2, _layer_k(i, features):_layer_k(i, features) + GROWTH] = (
                        y[:1, :1, :GROWTH].astype(scratch.dtype))
                    return 0
                y_scratch[...] = matmul(w_ref).astype(y_scratch.dtype)
                if mode == "noshift":
                    f = jnp.maximum(
                        y_scratch[1:1 + hh, 1:1 + ww, 4 * GROWTH:5 * GROWTH]
                        .astype(jnp.float32), 0.0)
                else:
                    acc = jnp.zeros((hh, ww, GROWTH), jnp.float32)
                    for dy in range(3):
                        for dx in range(3):
                            sblk = (3 * dy + dx) * GROWTH
                            acc = acc + y_scratch[
                                dy:dy + hh, dx:dx + ww, sblk:sblk + GROWTH
                            ].astype(jnp.float32)
                    f = jnp.maximum(acc, 0.0)
                ki = _layer_k(i, features)
                scratch[1:1 + hh, 1:1 + ww, ki:ki + GROWTH] = f.astype(scratch.dtype)
                return 0
            return run

        w_all = (w0_ref, w1_ref, w2_ref, w3_ref, w4_ref)
        flat_modes = ("flat", "flat_strips", "flat_dx_strips", "flat_dy_pet_strips",
                      "flat_dx_pet_strips",
                      # round-3b schedule probes (all exact except accbf16):
                      "flat_dx_strips_xonce",    # hoist operand reshape/layer
                      "flat_dx_strips_f32y",     # no intermediate bf16 cast
                      "flat_dx_strips_accbf16",  # bf16 accumulator (approx)
                      "flat_dx_strips_xonce_accbf16",
                      # round-5 probe: tap extraction as MXU SELECTION
                      # MATMULS — hypothesis: the 21 ms full−matonly gap is
                      # the 32-lane sub-register slices (y[..., dy*32:+32]),
                      # which Mosaic must lower as cross-lane shuffles. Here
                      # each tap is y2d @ S_dy with S a 0/1 (96, 32)
                      # selector, so every subsequent add touches only
                      # lane-0-aligned 32-wide blocks. Exact math.
                      # MEASURED 48.8 ms vs 30.4 — NEGATIVE.
                      "flat_dx_selmm_strips",
                      # round-5 probes: software-pipelined chunk schedule.
                      # noshift (29.2 ms, no adds at all) vs matonly (9.5)
                      # says the gap is the serialised matmul→materialise
                      # cadence, NOT the shifted adds. pipe issues chunk
                      # i+1's matmul BEFORE chunk i's VPU phase; pipe3
                      # issues all three, then all VPU work. Exact math.
                      "flat_dx_strips_pipe", "flat_dx_strips_pipe3")
        if mode in flat_modes:
            dx_major = "dx" in mode
            pet = "pet" in mode
            xonce = "xonce" in mode
            f32y = "f32y" in mode
            selmm = "selmm" in mode
            pipe = "pipe" in mode and "pipe3" not in mode
            pipe3 = "pipe3" in mode
            accdt = jnp.bfloat16 if "accbf16" in mode else jnp.float32
            if selmm:
                rsel = lax.broadcasted_iota(jnp.int32, (3 * GROWTH, GROWTH), 0)
                csel = lax.broadcasted_iota(jnp.int32, (3 * GROWTH, GROWTH), 1)
                sels = [
                    (rsel == dy * GROWTH + csel).astype(jnp.bfloat16)
                    for dy in range(3)
                ]
            for i, w_ref in enumerate(w_all):
                acc = jnp.zeros((hh, ww, GROWTH), accdt)
                if pipe or pipe3:
                    def vpu_phase(y, outer, acc):
                        y = y.astype(jnp.bfloat16)
                        ysub = y[:, outer:outer + ww, :]
                        for dy in range(3):
                            acc = acc + ysub[
                                dy:dy + hh, :, dy * GROWTH:(dy + 1) * GROWTH
                            ].astype(accdt)
                        return acc

                    if pipe3:
                        ys = [matmul_cols(w_ref, 3 * o * GROWTH,
                                          (3 * o + 3) * GROWTH)
                              for o in range(3)]
                        for o in range(3):
                            acc = vpu_phase(ys[o], o, acc)
                    else:
                        y_next = matmul_cols(w_ref, 0, 3 * GROWTH)
                        for o in range(3):
                            y = y_next
                            if o < 2:
                                y_next = matmul_cols(
                                    w_ref, 3 * (o + 1) * GROWTH,
                                    (3 * (o + 1) + 3) * GROWTH,
                                )
                            acc = vpu_phase(y, o, acc)
                    f = jnp.maximum(acc, 0.0)
                    ki = _layer_k(i, features)
                    scratch[1:1 + hh, 1:1 + ww, ki:ki + GROWTH] = f.astype(
                        scratch.dtype)
                    zero_strips_full()
                    continue
                if xonce:
                    k = w_ref.shape[0]
                    xop = scratch[:, :, :k].reshape(m, k)
                for outer in range(3):  # dy for row-major packs, dx for dx-major
                    n0, n1 = 3 * outer * GROWTH, (3 * outer + 3) * GROWTH
                    if selmm:
                        k = w_ref.shape[0]
                        y2d = lax.dot_general(
                            scratch[:, :, :k].reshape(m, k), w_ref[:, n0:n1],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(jnp.bfloat16)  # (m, 96)
                        for dy in range(3):
                            t = lax.dot_general(
                                y2d, sels[dy], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            ).reshape(ph, pw, GROWTH)
                            ysub = t[:, outer:outer + ww, :]
                            acc = acc + ysub[dy:dy + hh].astype(accdt)
                        continue
                    if xonce:
                        y = lax.dot_general(
                            xop, w_ref[:, n0:n1], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).reshape(ph, pw, n1 - n0)
                    elif pet:
                        y = matmul_cols(w_ref, n0, n1, out_dtype=jnp.bfloat16)
                    else:
                        y = matmul_cols(w_ref, n0, n1)
                    if not pet and not f32y:
                        y = y.astype(jnp.bfloat16)
                    if dx_major:
                        ysub = y[:, outer:outer + ww, :]
                        for dy in range(3):
                            acc = acc + ysub[
                                dy:dy + hh, :, dy * GROWTH:(dy + 1) * GROWTH
                            ].astype(accdt)
                    else:
                        for dx in range(3):
                            acc = acc + y[outer:outer + hh, dx:dx + ww,
                                          dx * GROWTH:(dx + 1) * GROWTH].astype(accdt)
                f = jnp.maximum(acc, 0.0)
                ki = _layer_k(i, features)
                scratch[1:1 + hh, 1:1 + ww, ki:ki + GROWTH] = f.astype(scratch.dtype)
                if mode != "flat":
                    zero_strips_full()
        else:
            branches = [make_layer(i, w) for i, w in enumerate(w_all)]
            jax.lax.fori_loop(0, NUM_LAYERS, lambda i, _: jax.lax.switch(i, branches, 0), 0)

        if mode == "nolff":
            out_ref[0] = scratch[
                1 + HALO:1 + HALO + th, 1 + HALO:1 + HALO + tw, f0:f1
            ].astype(out_ref.dtype)
            return
        lff = matmul(lw_ref)
        x_in = scratch[1:1 + hh, 1:1 + ww, f0:f1].astype(jnp.float32)
        out = lff[1:1 + hh, 1:1 + ww, :] * 0.2 + x_in
        out_ref[0] = out[HALO:HALO + th, HALO:HALO + tw].astype(out_ref.dtype)

    return kernel


def run_variant(x, params, th, tw, mode, over):
    b, h, w, c = x.shape
    nh = -(-h // th)
    nw = -(-w // tw)
    pad_h = (nh + 1) * th - (h + HALO)
    pad_w = (nw + 1) * tw - (w + HALO)
    dx_major = "dx" in mode
    packed = (_pack_weights_dx if dx_major else _pack_weights)(params, c)
    hh, ww = th + 2 * HALO, tw + 2 * HALO
    ph = hh + 2
    pw = ww + 2 + ((-(ww + 2)) % 8)
    kernel = make_kernel(th, tw, c, mode, img_h=h, img_w=w)
    interpret = bool(int(__import__("os").environ.get("DIAG_INTERPRET", "0")))

    quad = lambda sh, sw: pl.BlockSpec(  # noqa: E731
        (1, th, tw, c), lambda bi, hi, wi, sh=sh, sw=sw: (bi, hi + sh, wi + sw, 0),
        memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda bi, hi, wi: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    def call(xx, pk):
        xp = jnp.pad(xx, ((0, 0), (HALO, pad_h), (HALO, pad_w), (0, 0)))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, nh * th, nw * tw, c), xx.dtype),
            grid=(b, nh, nw),
            in_specs=[quad(0, 0), quad(0, 1), quad(1, 0), quad(1, 1)]
            + [full(p) for p in pk],
            out_specs=pl.BlockSpec((1, th, tw, c),
                                   lambda bi, hi, wi: (bi, hi, wi, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ph, pw, KPAD), xx.dtype),
                            pltpu.VMEM((ph, pw, 9 * GROWTH), xx.dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xp, xp, xp, xp, *pk)[:, :h, :w, :]

    exact_modes = ("full", "chunk_dy", "chunk_dy_bf16", "chunk_tap",
                   "chunk_negmask", "chunk_strips_full", "chunk_dx",
                   "chunk_dx_pet", "chunk_dy_pet", "flat", "flat_strips",
                   "flat_dx_strips", "flat_dy_pet_strips", "flat_dx_pet_strips",
                   "flat_dx_strips_xonce", "flat_dx_strips_f32y",
                   "flat_dx_strips_accbf16", "flat_dx_strips_xonce_accbf16",
                   "flat_dx_selmm_strips", "flat_dx_strips_pipe",
                   "flat_dx_strips_pipe3")
    if mode in exact_modes:
        from nerve_tpu.ops.rdb import _rdb_xla
        ref = jax.jit(_rdb_xla)(x, params)
        got = jax.jit(call)(x, packed)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    else:
        err = float("nan")
    r = timed_scan(call, x, packed, iters=6, dispatch_overhead_ms=over)
    print(f"{mode:14s} th={th} tw={tw}  {r['ms_per_call']:7.2f} ms  maxerr={err:.2e}")


def main():
    import os
    if int(os.environ.get("DIAG_INTERPRET", "0")):
        # Interpret mode is a CPU correctness pass; never touch the tunnel
        # (the axon plugin ignores JAX_PLATFORMS env — config is binding).
        jax.config.update("jax_platforms", "cpu")
    key = jax.random.PRNGKey(0)
    c = 64
    if int(os.environ.get("DIAG_INTERPRET", "0")):
        # Small-shape correctness pass (CPU interpret mode): 2x2 tile grid
        # with ragged edges so the boundary-strip paths are exercised.
        x = jax.random.normal(key, (1, 56, 200, c), jnp.bfloat16)
    else:
        x = jax.random.normal(key, (1, 1080, 1920, c), jnp.bfloat16)
    params = []
    k = c
    for i in range(5):
        params.append(jax.random.normal(key, (3, 3, k, 32), jnp.bfloat16) * 0.05)
        params.append(jnp.zeros((32,), jnp.bfloat16))
        k += 32
    params.append(jax.random.normal(key, (k, c), jnp.bfloat16) * 0.05)
    params.append(jnp.zeros((c,), jnp.bfloat16))
    params = tuple(params)
    over = measure_dispatch_overhead()
    print(f"dispatch ~{over:.1f} ms")
    modes = ("full", "chunk_dy", "chunk_dy_bf16", "chunk_tap")
    import sys
    if len(sys.argv) > 1:
        modes = tuple(sys.argv[1].split(","))
    import os
    tiles = os.environ.get("DIAG_TILES", "32x120")
    for spec in tiles.split(","):
        th, tw = (int(v) for v in spec.split("x"))
        for mode in modes:
            run_variant(x, params, th, tw, mode, over)


if __name__ == "__main__":
    main()
