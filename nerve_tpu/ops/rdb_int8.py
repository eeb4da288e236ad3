"""int8 fused Residual Dense Block chain — the 394-TOPS serving path.

The bf16 fused RDB kernel (``nerve_tpu.ops.rdb``) is intermediate-store/VPU
bound: ~31.6 ms/block at 1080p while its matmuls alone are ~10 ms
(docs/perf_notes.md). int8 attacks both sides of that bound at once on v5e:

  * the MXU runs int8×int8→int32 at 2× the bf16 rate (394 vs 197 TOPS);
  * every dense-concat store into the VMEM scratch shrinks 2× (int8 vs
    bf16), and the scratch itself halves, affording larger tiles.

Quantisation scheme (standard static post-training quantisation):

  * **Activations** — per-tensor symmetric int8 with STATIC calibrated
    scales: one scale for the block input and one per dense-layer output
    (relu outputs, so effectively uint7). Scales come from a calibration
    forward (:func:`calibrate_rdb_chain`) recording per-layer max-abs.
  * **Weights** — per-COLUMN symmetric int8 on the packed (K_i, 288)
    tap-matrix (``nerve_tpu.ops.rdb`` packing: column (3·dy+dx)·32+c is tap
    (dy, dx) of output channel c). Because the dense concatenation mixes
    channels with different activation scales, each row k of the f32 weight
    is FOLDED with the activation scale of the slot owning channel k before
    quantising — the int32 accumulator then dequantises with a single
    per-column factor.
  * **Biases** — exact f32, added in the epilogue (the bf16 kernel's
    ones-channel matmul trick would clamp biases to weight-scale precision).

Per-layer epilogue (VPU, f32): dequantise the three per-dy int32 chunks with
their per-column scales during the nine statically-shifted tap adds, add the
bias, relu, requantise to int8, store. The residual add and the 1×1 fusion
dequantise likewise; block output is bf16 (chain-internal requantisation to
the next block's input scale happens on the way out, so inter-block HBM
traffic is int8 too except for the final block).

Reference: nerve_cl/models/super_resolution.py:212-253 (ResidualDenseBlock);
this int8 path has no reference analogue (the reference serves f32 torch).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerve_tpu.ops.rdb import (
    FEAT_OFF,
    GROWTH,
    HALO,
    KPAD,
    NUM_LAYERS,
    _layer_k,
    _rdb_xla,
)

NTAP = 9 * GROWTH  # 288 packed tap columns per dense layer

# dx-major chunk schedule (mirrors ops.rdb.DX_MAJOR): each per-chunk matmul
# output takes ONE whole-chunk sublane shift + three major-dim tap adds,
# instead of dy-major's six sublane-offset slices per layer. Measured −12 %
# on the bf16 kernel (docs/perf_notes.md round 3); applied to the int8
# kernel as a call-time column permutation of (wq, dq) so quantised
# artifacts (quantize_rdb_chain output) keep the dy-major wire format.
DX_MAJOR_INT8 = False  # flipped by measurement; see docs/perf_notes.md

# Production quantisation scheme for the model-level serving path
# (models/quantize.py + RDBStack): False = per-column scales + per-chunk
# dequant (round-2 production), True = per-channel tap-shared scales +
# int32 tap accumulation (round-4 variant). Consulted at BOTH quantise and
# apply time — artifacts quantised under one setting must be rebuilt after
# flipping. Decided by scripts/diag_rdb_int8.py --per-channel on hardware.
PER_CHANNEL_INT8 = False


def _permute_cols_dx(mat: jnp.ndarray) -> jnp.ndarray:
    """Permute 288 packed tap columns from (3·dy+dx) to (3·dx+dy) order."""
    blocks = [
        mat[..., (3 * dy + dx) * GROWTH : (3 * dy + dx + 1) * GROWTH]
        for dx in range(3)
        for dy in range(3)
    ]
    return jnp.concatenate(blocks, axis=-1)


# --------------------------------------------------------------------------- #
# Calibration
# --------------------------------------------------------------------------- #
def calibrate_rdb_chain(x: jnp.ndarray, params_list: Sequence) -> jnp.ndarray:
    """Per-block activation scales from a calibration forward.

    Runs the exact XLA formulation of the chain on ``x`` (any representative
    batch, e.g. aggregated features of a few real frames) and records
    max-abs statistics. Generic over the block geometry: each block's param
    list is (w_0, b_0, ..., w_{L-1}, b_{L-1}, lw, lb) for any L.

    Returns:
        (num_blocks, 1 + L) f32: ``scales[b] = [s_in, s_f0, ..., s_f{L-1}]``
        where each s is max-abs/127 of the corresponding tensor (block
        input / dense-layer relu outputs).
    """
    x = x.astype(jnp.float32)
    rows = []
    for params in params_list:
        ps = [jnp.asarray(p, jnp.float32) for p in params]
        num_layers = len(ps) // 2 - 1
        lw, lb = ps[-2], ps[-1]
        maxes = [jnp.max(jnp.abs(x))]
        feats = [x]
        for i in range(num_layers):
            wk, bk = ps[2 * i], ps[2 * i + 1]
            inp = feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=-1)
            dn = lax.conv_dimension_numbers(
                inp.shape, wk.shape, ("NHWC", "HWIO", "NHWC")
            )
            f = lax.conv_general_dilated(
                inp, wk, (1, 1), "SAME", dimension_numbers=dn
            ) + bk
            f = jnp.maximum(f, 0.0)
            feats.append(f)
            maxes.append(jnp.max(jnp.abs(f)))
        full = jnp.concatenate(feats, axis=-1)
        lff = jnp.einsum("bhwk,kn->bhwn", full, lw) + lb
        x = lff * 0.2 + x
        rows.append(jnp.stack(maxes))
    return jnp.stack(rows) / 127.0


# --------------------------------------------------------------------------- #
# Weight packing
# --------------------------------------------------------------------------- #
def _owner_scales(
    features: int, k: int, scales: jnp.ndarray, growth: int = GROWTH
) -> jnp.ndarray:
    """Activation scale owning each of the first ``k`` scratch channels.

    Slot layout (ops/rdb.py): [0:8) unused, [8:8+features) block input
    (scale s_in), then growth-sized runs per dense layer (scale s_fi).
    """
    per_ch = [scales[0]] * FEAT_OFF + [scales[0]] * features
    i = 0
    while len(per_ch) < k:
        per_ch += [scales[1 + i]] * growth
        i += 1
    return jnp.stack(per_ch[:k])


def quantize_rdb_block(
    params: Sequence[jnp.ndarray], features: int, scales: jnp.ndarray,
    per_channel: bool = False,
) -> Tuple[List[jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """One block's f32/bf16 params + act scales → int8 packed weights + meta.

    Generic over (num_layers L, growth G) — both inferred from ``params``
    (L from the list length, G from the dense kernels' output channels).
    The default 5×32 geometry produces the wire format the fused Pallas
    kernel consumes; other geometries are served by the XLA formulation.

    Returns:
        wq:   L int8 (K_i, 9·G) dense-tap matrices + 1 int8 (K_L, features)
              fusion matrix (L+1 arrays).
        dq:   (L, 9·G) f32 per-column dequantisation scales (act scales
              folded in — int32 acc × dq = exact-layer f32).
        meta: (4, max(9·G, 2·features, L·G)) f32. Scalars are stored
              replicated along lanes (Mosaic cannot broadcast a (1,1,1)
              scalar into both sublanes and lanes, so every kernel read is
              a lane-sized vector):
              row 0 = biases (L·G) | pad
              row 1 = lff dq (features) | lff bias (features) | pad
              row 2 = s_in replicated across the whole row
              row 3 = requant 1/s_fi replicated per G block
    """
    scales = jnp.asarray(scales, jnp.float32)
    num_layers = len(params) // 2 - 1
    growth = params[0].shape[3]
    ntap = 9 * growth
    layer_k = lambda i: FEAT_OFF + features + growth * i  # noqa: E731
    wq: List[jnp.ndarray] = []
    dqs = []
    biases = []
    for i in range(num_layers):
        w = jnp.asarray(params[2 * i], jnp.float32)
        b = jnp.asarray(params[2 * i + 1], jnp.float32)
        ki = layer_k(i)
        k_in = w.shape[2]
        wp = jnp.pad(w, ((0, 0), (0, 0), (FEAT_OFF, ki - FEAT_OFF - k_in), (0, 0)))
        wcat = jnp.transpose(wp, (2, 0, 1, 3)).reshape(ki, ntap)
        folded = wcat * _owner_scales(features, ki, scales, growth)[:, None]
        col = jnp.maximum(jnp.max(jnp.abs(folded), axis=0), 1e-12) / 127.0
        if per_channel:
            # One scale per OUTPUT CHANNEL shared across its 9 tap columns:
            # the int32 partials of all taps then share a dequant factor, so
            # the kernel can accumulate the nine shifted adds in int32 and
            # dequantise ONCE per layer (int32_taps schedule) instead of
            # per 3·G chunk. Slightly coarser than per-column (the max is
            # over 9 columns) — standard per-channel PTQ.
            col = jnp.tile(jnp.max(col.reshape(9, growth), axis=0), 9)
        wq.append(
            jnp.clip(jnp.round(folded / col), -127, 127).astype(jnp.int8)
        )
        dqs.append(col)
        biases.append(b)
    lw = jnp.asarray(params[2 * num_layers], jnp.float32)
    lb = jnp.asarray(params[2 * num_layers + 1], jnp.float32)
    kl = layer_k(num_layers)
    lwp = jnp.pad(lw, ((FEAT_OFF, kl - FEAT_OFF - lw.shape[0]), (0, 0)))
    lfolded = lwp * _owner_scales(features, kl, scales, growth)[:, None]
    lcol = jnp.maximum(jnp.max(jnp.abs(lfolded), axis=0), 1e-12) / 127.0
    wq.append(jnp.clip(jnp.round(lfolded / lcol), -127, 127).astype(jnp.int8))

    width = max(ntap, 2 * features, num_layers * growth)
    meta = jnp.zeros((4, width), jnp.float32)
    meta = meta.at[0, : num_layers * growth].set(jnp.concatenate(biases))
    meta = meta.at[1, :features].set(lcol)
    meta = meta.at[1, features : 2 * features].set(lb)
    meta = meta.at[2, :].set(scales[0])
    meta = meta.at[3, : num_layers * growth].set(
        jnp.repeat(1.0 / scales[1:], growth,
                   total_repeat_length=num_layers * growth)
    )
    return wq, jnp.stack(dqs), meta


def quantize_rdb_chain(params_list: Sequence, scales: jnp.ndarray,
                       per_channel: bool = False):
    """Whole-chain quantisation: per-block (wq, dq, meta) tuples."""
    features = params_list[0][0].shape[2]
    return tuple(
        quantize_rdb_block(params, features, scales[b], per_channel)
        for b, params in enumerate(params_list)
    )


def chain_geometry(qchain) -> Tuple[int, int]:
    """(num_layers, growth) of a quantised chain's wire format."""
    wq = qchain[0][0]
    return len(wq) - 1, wq[0].shape[1] // 9


# --------------------------------------------------------------------------- #
# Kernel
# --------------------------------------------------------------------------- #
def _rdb_int8_kernel(
    b00_ref, b01_ref, b10_ref, b11_ref,
    w0_ref, w1_ref, w2_ref, w3_ref, w4_ref, lw_ref,
    dq_ref, meta_ref, nmeta_ref,
    out_ref,
    scratch,
    *,
    th: int, tw: int, features: int, img_h: int, img_w: int,
    nh_static: int, nw_static: int, out_int8: bool,
    dx_major: bool = DX_MAJOR_INT8,
    int32_taps: bool = False,
):
    """Fused int8 RDB on NHWC tiles (structure mirrors rdb._rdb_kernel).

    scratch is int8; each dense layer is three per-dy (M, K_i)·(K_i, 96)
    int8 matmuls into int32, dequantised per column during the nine shifted
    tap adds (f32 accumulator), + bias, relu, requantised to int8.

    When ``out_int8`` the output tile is requantised at the NEXT block's
    input scale (nmeta row 2 col 0) so chained blocks pass int8 through HBM;
    the final block emits bf16 (nmeta is then all-ones and ignored).
    """
    hh, ww = th + 2 * HALO, tw + 2 * HALO
    ph = hh + 2
    pw = ww + 2 + ((-(ww + 2)) % 8)
    m = ph * pw

    step0 = (
        (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    )

    @pl.when(step0)
    def _init():
        scratch[...] = jnp.zeros((ph, pw, KPAD), scratch.dtype)

    hi, wi = pl.program_id(1), pl.program_id(2)

    def zero_boundary_strips():
        @pl.when(hi == 0)
        def _top():
            scratch[1 : 1 + HALO, :, :] = jnp.zeros((HALO, pw, KPAD), scratch.dtype)

        @pl.when(wi == 0)
        def _left():
            scratch[:, 1 : 1 + HALO, :] = jnp.zeros((ph, HALO, KPAD), scratch.dtype)

        for gi in range(max(nh_static - 2, 0), nh_static):
            off = img_h + HALO - gi * th
            if off < hh:
                @pl.when(hi == gi)
                def _bot(off=off):
                    scratch[1 + off : 1 + hh, :, :] = jnp.zeros(
                        (hh - off, pw, KPAD), scratch.dtype
                    )
        for gj in range(max(nw_static - 2, 0), nw_static):
            off = img_w + HALO - gj * tw
            if off < ww:
                @pl.when(wi == gj)
                def _right(off=off):
                    scratch[:, 1 + off : 1 + ww, :] = jnp.zeros(
                        (ph, ww - off, KPAD), scratch.dtype
                    )

    f0, f1 = FEAT_OFF, FEAT_OFF + features
    scratch[1 : 1 + th, 1 : 1 + tw, f0:f1] = b00_ref[0]
    scratch[1 : 1 + th, 1 + tw : 1 + ww, f0:f1] = b01_ref[0, :, : ww - tw]
    scratch[1 + th : 1 + hh, 1 : 1 + tw, f0:f1] = b10_ref[0, : hh - th]
    scratch[1 + th : 1 + hh, 1 + tw : 1 + ww, f0:f1] = b11_ref[0, : hh - th, : ww - tw]

    def matmul(w_ref, n0=None, n1=None):
        k = w_ref.shape[0]
        x = scratch[:, :, :k].reshape(m, k)
        wcols = w_ref[:] if n0 is None else w_ref[:, n0:n1]
        y = lax.dot_general(
            x, wcols, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y.reshape(ph, pw, wcols.shape[1])

    for i, w_ref in enumerate((w0_ref, w1_ref, w2_ref, w3_ref, w4_ref)):
        if int32_taps:
            # Per-channel (tap-shared) scales: the nine shifted tap adds run
            # in int32 and the layer dequantises ONCE — removes the per-chunk
            # f32 mult + bf16 cast VPU passes of the per-column schedule.
            # Overflow-safe: |y| ≤ 127²·288 per tap, ×9 ≈ 4.2e7 « 2³¹.
            acci = jnp.zeros((hh, ww, GROWTH), jnp.int32)
            for outer in range(3):
                y = matmul(w_ref, 3 * outer * GROWTH, (3 * outer + 3) * GROWTH)
                if dx_major:
                    ysub = y[:, outer : outer + ww, :]
                    for dy in range(3):
                        acci = acci + ysub[
                            dy : dy + hh, :, dy * GROWTH : (dy + 1) * GROWTH
                        ]
                else:
                    for dx in range(3):
                        acci = acci + y[
                            outer : outer + hh, dx : dx + ww,
                            dx * GROWTH : (dx + 1) * GROWTH,
                        ]
            dq = dq_ref[i : i + 1, :GROWTH]  # tap-shared per-channel scales
            acc = acci.astype(jnp.float32) * dq.reshape(1, 1, GROWTH)
        else:
            acc = jnp.zeros((hh, ww, GROWTH), jnp.float32)
            # `outer` iterates dy (dy-major packing) or dx (dx-major packing).
            for outer in range(3):
                y = matmul(w_ref, 3 * outer * GROWTH, (3 * outer + 3) * GROWTH)
                # Dequantise the whole 96-lane chunk ONCE (int32→f32 × per-col
                # scale → bf16), then do the nine shifted adds exactly like the
                # bf16 kernel — per-tap dequant during the adds measured
                # +3.5 ms/block of extra VPU converts.
                dq = dq_ref[i : i + 1, 3 * outer * GROWTH : (3 * outer + 3) * GROWTH]
                y = (y.astype(jnp.float32) * dq.reshape(1, 1, 3 * GROWTH)).astype(
                    jnp.bfloat16
                )
                if dx_major:
                    ysub = y[:, outer : outer + ww, :]
                    for dy in range(3):
                        acc = acc + ysub[
                            dy : dy + hh, :, dy * GROWTH : (dy + 1) * GROWTH
                        ].astype(jnp.float32)
                else:
                    for dx in range(3):
                        acc = acc + y[
                            outer : outer + hh, dx : dx + ww,
                            dx * GROWTH : (dx + 1) * GROWTH,
                        ].astype(jnp.float32)
        bias = meta_ref[0:1, i * GROWTH : (i + 1) * GROWTH].reshape(1, 1, GROWTH)
        f = jnp.maximum(acc + bias, 0.0)
        inv = meta_ref[3:4, i * GROWTH : (i + 1) * GROWTH].reshape(1, 1, GROWTH)
        q = jnp.clip(jnp.round(f * inv), -127.0, 127.0)
        ki = _layer_k(i, features)
        scratch[1 : 1 + hh, 1 : 1 + ww, ki : ki + GROWTH] = q.astype(scratch.dtype)
        zero_boundary_strips()

    lff = matmul(lw_ref).astype(jnp.float32)
    ldq = meta_ref[1:2, :features].reshape(1, 1, features)
    lbias = meta_ref[1:2, features : 2 * features].reshape(1, 1, features)
    s_in = meta_ref[2:3, :features].reshape(1, 1, features)
    x_in = (
        scratch[1 : 1 + hh, 1 : 1 + ww, FEAT_OFF : FEAT_OFF + features]
    ).astype(jnp.float32) * s_in
    out = (lff[1 : 1 + hh, 1 : 1 + ww, :] * ldq + lbias) * 0.2 + x_in
    tile = out[HALO : HALO + th, HALO : HALO + tw]
    if out_int8:
        # Next block's s_in, lane-replicated (row 2 of its meta).
        ns_in = nmeta_ref[2:3, :features].reshape(1, 1, features)
        tile = jnp.clip(jnp.round(tile / ns_in), -127.0, 127.0)
    out_ref[0] = tile.astype(out_ref.dtype)


def _rdb_int8_pallas(
    xq: jnp.ndarray,
    qblock,
    nmeta: jnp.ndarray,
    out_dtype,
    th: int = 64,
    tw: int = 240,
    dx_major: bool | None = None,
    int32_taps: bool = False,
) -> jnp.ndarray:
    """One quantised RDB on an int8 NHWC (B, H, W, C) array."""
    b, h, w, c = xq.shape
    wq, dq, meta = qblock
    dx_major = DX_MAJOR_INT8 if dx_major is None else dx_major
    if dx_major:
        # Call-time repack (tiny arrays; constant-folded under jit): the
        # quantised artifact keeps the dy-major wire format.
        wq = [_permute_cols_dx(w) for w in wq[:NUM_LAYERS]] + list(wq[NUM_LAYERS:])
        dq = _permute_cols_dx(dq)
    out_int8 = out_dtype == jnp.int8
    th = max(th, 2 * HALO)
    tw = max(tw - tw % 8, 2 * HALO + (-(2 * HALO) % 8))
    nh = -(-h // th)
    nw = -(-w // tw)

    pad_h = (nh + 1) * th - (h + HALO)
    pad_w = (nw + 1) * tw - (w + HALO)
    xp = jnp.pad(xq, ((0, 0), (HALO, pad_h), (HALO, pad_w), (0, 0)))

    kernel = functools.partial(
        _rdb_int8_kernel, th=th, tw=tw, features=c, img_h=h, img_w=w,
        nh_static=nh, nw_static=nw, out_int8=out_int8, dx_major=dx_major,
        int32_taps=int32_taps,
    )
    quad_spec = lambda sh, sw: pl.BlockSpec(  # noqa: E731
        (1, th, tw, c),
        lambda bi, hi, wi, sh=sh, sw=sw: (bi, hi + sh, wi + sw, 0),
        memory_space=pltpu.VMEM,
    )
    full_spec = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda bi, hi, wi: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )

    hh, ww = th + 2 * HALO, tw + 2 * HALO
    ph = hh + 2
    pw = ww + 2 + ((-(ww + 2)) % 8)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nh * th, nw * tw, c), out_dtype),
        grid=(b, nh, nw),
        in_specs=[quad_spec(0, 0), quad_spec(0, 1), quad_spec(1, 0), quad_spec(1, 1)]
        + [full_spec(p) for p in wq]
        + [full_spec(dq), full_spec(meta), full_spec(nmeta)],
        out_specs=pl.BlockSpec(
            (1, th, tw, c),
            lambda bi, hi, wi: (bi, hi, wi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((ph, pw, KPAD), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp, xp, xp, xp, *wq, dq, meta, nmeta)

    return out[:, :h, :w, :]


# --------------------------------------------------------------------------- #
# Chain entry points
# --------------------------------------------------------------------------- #
def rdb_chain_int8_pallas(
    x: jnp.ndarray, qchain, out_dtype=None, th: int = 64, tw: int = 240,
    dx_major: bool | None = None, int32_taps: bool = False,
) -> jnp.ndarray:
    """Quantised RDB chain on TPU: int8 end-to-end between blocks.

    ``qchain`` from :func:`quantize_rdb_chain`. The input is quantised once
    at block 0's input scale; every inter-block tensor is int8 in HBM; the
    final block dequantises to ``out_dtype`` (default: x.dtype).
    ``int32_taps`` requires a per-channel-quantised chain
    (``quantize_rdb_chain(..., per_channel=True)``).
    """
    out_dtype = out_dtype or x.dtype
    s_in0 = qchain[0][2][2, 0]
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s_in0), -127.0, 127.0
    ).astype(jnp.int8)
    n = len(qchain)
    for b, qblock in enumerate(qchain):
        last = b == n - 1
        nmeta = jnp.ones_like(qblock[2]) if last else qchain[b + 1][2]
        xq = _rdb_int8_pallas(
            xq, qblock, nmeta, out_dtype if last else jnp.int8, th=th, tw=tw,
            dx_major=dx_major, int32_taps=int32_taps,
        )
    return xq


def rdb_chain_int8_xla(x: jnp.ndarray, qchain, out_dtype=None,
                       int32_taps: bool = False) -> jnp.ndarray:
    """Bit-faithful XLA formulation of the int8 chain (CPU / testing).

    Mirrors the kernel's arithmetic exactly: int8 matmuls into int32,
    per-column f32 dequant, f32 epilogue, int8 requant — so interp-free
    parity tests of the Pallas kernel can run anywhere, and the quantised
    model's QUALITY (PSNR delta) can be measured off-TPU. ``int32_taps``
    mirrors the per-channel kernel schedule (int32 tap accumulation, one
    dequant per layer).
    """
    out_dtype = out_dtype or x.dtype
    features = x.shape[-1]
    num_layers, growth = chain_geometry(qchain)
    layer_k = lambda i: FEAT_OFF + features + growth * i  # noqa: E731
    s_in0 = qchain[0][2][2, 0]
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s_in0), -127.0, 127.0
    ).astype(jnp.int8)
    n = len(qchain)
    for b, (wq, dq, meta) in enumerate(qchain):
        bsz, h, w, _ = xq.shape
        # Dense concat in int8, zero-padded SAME convs via explicit padding.
        concat = jnp.zeros((bsz, h, w, layer_k(num_layers)), jnp.int8)
        concat = concat.at[..., FEAT_OFF : FEAT_OFF + features].set(xq)
        for i in range(num_layers):
            ki = layer_k(i)
            inp = concat[..., :ki]
            pad = jnp.pad(inp, ((0, 0), (1, 1), (1, 1), (0, 0)))
            if int32_taps:
                acci = jnp.zeros((bsz, h, w, growth), jnp.int32)
                for dy in range(3):
                    for dx in range(3):
                        c0 = (3 * dy + dx) * growth
                        shifted = pad[:, dy : dy + h, dx : dx + w, :]
                        acci = acci + lax.dot_general(
                            shifted.astype(jnp.int8),
                            wq[i][:, c0 : c0 + growth],
                            (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
                acc = acci.astype(jnp.float32) * dq[i, :growth]
            else:
                acc = jnp.zeros((bsz, h, w, growth), jnp.float32)
                for dy in range(3):
                    for dx in range(3):
                        c0 = (3 * dy + dx) * growth
                        shifted = pad[:, dy : dy + h, dx : dx + w, :]
                        yi = lax.dot_general(
                            shifted.astype(jnp.int8),
                            wq[i][:, c0 : c0 + growth],
                            (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
                        # bf16 round-trip mirrors the kernel's chunk dequant.
                        yb = (
                            yi.astype(jnp.float32) * dq[i, c0 : c0 + growth]
                        ).astype(jnp.bfloat16)
                        acc = acc + yb.astype(jnp.float32)
            bias = meta[0, i * growth : (i + 1) * growth]
            f = jnp.maximum(acc + bias, 0.0)
            q = jnp.clip(
                jnp.round(f * meta[3, i * growth : (i + 1) * growth]),
                -127.0, 127.0,
            )
            concat = concat.at[
                ..., ki : ki + growth
            ].set(q.astype(jnp.int8))
        lff = lax.dot_general(
            concat, wq[num_layers],
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        x_in = concat[..., FEAT_OFF : FEAT_OFF + features].astype(jnp.float32)
        out = (
            lff * meta[1, :features] + meta[1, features : 2 * features]
        ) * 0.2 + x_in * meta[2, 0]
        if b == n - 1:
            return out.astype(out_dtype)
        ninv = qchain[b + 1][2][2, 0]
        xq = jnp.clip(jnp.round(out / ninv), -127.0, 127.0).astype(jnp.int8)
    return xq.astype(out_dtype)  # pragma: no cover (n >= 1 always returns)


def rdb_chain_int8_apply(
    x: jnp.ndarray, qchain, use_pallas: bool | None = None, out_dtype=None
) -> jnp.ndarray:
    """Dispatch a pre-quantised chain (from :func:`quantize_rdb_chain`).

    The fused Pallas kernel is specialised to the reference's 5×32 block;
    any other geometry runs the (exact, generic) XLA int8 formulation.
    """
    from nerve_tpu.ops.dispatch import pallas_available

    if chain_geometry(qchain) != (NUM_LAYERS, GROWTH):
        use_pallas = False
    if use_pallas is None:
        use_pallas = pallas_available()
    if use_pallas:
        return rdb_chain_int8_pallas(
            x, qchain, out_dtype=out_dtype, int32_taps=PER_CHANNEL_INT8
        )
    return rdb_chain_int8_xla(
        x, qchain, out_dtype=out_dtype, int32_taps=PER_CHANNEL_INT8
    )


def rdb_chain_quantized_apply(
    x: jnp.ndarray, params_list, scales: jnp.ndarray,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """End-to-end: quantise the chain's weights (cheap; runs under jit) and
    apply the int8 chain. ``scales`` from :func:`calibrate_rdb_chain`."""
    from nerve_tpu.ops.dispatch import pallas_available

    qchain = quantize_rdb_chain(params_list, scales)
    if chain_geometry(qchain) != (NUM_LAYERS, GROWTH):
        use_pallas = False
    if use_pallas is None:
        use_pallas = pallas_available()
    if use_pallas:
        return rdb_chain_int8_pallas(x, qchain)
    return rdb_chain_int8_xla(x, qchain)
