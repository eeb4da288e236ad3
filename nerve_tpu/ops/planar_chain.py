"""Planar (channels-major) fused conv chains — the thin-channel companion
to nerve_tpu.ops.conv_chain.

Why a second chain kernel exists (measured on v5e, 2026-08-19,
docs/perf_notes.md round 3): the channels-on-lanes kernel in
``conv_chain`` pads every output to ≥64 matmul lanes and runs VPU tap work
on C/128 of the lane width — at the lightweight model's 32 channels that
wastes ≥4× VPU throughput, and the fused launch measured 52-61 ms/frame
against ~14 ms for plain XLA. XLA in turn runs depthwise convs at
0.5 TF/s (memory-bound HBM round-trips between every layer). This kernel
takes the third layout: **W on lanes, rows on sublanes, channels on the
major axis**, so every elementwise/tap op uses all 128 lanes regardless of
channel count, intermediates stay in VMEM across the whole chain, and
channel mixes are (Cout, K)·(K, M) matmuls whose output needs NO lane
padding (output channels land on the major axis).

Formulation per layer over a full-extent (C, P, L) tile (P rows ≥ tile
rows + 2·halo, L lanes = tile cols + 2·halo, both hardware-aligned):

  * dense 3×3 (kind "3x3"): build ONE dy-stacked operand
    (3C+1, P, L) — slot dy·C+c holds the source channel c shifted by
    dy−1 rows, plus a constant-ones row so biases ride the matmul —
    reshape to (3C+1, P·L) (legal: P%8 == 0, L%128 == 0), then THREE
    (Cout, 3C+1)·(3C+1, M) matmuls, one per dx, whose f32 outputs are
    lane-rolled by 1−dx (pltpu.roll) and summed. Bias is folded into the
    dx=1 (no-roll) weight chunk's ones-row.
  * pointwise 1×1 ("1x1"): one (Cout, C+1)·(C+1, M) matmul on the
    ones-augmented source — no shifts at all.
  * depthwise 3×3 ("dw3"): nine tap FMAs w[c,tap]·roll(src, rows, cols)
    with the per-channel tap weight broadcast from the major axis —
    full-lane-width VPU streaming, the thing NHWC layouts cannot do for
    thin channels.

Out-of-image SAME-conv semantics use the same between-layer halo-strip
zeroing contract as nerve_tpu.ops.rdb / conv_chain (rolled-in wrap columns
land in the halo region and are re-zeroed before the next layer reads
them). Gradients differentiate the mathematically-identical XLA
formulation via custom VJP, like conv_chain.

Reference parity target: DepthwiseSeparableConv bodies
(nerve_cl/models/super_resolution.py:22-54, :434-470); this kernel is the
serving path for LightweightSuperResolution and FeatureExtractor.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerve_tpu.ops.conv_chain import _chain_halo, _chain_xla, _layer_specs


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _roll(x, shift: int, axis: int):
    """pltpu.roll with negative shifts mapped to their positive modulus
    (the primitive requires shift ≥ 0), routed through f32 for 16-bit
    data: Mosaic's rotate is "not implemented: Rotate with non-32-bit
    data" (hardware lowering, 2026-08-19 — interpret mode does NOT
    enforce this)."""
    if jnp.dtype(x.dtype).itemsize == 4:
        return pltpu.roll(x, shift % x.shape[axis], axis)
    return pltpu.roll(
        x.astype(jnp.float32), shift % x.shape[axis], axis
    ).astype(x.dtype)


def _pack_planar_weights(ws, bs, specs):
    """Per layer:

    * "3x3": (3, Cout, 3·Cin+1) — [dx][co][dy·Cin+ci] = w[dy, dx, ci, co],
      bias in the dx=1 chunk's last (ones) column.
    * "1x1": (Cout, Cin+1) with bias in the last column.
    * "dw3": (16, C) tap rows (row 3·dy+dx), bias on row 9 (pad to 16
      sublanes).
    """
    packed = []
    for w, b, (kind, cin, cout, _act) in zip(ws, bs, specs):
        if kind == "dw3":
            wd = w.reshape(9, cin)
            wd = jnp.concatenate(
                [wd, b[None, :], jnp.zeros((6, cin), w.dtype)], axis=0
            )
            packed.append(wd.astype(w.dtype))
        elif kind == "3x3":
            # w: (3, 3, cin, cout) → (dx, cout, dy·cin) + ones column.
            wt = jnp.transpose(w, (1, 3, 0, 2)).reshape(3, cout, 3 * cin)
            ones_col = jnp.zeros((3, cout, 1), w.dtype)
            ones_col = ones_col.at[1, :, 0].set(b.astype(w.dtype))
            packed.append(jnp.concatenate([wt, ones_col], axis=2).astype(w.dtype))
        else:  # 1x1
            wt = jnp.transpose(w[0, 0], (1, 0))  # (cout, cin)
            packed.append(
                jnp.concatenate([wt, b[:, None].astype(w.dtype)], axis=1)
            )
    return packed


def _planar_kernel(*refs, th: int, tw: int, specs, halo: int,
                   img_h: int, img_w: int, nh_static: int, nw_static: int,
                   cin0: int, out_cout: int, p_rows: int, l_cols: int):
    """refs = 4 quad input blocks, L weight refs, out_ref, scr_a, scr_b.

    Buffers are (C, P, L): channels major, rows on sublanes, cols on lanes.
    Compute is full-extent; the valid interior shrinks by one ring per
    3×3-support layer and the final crop takes the center (th, tw).
    """
    nl = len(specs)
    b00, b01, b10, b11 = refs[:4]
    w_refs = refs[4 : 4 + nl]
    out_ref = refs[4 + nl]
    scr_a, scr_b = refs[4 + nl + 1 :]
    hh, ww = th + 2 * halo, tw + 2 * halo
    P, L = p_rows, l_cols

    hi, wi = pl.program_id(1), pl.program_id(2)
    step0 = (pl.program_id(0) == 0) & (hi == 0) & (wi == 0)

    @pl.when(step0)
    def _init():
        scr_a[...] = jnp.zeros(scr_a.shape, scr_a.dtype)
        scr_b[...] = jnp.zeros(scr_b.shape, scr_b.dtype)

    def zero_boundary_strips(dst):
        cap = dst.shape[0]
        # SAME convs re-pad zeros at the true image edge before every
        # layer; out-of-image halo values (and lane-roll wrap columns,
        # which only ever land in the halo) are re-zeroed between layers.
        # Full-extent strip stores under pl.when, as in ops/rdb.py.
        @pl.when(hi == 0)
        def _top():
            dst[:, :halo, :] = jnp.zeros((cap, halo, L), dst.dtype)

        @pl.when(wi == 0)
        def _left():
            dst[:, :, :halo] = jnp.zeros((cap, P, halo), dst.dtype)

        for gi in range(max(nh_static - 2, 0), nh_static):
            off = img_h + halo - gi * th
            if off < P:
                @pl.when(hi == gi)
                def _bot(off=off):
                    dst[:, off:, :] = jnp.zeros((cap, P - off, L), dst.dtype)
        for gj in range(max(nw_static - 2, 0), nw_static):
            off = img_w + halo - gj * tw
            if off < L:
                @pl.when(wi == gj)
                def _right(off=off):
                    dst[:, :, off:] = jnp.zeros((cap, P, L - off), dst.dtype)

    # Assemble the halo window from the 2×2 block neighbourhood (quad
    # blocks are (1, C, th, tw) at grid offsets (hi|hi+1, wi|wi+1)).
    scr_a[:cin0, :th, :tw] = b00[0]
    scr_a[:cin0, :th, tw:ww] = b01[0, :, :, : ww - tw]
    scr_a[:cin0, th:hh, :tw] = b10[0, :, : hh - th]
    scr_a[:cin0, th:hh, tw:ww] = b11[0, :, : hh - th, : ww - tw]
    if hh < P:
        scr_a[:cin0, hh:, :] = jnp.zeros((cin0, P - hh, L), scr_a.dtype)
    if ww < L:
        scr_a[:cin0, :, ww:] = jnp.zeros((cin0, P, L - ww), scr_a.dtype)
    zero_boundary_strips(scr_a)

    src, dst = scr_a, scr_b
    for li, ((kind, cin, cout, act), w_ref) in enumerate(zip(specs, w_refs)):
        # "dw3" never reaches the kernel: _expand_dw_to_dense rewrites
        # depthwise layers to diagonal dense 3×3s (Mosaic cannot broadcast
        # a (C,) tap vector over a (C, P, L) planar block).
        if kind == "3x3":
            # dy-stacked ones-augmented operand: (3·cin+1, P, L).
            k = 3 * cin + 1
            x = src[:cin]
            stk_rows = [
                _roll(x, 1 - dy, 1) if dy != 1 else x for dy in range(3)
            ]
            stacked = jnp.concatenate(
                stk_rows + [jnp.ones((1, P, L), src.dtype)], axis=0
            )
            rhs = stacked.reshape(k, P * L)
            acc = jnp.zeros((cout, P, L), jnp.float32)
            for dx in range(3):
                y = lax.dot_general(
                    w_ref[dx], rhs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(cout, P, L)
                acc = acc + (_roll(y, 1 - dx, 2) if dx != 1 else y)
        else:  # 1x1
            x = src[:cin]
            stacked = jnp.concatenate(
                [x, jnp.ones((1, P, L), src.dtype)], axis=0
            )
            rhs = stacked.reshape(cin + 1, P * L)
            acc = lax.dot_general(
                w_ref[:], rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(cout, P, L)
        if act == "relu":
            acc = jnp.maximum(acc, 0.0)
        if li == nl - 1:
            out_ref[0] = acc[
                :out_cout, halo : halo + th, halo : halo + tw
            ].astype(out_ref.dtype)
        else:
            dst[:cout] = acc.astype(dst.dtype)
            zero_boundary_strips(dst)
            src, dst = dst, src


_VMEM_BUDGET = int(0.55 * 100 * 1024 * 1024)


def _est_planar_vmem(specs, cin0, th, tw, halo, dtype_bytes) -> int:
    """Conservative scoped-VMEM estimate, same philosophy/calibration as
    conv_chain._est_chain_vmem (sums per-stage temporaries; Mosaic does
    not reliably share unrolled-stage buffers)."""
    hh, ww = th + 2 * halo, tw + 2 * halo
    P = _ceil_to(hh, 16)
    L = _ceil_to(ww, 128)
    cap_a = max([cin0] + [s[2] for i, s in enumerate(specs[:-1]) if i % 2 == 1])
    cap_b = max([s[2] for i, s in enumerate(specs[:-1]) if i % 2 == 0] or [8])
    total = (cap_a + cap_b) * P * L * dtype_bytes  # ping-pong scratch
    for kind, cin, cout, _act in specs:
        if kind == "dw3":
            # f32 source copy + acc + one live rolled temp
            total += 3 * cin * P * L * 4
        elif kind == "3x3":
            # stacked (3cin+1) bf16 + acc f32 + one live matmul output f32
            total += (3 * cin + 1) * P * L * dtype_bytes
            total += 2 * cout * P * L * 4
        else:
            total += (cin + 1) * P * L * dtype_bytes + cout * P * L * 4
    total += 2 * 4 * cin0 * th * tw * dtype_bytes  # double-buffered quads
    total += 2 * specs[-1][2] * th * tw * dtype_bytes
    return total


def _fit_planar_tile(specs, cin0, th, tw, halo, dtype_bytes):
    th_min = max(_ceil_to(2 * halo, 8), 8)
    tw_min = max(_ceil_to(2 * halo, 128), 128)
    while _est_planar_vmem(specs, cin0, th, tw, halo, dtype_bytes) > _VMEM_BUDGET:
        if th > th_min:
            th = max(th - 8, th_min)
        elif tw > tw_min:
            tw = max(tw - 128, tw_min)
        else:
            break
    return th, tw


def _expand_dw_to_dense(ws, specs):
    """Depthwise 3×3 → diagonal dense 3×3 (w[dy,dx,c,c'] = dw[dy,dx,c]·δcc').

    Mosaic cannot broadcast a (C,) vector over sublanes+lanes of a
    (C, P, L) planar block ("unsupported shape cast" on
    vector<Cxf32> → vector<Cx1x1xf32>, hardware lowering 2026-08-19), so
    the per-channel tap-FMA formulation in the module docstring does not
    lower. Feeding the taps through the existing dy-stacked matmul path
    instead costs ~2·(3C+1)·C·3 FLOP/pixel on the MXU (~0.2 ms/layer at
    1080p C=32 — noise next to the VPU wall this kernel removes) and
    needs zero kernel-side special cases. The XLA path and the VJP keep
    true depthwise math.
    """
    out_ws, out_specs = [], []
    for w, (kind, cin, cout, act) in zip(ws, specs):
        if kind == "dw3":
            eye = jnp.eye(cin, dtype=w.dtype)
            out_ws.append(w[:, :, :, None] * eye[None, None])
            out_specs.append(("3x3", cin, cout, act))
        else:
            out_ws.append(w)
            out_specs.append((kind, cin, cout, act))
    return out_ws, out_specs


def _planar_pallas(x, ws, bs, acts, th: int = 32, tw: int = 960,
                   fit_vmem: bool = True, interpret: bool = False):
    """x: (B, C, H, W) planar. Returns (B, Cout, H, W)."""
    specs = _layer_specs(ws, acts)
    ws, specs = _expand_dw_to_dense(ws, specs)
    b, c, h, w = x.shape
    halo = max(_chain_halo(specs), 1)
    th = min(th, _ceil_to(h, 8))
    tw = min(tw, _ceil_to(w, 128))
    th = max(th, 2 * halo)
    tw = max(tw, _ceil_to(2 * halo, 128))
    # Block shapes (1, C, th, tw) put (th, tw) on the last two dims, which
    # Mosaic requires to be multiples of (8, 128).
    th = _ceil_to(th, 8)
    tw = _ceil_to(tw, 128)
    if fit_vmem:
        th, tw = _fit_planar_tile(
            specs, c, th, tw, halo, jnp.dtype(x.dtype).itemsize
        )
    nh = -(-h // th)
    nw = -(-w // tw)
    hh, ww = th + 2 * halo, tw + 2 * halo
    P = _ceil_to(hh, 16)
    L = _ceil_to(ww, 128)
    pad_h = (nh + 1) * th - (h + halo)
    pad_w = (nw + 1) * tw - (w + halo)
    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, pad_h), (halo, pad_w)))

    packed = _pack_planar_weights(
        [w_.astype(x.dtype) for w_ in ws], [b_.astype(x.dtype) for b_ in bs],
        specs,
    )
    out_cout = specs[-1][2]
    cap_a = max([c] + [s[2] for i, s in enumerate(specs[:-1]) if i % 2 == 1])
    cap_b = max([s[2] for i, s in enumerate(specs[:-1]) if i % 2 == 0] or [8])

    kernel = functools.partial(
        _planar_kernel, th=th, tw=tw, specs=specs, halo=halo,
        img_h=h, img_w=w, nh_static=nh, nw_static=nw, cin0=c,
        out_cout=out_cout, p_rows=P, l_cols=L,
    )
    quad = lambda sh, sw: pl.BlockSpec(  # noqa: E731
        (1, c, th, tw),
        lambda bi, hi, wi, sh=sh, sw=sw: (bi, 0, hi + sh, wi + sw),
        memory_space=pltpu.VMEM,
    )
    full = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda bi, hi, wi: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, out_cout, nh * th, nw * tw), x.dtype),
        grid=(b, nh, nw),
        in_specs=[quad(0, 0), quad(0, 1), quad(1, 0), quad(1, 1)]
        + [full(p) for p in packed],
        out_specs=pl.BlockSpec(
            (1, out_cout, th, tw),
            lambda bi, hi, wi: (bi, 0, hi, wi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((cap_a, P, L), x.dtype),
            pltpu.VMEM((cap_b, P, L), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, xp, xp, xp, *packed)
    return out[:, :, :h, :w]


def _planar_xla(x, ws, bs, acts):
    """Identical math on the planar layout via the NHWC XLA chain."""
    y = jnp.transpose(x, (0, 2, 3, 1))
    y = _chain_xla(y, ws, bs, acts)
    return jnp.transpose(y, (0, 3, 1, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def planar_chain_fused(acts, tile, x, ws, bs):
    """Fused planar conv chain: (B, C, H, W) → (B, Cout, H, W).
    ``tile`` = static (th, tw, fit_vmem)."""
    th, tw, fit = tile
    return _planar_pallas(x, ws, bs, acts, th=th, tw=tw, fit_vmem=fit)


def _pc_fwd(acts, tile, x, ws, bs):
    return planar_chain_fused(acts, tile, x, ws, bs), (x, ws, bs)


def _pc_bwd(acts, tile, res, g):
    x, ws, bs = res
    _, vjp = jax.vjp(lambda xx, ww, bb: _planar_xla(xx, ww, bb, acts), x, ws, bs)
    return vjp(g)


planar_chain_fused.defvjp(_pc_fwd, _pc_bwd)


def planar_chain_apply(
    x, params, use_pallas: bool | None = None,
    tile: Tuple[int, int] = (32, 384), fit_vmem: bool = True,
) -> jnp.ndarray:
    """Run a conv(+ReLU) chain on a planar (B, C, H, W) array.

    ``params``: sequence of (kernel, bias, act) — kernels in the SAME HWIO
    (kh, kw, cin, cout) / depthwise (3, 3, c) formats as conv_chain_apply,
    so BN-folded chains built for the NHWC kernel reuse unchanged.
    """
    ws = tuple(w for w, _b, _a in params)
    bs = tuple(b for _w, b, _a in params)
    acts = tuple(a for _w, _b, a in params)
    _layer_specs(ws, acts)
    if use_pallas is None:
        from nerve_tpu.ops.dispatch import pallas_available

        use_pallas = pallas_available() and x.dtype == jnp.bfloat16
    if use_pallas:
        return planar_chain_fused(acts, (tile[0], tile[1], fit_vmem), x, ws, bs)
    return _planar_xla(x, ws, bs, acts)
