"""int8 fused conv chains — extending the 394-TOPS path past the RDB stack.

Round-2 measured that int8 buys 1.22× on the fused RDB chain (28.5 vs
34.8 ms/block; docs/perf_notes.md) but the full model only gained +14 % e2e
because everything OUTSIDE the RDB stack stayed bf16 (VERDICT r3 weak #1 /
item #2). This module quantises the other fused conv stacks — the feature
head, flow chain, attention logits, gff and upsampler convs that
``nerve_tpu.ops.conv_chain`` serves in bf16.

Scheme (static PTQ, same family as ``nerve_tpu.ops.rdb_int8``):

  * **Activations** — per-tensor symmetric int8, STATIC scales from a
    calibration forward (:func:`calibrate_conv_chain`): one scale for the
    chain input, one per layer output.
  * **Weights** — per-COLUMN symmetric int8 on the packed (K_i, taps·Npad)
    tap matrix (``conv_chain`` packing). Because activation scales are
    per-tensor here (no dense concat mixing scales, unlike the RDB), the
    input scale folds into the per-column dequant factor instead of the
    weight rows: ``dq_col = s_in · max|w_col| / 127``.
  * **Biases** — exact f32 in the epilogue (meta row 1).
  * Per-layer epilogue mirrors the winning RDB schedule: dequantise each
    per-dy (3·Npad) int32 chunk ONCE to bf16, nine statically-shifted f32
    tap adds, + bias, act, requantise to int8 scratch. Final layer emits
    the caller's dtype.

Depthwise layers are NOT supported (no matmul to run at the 2× int8 MXU
rate — they are VPU broadcast-FMAs; the lightweight body stays bf16/XLA,
measured fastest in round 3). Chains must be 3×3/1×1 dense layers.

No reference analogue (nerve_cl serves f32 torch end to end).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerve_tpu.ops.conv_chain import (
    BIAS_SLOT,
    MIN_NOUT,
    _ceil_to,
    _chain_halo,
    _chain_xla,
    _layer_specs,
)


def _check_dense(specs):
    for kind, _cin, _cout, _act in specs:
        if kind == "dw3":
            raise ValueError(
                "int8 conv chains support dense 3x3/1x1 layers only "
                "(depthwise layers are VPU-bound; keep them bf16)"
            )


# --------------------------------------------------------------------------- #
# Calibration + quantisation
# --------------------------------------------------------------------------- #
def calibrate_conv_chain(x, params) -> jnp.ndarray:
    """Per-tensor activation scales from a calibration forward.

    ``x``: one array or a sequence (channel-concat inputs, as in
    ``conv_chain_apply``). Returns (1 + L,) f32: [s_in, s_y0, ..., s_y{L-1}]
    (max-abs / 127 of the chain input and each layer output, computed with
    the exact f32 XLA formulation).
    """
    ws = tuple(jnp.asarray(w, jnp.float32) for w, _b, _a in params)
    bs = tuple(jnp.asarray(b, jnp.float32) for _w, b, _a in params)
    acts = tuple(a for _w, _b, a in params)
    _check_dense(_layer_specs(ws, acts))
    if isinstance(x, (list, tuple)):
        x = jnp.concatenate([xx.astype(jnp.float32) for xx in x], axis=-1)
    else:
        x = x.astype(jnp.float32)
    maxes = [jnp.max(jnp.abs(x))]
    for i in range(len(ws)):
        x = _chain_xla(x, ws[i : i + 1], bs[i : i + 1], acts[i : i + 1])
        maxes.append(jnp.max(jnp.abs(x)))
    # Clamp: an all-zero activation (e.g. a zero-initialised layer before
    # training) must not produce a 0 scale → inf requant → NaN epilogues.
    return jnp.maximum(jnp.stack(maxes), 1e-12) / 127.0


def quantize_conv_chain(params, scales: jnp.ndarray):
    """f32 chain params + act scales → per-layer (wq, meta) + specs.

    Per layer i (taps t_i ∈ {9, 1}, Npad = cout padded to MIN_NOUT lanes):
      wq_i:   int8 (BIAS_SLOT + cin, t_i·Npad) packed tap matrix
              (conv_chain layout; BIAS_SLOT leading zero rows keep the
              scratch slot arithmetic identical to the bf16 kernel).
      meta_i: (8, t_i·Npad) f32 —
              row 0 = per-column dequant (s_in_i folded in),
              row 1 = bias (first Npad) | 0,
              row 2 = requant 1/s_out_i replicated (first Npad),
              row 3 = s_out_i replicated (reserved; the final layer is
                      already real-valued after row-0 dequant + bias).
    Returns (qlayers, s_in, acts) with s_in = scales[0] (the chain-input
    quantisation scale).
    """
    ws = tuple(jnp.asarray(w, jnp.float32) for w, _b, _a in params)
    bs = tuple(jnp.asarray(b, jnp.float32) for _w, b, _a in params)
    acts = tuple(a for _w, _b, a in params)
    specs = _layer_specs(ws, acts)
    _check_dense(specs)
    scales = jnp.asarray(scales, jnp.float32)
    qlayers = []
    for i, (w, b) in enumerate(zip(ws, bs)):
        kh, kw, cin, cout = w.shape
        taps = kh * kw
        npad = max(_ceil_to(cout, MIN_NOUT), MIN_NOUT)
        ki = BIAS_SLOT + cin
        wp = jnp.pad(w, ((0, 0), (0, 0), (BIAS_SLOT, 0), (0, npad - cout)))
        wcat = jnp.transpose(wp, (2, 0, 1, 3)).reshape(ki, taps * npad)
        col = jnp.maximum(jnp.max(jnp.abs(wcat), axis=0), 1e-12) / 127.0
        wq = jnp.clip(jnp.round(wcat / col), -127, 127).astype(jnp.int8)
        meta = jnp.zeros((8, taps * npad), jnp.float32)
        meta = meta.at[0].set(col * scales[i])          # dq (s_in folded)
        meta = meta.at[1, :cout].set(b)                 # bias
        meta = meta.at[2, :npad].set(1.0 / scales[i + 1])  # requant
        meta = meta.at[3, :npad].set(scales[i + 1])     # final dequant
        qlayers.append((wq, meta))
    return tuple(qlayers), scales[0], acts


# --------------------------------------------------------------------------- #
# Kernel
# --------------------------------------------------------------------------- #
def _chain_int8_kernel(*refs, th, tw, layer_shapes, acts, out_cout, halo,
                       img_h, img_w, nh_static, nw_static, cins):
    """refs = 4·len(cins) input quads, L wq refs, L meta refs, out_ref,
    scr_a, scr_b. ``layer_shapes``: static [(taps, cin, cout, npad)].
    Structure mirrors conv_chain._chain_kernel with int8 scratch."""
    nl = len(layer_shapes)
    nin = len(cins)
    quad_refs = refs[: 4 * nin]
    w_refs = refs[4 * nin : 4 * nin + nl]
    m_refs = refs[4 * nin + nl : 4 * nin + 2 * nl]
    out_ref = refs[4 * nin + 2 * nl]
    scr_a, scr_b = refs[4 * nin + 2 * nl + 1 :]
    hh, ww = th + 2 * halo, tw + 2 * halo
    ph = hh + 2
    pw = ww + 2 + ((-(ww + 2)) % 8)
    m = ph * pw

    step0 = (
        (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    )

    @pl.when(step0)
    def _init():
        scr_a[...] = jnp.zeros(scr_a.shape, scr_a.dtype)
        scr_b[...] = jnp.zeros(scr_b.shape, scr_b.dtype)

    hi, wi = pl.program_id(1), pl.program_id(2)

    def zero_boundary_strips(dst, cap):
        @pl.when(hi == 0)
        def _top():
            dst[1 : 1 + halo, :, :] = jnp.zeros((halo, pw, cap), dst.dtype)

        @pl.when(wi == 0)
        def _left():
            dst[:, 1 : 1 + halo, :] = jnp.zeros((ph, halo, cap), dst.dtype)

        for gi in range(max(nh_static - 2, 0), nh_static):
            off = img_h + halo - gi * th
            if off < hh:
                @pl.when(hi == gi)
                def _bot(off=off):
                    dst[1 + off : 1 + hh, :, :] = jnp.zeros(
                        (hh - off, pw, cap), dst.dtype
                    )
        for gj in range(max(nw_static - 2, 0), nw_static):
            off = img_w + halo - gj * tw
            if off < ww:
                @pl.when(wi == gj)
                def _right(off=off):
                    dst[:, 1 + off : 1 + ww, :] = jnp.zeros(
                        (ph, ww - off, cap), dst.dtype
                    )

    off = BIAS_SLOT
    for ii, ci in enumerate(cins):
        b00, b01, b10, b11 = quad_refs[4 * ii : 4 * ii + 4]
        f0, f1 = off, off + ci
        scr_a[1 : 1 + th, 1 : 1 + tw, f0:f1] = b00[0]
        scr_a[1 : 1 + th, 1 + tw : 1 + ww, f0:f1] = b01[0, :, : ww - tw]
        scr_a[1 + th : 1 + hh, 1 : 1 + tw, f0:f1] = b10[0, : hh - th]
        scr_a[1 + th : 1 + hh, 1 + tw : 1 + ww, f0:f1] = b11[0, : hh - th, : ww - tw]
        off += ci

    src = scr_a
    for li, ((taps, cin, cout, npad), w_ref, m_ref) in enumerate(
        zip(layer_shapes, w_refs, m_refs)
    ):
        k = BIAS_SLOT + cin

        def matmul(n0, n1, w_ref=w_ref):
            x = src[:, :, :k].reshape(m, k)
            y = lax.dot_general(
                x, w_ref[:, n0:n1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return y.reshape(ph, pw, n1 - n0)

        if taps == 9:
            acc = jnp.zeros((hh, ww, npad), jnp.float32)
            for dy in range(3):
                y = matmul(3 * dy * npad, (3 * dy + 3) * npad)
                dq = m_ref[0:1, 3 * dy * npad : (3 * dy + 3) * npad]
                y = (y.astype(jnp.float32) * dq.reshape(1, 1, 3 * npad)).astype(
                    jnp.bfloat16
                )
                for dx in range(3):
                    acc = acc + y[
                        dy : dy + hh, dx : dx + ww, dx * npad : (dx + 1) * npad
                    ].astype(jnp.float32)
        else:
            y = matmul(0, npad)[1 : 1 + hh, 1 : 1 + ww]
            dq = m_ref[0:1, :npad]
            acc = (y.astype(jnp.float32) * dq.reshape(1, 1, npad)).astype(
                jnp.bfloat16
            ).astype(jnp.float32)
        bias = m_ref[1:2, :npad].reshape(1, 1, npad)
        acc = acc + bias
        if acts[li] == "relu":
            acc = jnp.maximum(acc, 0.0)
        if li == nl - 1:
            # acc is already real-valued (per-column dq folds s_in; bias is
            # exact f32) — the final layer just crops and casts.
            out_ref[0] = acc[
                halo : halo + th, halo : halo + tw, :out_cout
            ].astype(out_ref.dtype)
        else:
            inv = m_ref[2:3, :npad].reshape(1, 1, npad)
            q = jnp.clip(jnp.round(acc * inv), -127.0, 127.0)
            dst = scr_b if src is scr_a else scr_a
            dst[1 : 1 + hh, 1 : 1 + ww, BIAS_SLOT : BIAS_SLOT + cout] = q[
                :, :, :cout
            ].astype(dst.dtype)
            zero_boundary_strips(dst, dst.shape[-1])
            src = dst


def conv_chain_int8_pallas(
    x, qchain, out_cout: int, out_dtype=None,
    th: int = 32, tw: int = 240,
) -> jnp.ndarray:
    """Fused int8 chain on TPU. ``qchain`` from :func:`quantize_conv_chain`;
    ``out_cout``: the final layer's true channel count."""
    qlayers, s_in, acts = qchain
    if isinstance(x, (list, tuple)):
        xs = list(x)
    else:
        xs = [x]
    out_dtype = out_dtype or xs[0].dtype
    b, h, w, _ = xs[0].shape
    cins = [xx.shape[-1] for xx in xs]

    # Static layer geometry from the packed shapes.
    layer_shapes = []
    cin = sum(cins)
    for i, (wq, _meta) in enumerate(qlayers):
        k_cin = wq.shape[0] - BIAS_SLOT
        assert k_cin == cin, (k_cin, cin)
        cout = (
            qlayers[i + 1][0].shape[0] - BIAS_SLOT
            if i + 1 < len(qlayers) else out_cout
        )
        npad = max(_ceil_to(cout, MIN_NOUT), MIN_NOUT)
        taps = wq.shape[1] // npad
        assert taps in (1, 9), (wq.shape, npad)
        layer_shapes.append((taps, cin, cout, npad))
        cin = cout
    halo = max(sum(1 for t, *_ in layer_shapes if t == 9), 1)

    # Quantise the input once (in-graph; fuses with the producer).
    xqs = [
        jnp.clip(
            jnp.round(xx.astype(jnp.float32) / s_in), -127.0, 127.0
        ).astype(jnp.int8)
        for xx in xs
    ]

    th = min(th, _ceil_to(h, 8))
    tw = min(tw, _ceil_to(w, 8))
    th = max(th, 2 * halo)
    tw = max(tw - tw % 8, _ceil_to(2 * halo, 8))
    nh = -(-h // th)
    nw = -(-w // tw)
    pad_h = (nh + 1) * th - (h + halo)
    pad_w = (nw + 1) * tw - (w + halo)
    xps = [
        jnp.pad(xx, ((0, 0), (halo, pad_h), (halo, pad_w), (0, 0)))
        for xx in xqs
    ]

    ca = max([sum(cins)] + [s[2] for i, s in enumerate(layer_shapes[:-1])
                            if i % 2 == 1])
    cb = max([s[2] for i, s in enumerate(layer_shapes[:-1]) if i % 2 == 0]
             or [8])
    ca = _ceil_to(BIAS_SLOT + ca, 128)
    cb = _ceil_to(BIAS_SLOT + cb, 128)
    hh, ww = th + 2 * halo, tw + 2 * halo
    ph = hh + 2
    pw = ww + 2 + ((-(ww + 2)) % 8)

    kernel = functools.partial(
        _chain_int8_kernel, th=th, tw=tw, layer_shapes=tuple(layer_shapes),
        acts=tuple(acts), out_cout=out_cout, halo=halo, img_h=h, img_w=w,
        nh_static=nh, nw_static=nw, cins=tuple(cins),
    )
    quad = lambda ci, sh, sw: pl.BlockSpec(  # noqa: E731
        (1, th, tw, ci),
        lambda bi, hi, wi, sh=sh, sw=sw: (bi, hi + sh, wi + sw, 0),
        memory_space=pltpu.VMEM,
    )
    full = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda bi, hi, wi: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    in_specs = []
    operands = []
    for xx, ci in zip(xps, cins):
        in_specs += [quad(ci, 0, 0), quad(ci, 0, 1), quad(ci, 1, 0), quad(ci, 1, 1)]
        operands += [xx, xx, xx, xx]
    in_specs += [full(wq) for wq, _ in qlayers]
    in_specs += [full(meta) for _, meta in qlayers]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nh * th, nw * tw, out_cout), out_dtype),
        grid=(b, nh, nw),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th, tw, out_cout),
            lambda bi, hi, wi: (bi, hi, wi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((ph, pw, ca), jnp.int8),
            pltpu.VMEM((ph, pw, cb), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*operands, *[wq for wq, _ in qlayers], *[meta for _, meta in qlayers])

    return out[:, :h, :w, :]


def conv_chain_int8_apply(
    x, qchain, out_cout: int, use_pallas: bool | None = None,
    out_dtype=None, th: int = 32, tw: int = 240,
) -> jnp.ndarray:
    """Dispatch a pre-quantised conv chain (Pallas on TPU, XLA elsewhere)."""
    from nerve_tpu.ops.dispatch import pallas_available

    if use_pallas is None:
        use_pallas = pallas_available()
    if use_pallas:
        return conv_chain_int8_pallas(
            x, qchain, out_cout, out_dtype=out_dtype, th=th, tw=tw
        )
    qlayers, s_in, acts = qchain
    return conv_chain_int8_xla(x, qlayers, s_in, acts, out_cout, out_dtype)


def conv_chain_int8_xla(x, qlayers, s_in, acts, out_cout, out_dtype=None):
    """Bit-faithful XLA mirror of the kernel's arithmetic (CPU quality
    eval + interp-free kernel parity; same role as rdb_chain_int8_xla)."""
    if isinstance(x, (list, tuple)):
        x = jnp.concatenate(list(x), axis=-1)
    out_dtype = out_dtype or x.dtype
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s_in), -127.0, 127.0
    ).astype(jnp.int8)
    nl = len(qlayers)
    for i, (wq, meta) in enumerate(qlayers):
        cout = (
            qlayers[i + 1][0].shape[0] - BIAS_SLOT if i + 1 < nl else out_cout
        )
        npad = max(_ceil_to(cout, MIN_NOUT), MIN_NOUT)
        taps = wq.shape[1] // npad
        hh, ww = xq.shape[1], xq.shape[2]
        if taps == 9:
            pad = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros(xq.shape[:3] + (npad,), jnp.float32)
            for dy in range(3):
                c0_ = 3 * dy * npad
                rows = pad[:, dy : dy + hh, :, :]
                yi = lax.dot_general(
                    rows, wq[BIAS_SLOT:, c0_ : c0_ + 3 * npad],
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                yb = (
                    yi.astype(jnp.float32) * meta[0, c0_ : c0_ + 3 * npad]
                ).astype(jnp.bfloat16)
                for dx in range(3):
                    acc = acc + yb[
                        :, :, dx : dx + ww, dx * npad : (dx + 1) * npad
                    ].astype(jnp.float32)
        else:
            yi = lax.dot_general(
                xq, wq[BIAS_SLOT:], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = (yi.astype(jnp.float32) * meta[0]).astype(
                jnp.bfloat16
            ).astype(jnp.float32)
        acc = acc + meta[1, :npad]
        if acts[i] == "relu":
            acc = jnp.maximum(acc, 0.0)
        if i == nl - 1:
            return acc[..., :out_cout].astype(out_dtype)
        xq = jnp.clip(
            jnp.round(acc[..., :cout] * meta[2, 0]), -127.0, 127.0
        ).astype(jnp.int8)
    raise AssertionError("unreachable")
