"""Fused sequential conv chains — one VMEM-resident pass for conv stacks.

Motivation (profiled on v5e at 1080p, bf16): XLA runs every 3×3 conv with a
small output-channel count at a fraction of MXU peak — 64-out convs at
~13 TF/s, and a 3-out conv (the aggregator's attention logits,
nerve_cl/models/super_resolution.py:168-175) at ~30 ms because the
(H, W, 3) result takes a 128-lane-padded layout. Chains of such convs also
round-trip HBM between every layer.

This kernel runs an arbitrary chain of 3×3/1×1 convs (+ReLU) over spatial
tiles held in VMEM, with the same formulation as the fused RDB kernel
(nerve_tpu.ops.rdb):

  * channels on lanes, a constant-ones channel so biases fold into the
    matmuls;
  * each 3×3 conv = three per-dy (M, K)·(K, 3·Cout) matmuls whose dx-shifted
    tap blocks are accumulated in f32 on the VPU;
  * tiny output-channel counts are zero-padded to ≥64 matmul lanes INSIDE
    the kernel (the padding never touches HBM), so a 3-channel logits layer
    runs at 64-lane rates;
  * ping-pong channel regions inside one scratch buffer, full-extent
    compute with final center crop (halo = number of 3×3 layers).

Gradients: `conv_chain_fused` carries a custom VJP that differentiates the
mathematically-identical XLA formulation, so the fused forward is
drop-in for serving while training works everywhere.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIAS_SLOT = 8  # channel 0 carries ones; features start here
MIN_NOUT = 64  # pad tiny conv outputs up to this many matmul lanes

# Emit 3×3 matmul chunks in the scratch dtype directly (preferred_element_
# type) instead of f32 + explicit cast — DEAD END, do not enable: Mosaic
# rejects bf16 matmul accumulators on hardware ("'tpu.matmul' op Expected
# matmul acc to be 32-bit", measured 2026-08-19; see nerve_tpu.ops.rdb).
PET_CHUNKS = False


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _chain_halo(specs) -> int:
    return sum(1 for (kind, _cin, _cout, _act) in specs if kind in ("3x3", "dw3"))


def _layer_specs(ws, acts):
    """weights + acts → [(kind, cin, cout, act)] with validation.

    kind ∈ {"3x3", "1x1", "dw3"}; a rank-3 (3, 3, C) weight marks a
    DEPTHWISE 3×3 layer (groups == C, as in DepthwiseSeparableConv).
    """
    specs = []
    for w, act in zip(ws, acts):
        if w.ndim == 3:
            kh, kw, cin = w.shape
            if (kh, kw) != (3, 3):
                raise ValueError("depthwise conv_chain layers must be 3x3")
            specs.append(("dw3", cin, cin, act))
        else:
            kh, kw, cin, cout = w.shape
            if (kh, kw) not in ((3, 3), (1, 1)):
                raise ValueError(f"conv_chain supports 3x3/1x1 kernels, got {kh}x{kw}")
            specs.append(("3x3" if kh == 3 else "1x1", cin, cout, act))
        if act not in ("relu", "none"):
            raise ValueError(f"unknown activation {act!r}")
    for a, b in zip(specs, specs[1:]):
        if a[2] != b[1]:
            raise ValueError("conv_chain layer channel mismatch")
    return specs


def _pack_chain_weights(ws, bs):
    """Per layer: (K_i, taps·Npad) matmul matrix, bias folded into row 0
    (ones ch) — or, for depthwise layers, a (16, C) per-tap row matrix with
    the 9 taps on rows [0:9) and the bias on row 9 (sublane-padded to 16).
    """
    packed = []
    for w, b in zip(ws, bs):
        if w.ndim == 3:  # depthwise (3, 3, C)
            cin = w.shape[2]
            wd = w.reshape(9, cin)
            wd = jnp.concatenate(
                [wd, b[None, :], jnp.zeros((6, cin), w.dtype)], axis=0
            )
            packed.append(wd.astype(w.dtype))
            continue
        kh, kw, cin, cout = w.shape
        npad = max(_ceil_to(cout, MIN_NOUT), MIN_NOUT)
        ki = BIAS_SLOT + cin
        wp = jnp.pad(w, ((0, 0), (0, 0), (BIAS_SLOT, 0), (0, npad - cout)))
        wcat = jnp.transpose(wp, (2, 0, 1, 3)).reshape(ki, kh * kw * npad)
        center = (kh * kw) // 2
        wcat = wcat.at[0, center * npad : center * npad + cout].set(b)
        packed.append(wcat.astype(w.dtype))
    return packed


_VMEM_LIMIT = 100 * 1024 * 1024
# Mosaic does NOT share stack buffers across unrolled kernel stages (measured,
# docs/perf_notes.md "Gotchas"), so a deep chain's per-layer temporaries are
# all live at once for VMEM-assignment purposes. The estimator below under-
# counts small extras (relu copies, boundary-strip stores, window double
# buffering), so budget well under the limit: round 2's 10-layer lightweight
# whole-body chain at tile (64, 240) estimated ~81 MB here yet exceeded the
# 100 MB cap on hardware and killed the driver bench (BENCH_r02.json).
_VMEM_BUDGET = int(0.55 * _VMEM_LIMIT)


def _est_chain_vmem(specs, cins, out_cout, th, tw, halo,
                    dtype_bytes, pet_chunks) -> int:
    """Conservative scoped-VMEM estimate (bytes) for one _chain_kernel tile."""
    hh, ww = th + 2 * halo, tw + 2 * halo
    ph = hh + 2
    pw = ww + 2 + ((-(ww + 2)) % 8)
    ca = max([sum(cins)] + [s[2] for i, s in enumerate(specs[:-1]) if i % 2 == 1])
    cb = max([s[2] for i, s in enumerate(specs[:-1]) if i % 2 == 0] or [8])
    ca = _ceil_to(BIAS_SLOT + ca, 128)
    cb = _ceil_to(BIAS_SLOT + cb, 128)
    total = (ph * pw * (ca + cb)) * dtype_bytes  # persistent ping-pong scratch
    for kind, cin, cout, _act in specs:
        npad = max(_ceil_to(cout, MIN_NOUT), MIN_NOUT)
        if kind == "dw3":
            # f32 accumulator + shifted-tap read temporaries
            total += hh * ww * cin * 4 * 2
        elif kind == "3x3":
            y_bytes = dtype_bytes if pet_chunks else 4
            total += ph * pw * 3 * npad * y_bytes + hh * ww * npad * 4
        else:  # 1x1
            total += ph * pw * npad * 4
    # double-buffered input quads + output window
    total += 2 * 4 * th * tw * sum(cins) * dtype_bytes
    total += 2 * th * tw * out_cout * dtype_bytes
    return total


def _fit_chain_tile(specs, cins, out_cout, th, tw, halo,
                    dtype_bytes, pet_chunks) -> Tuple[int, int]:
    """Shrink (th, tw) until the estimated scoped VMEM fits the budget.

    Shrinks th first (cheaper: lanes/width drive VPU utilisation), then tw;
    both stay multiples of 8 and ≥ the halo-imposed minimum. Returns the
    request unchanged when it already fits.
    """
    th_min = max(_ceil_to(2 * halo, 8), 8)
    tw_min = max(_ceil_to(2 * halo, 8), 8)
    while _est_chain_vmem(specs, cins, out_cout, th, tw, halo,
                          dtype_bytes, pet_chunks) > _VMEM_BUDGET:
        if th > th_min:
            th = max(th - 8, th_min)
        elif tw > tw_min:
            tw = max(tw - 8, tw_min)
        else:
            break  # minimum tile; let Mosaic be the final arbiter
    return th, tw


def _chain_kernel(*refs, th: int, tw: int, specs, out_cout: int, halo: int,
                  img_h: int, img_w: int, nh_static: int, nw_static: int,
                  cins, pet_chunks: bool = False):
    """refs = 4·len(cins) quad blocks, L weight refs, out_ref, scratches.

    ``cins``: per-input channel counts — multiple inputs are concatenated
    ON THE FLY into adjacent channel slots of scratch A (the fused
    equivalent of a channel concat feeding the chain: no concatenated
    tensor ever exists in HBM).
    """
    nl = len(specs)
    nin = len(cins)
    quad_refs = refs[: 4 * nin]
    w_refs = refs[4 * nin : 4 * nin + nl]
    out_ref = refs[4 * nin + nl]
    scr_a, scr_b = refs[4 * nin + nl + 1 :]
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

    # Ones channels re-written EVERY tile: boundary-strip zeroing below wipes
    # them for whichever tile uses the scratch next.
    scr_a[:, :, 0:1] = jnp.ones((ph, pw, 1), scr_a.dtype)
    scr_b[:, :, 0:1] = jnp.ones((ph, pw, 1), scr_b.dtype)

    # Valid-image mask: SAME convs re-pad zeros at the true image boundary
    # before EVERY layer; intermediate halo values computed over the padding
    # must be zeroed or later taps consume relu(bias) garbage there (see the
    # identical fix in nerve_tpu.ops.rdb).
    hi, wi = pl.program_id(1), pl.program_id(2)

    def zero_boundary_strips(dst, cap):
        # Out-of-image halo strips must be re-zeroed between layers (SAME
        # convs re-pad zeros at the true image edge each layer). Full-lane
        # pl.when-guarded stores — whole-tile masks measured ~3 ms/layer at
        # 1080p (see nerve_tpu.ops.rdb for the measurement history). Zeroing
        # all lanes is safe: the input-feature slots at those positions are
        # already zero (wrapper padding) and the ones channel is re-written
        # per tile below.
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
                    dst[1 + off : 1 + hh, :, :] = jnp.zeros((hh - off, pw, cap), dst.dtype)
        for gj in range(max(nw_static - 2, 0), nw_static):
            off = img_w + halo - gj * tw
            if off < ww:
                @pl.when(wi == gj)
                def _right(off=off):
                    dst[:, 1 + off : 1 + ww, :] = jnp.zeros((ph, ww - off, cap), dst.dtype)

    off = BIAS_SLOT
    for ii, ci in enumerate(cins):
        b00_ref, b01_ref, b10_ref, b11_ref = quad_refs[4 * ii : 4 * ii + 4]
        f0, f1 = off, off + ci
        scr_a[1 : 1 + th, 1 : 1 + tw, f0:f1] = b00_ref[0]
        scr_a[1 : 1 + th, 1 + tw : 1 + ww, f0:f1] = b01_ref[0, :, : ww - tw]
        scr_a[1 + th : 1 + hh, 1 : 1 + tw, f0:f1] = b10_ref[0, : hh - th]
        scr_a[1 + th : 1 + hh, 1 + tw : 1 + ww, f0:f1] = b11_ref[0, : hh - th, : ww - tw]
        off += ci

    def matmul(src, k, w_ref, n0, n1, out_dtype=jnp.float32):
        x = src[:, :, :k].reshape(m, k)
        y = lax.dot_general(
            x, w_ref[:, n0:n1], (((1,), (0,)), ((), ())),
            preferred_element_type=out_dtype,
        )
        return y.reshape(ph, pw, n1 - n0)

    src = scr_a
    for li, ((kind, cin, cout, act), w_ref) in enumerate(zip(specs, w_refs)):
        npad = max(_ceil_to(cout, MIN_NOUT), MIN_NOUT)
        k = BIAS_SLOT + cin
        if kind == "dw3":
            # Depthwise 3×3: nine shifted broadcast-FMAs on the VPU — the
            # per-tap (C,) weight row broadcasts over rows/cols; MXU is not
            # involved (XLA runs these at 0.5 TF/s, memory-bound; in VMEM
            # they are pure streaming adds). Bias on packed row 9.
            acc = jnp.zeros((hh, ww, cin), jnp.float32) + w_ref[9, :cin].astype(
                jnp.float32
            )
            xsrc = src[:, :, BIAS_SLOT : BIAS_SLOT + cin]
            for dy in range(3):
                for dx in range(3):
                    tap = w_ref[3 * dy + dx, :cin].astype(jnp.float32)
                    acc = acc + (
                        xsrc[dy : dy + hh, dx : dx + ww, :].astype(jnp.float32) * tap
                    )
            npad = cin
        elif kind == "3x3":
            acc = jnp.zeros((hh, ww, npad), jnp.float32)
            for dy in range(3):
                if pet_chunks:
                    y = matmul(src, k, w_ref, 3 * dy * npad, (3 * dy + 3) * npad,
                               out_dtype=src.dtype)
                else:
                    y = matmul(src, k, w_ref, 3 * dy * npad, (3 * dy + 3) * npad)
                    y = y.astype(src.dtype)
                for dx in range(3):
                    acc = acc + y[
                        dy : dy + hh, dx : dx + ww, dx * npad : (dx + 1) * npad
                    ].astype(jnp.float32)
        else:
            acc = matmul(src, k, w_ref, 0, npad)[1 : 1 + hh, 1 : 1 + ww]
        if act == "relu":
            acc = jnp.maximum(acc, 0.0)
        if li == nl - 1:
            out_ref[0] = acc[
                halo : halo + th, halo : halo + tw, :out_cout
            ].astype(out_ref.dtype)
        else:
            dst = scr_b if src is scr_a else scr_a
            dst[1 : 1 + hh, 1 : 1 + ww, BIAS_SLOT : BIAS_SLOT + cout] = acc[
                :, :, :cout
            ].astype(dst.dtype)
            zero_boundary_strips(dst, dst.shape[-1])
            src = dst


def _chain_pallas(
    xs,
    ws,
    bs,
    acts,
    th: int = 32,
    tw: int = 120,
    pet_chunks: bool | None = None,
    fit_vmem: bool = True,
) -> jnp.ndarray:
    """``xs``: one array or a sequence (fused channel-concat, see kernel).

    ``fit_vmem=True`` (default, all production paths) auto-shrinks the tile
    to the scoped-VMEM budget; diagnostics pass False to sweep exact tiles.
    """
    pet_chunks = PET_CHUNKS if pet_chunks is None else pet_chunks
    if isinstance(xs, (list, tuple)):
        xs = list(xs)
    else:
        xs = [xs]
    specs = _layer_specs(ws, acts)
    b, h, w, _c0 = xs[0].shape
    cins = [xx.shape[-1] for xx in xs]
    c = sum(cins)
    x = xs[0]
    halo = max(_chain_halo(specs), 1)
    # Clamp the tile to the image so small inputs (engine recovery at 270p,
    # facade probes, 64² training crops) don't pay a 2×-tile padding wall.
    th = min(th, _ceil_to(h, 8))
    tw = min(tw, _ceil_to(w, 8))
    th = max(th, 2 * halo)
    tw = max(tw - tw % 8, _ceil_to(2 * halo, 8))
    if fit_vmem:
        th, tw = _fit_chain_tile(
            specs, cins, specs[-1][2], th, tw, halo,
            jnp.dtype(x.dtype).itemsize, pet_chunks,
        )
    nh = -(-h // th)
    nw = -(-w // tw)
    pad_h = (nh + 1) * th - (h + halo)
    pad_w = (nw + 1) * tw - (w + halo)
    xps = [
        jnp.pad(xx, ((0, 0), (halo, pad_h), (halo, pad_w), (0, 0))) for xx in xs
    ]

    packed = _pack_chain_weights(
        [w.astype(x.dtype) for w in ws], [bb.astype(x.dtype) for bb in bs]
    )
    out_cout = specs[-1][2]

    # Ping-pong channel capacities: A holds the input and every even layer's
    # output, B every odd layer's output.
    ca = max([c] + [s[2] for i, s in enumerate(specs[:-1]) if i % 2 == 1])
    cb = max([s[2] for i, s in enumerate(specs[:-1]) if i % 2 == 0] or [8])
    ca = _ceil_to(BIAS_SLOT + ca, 128)
    cb = _ceil_to(BIAS_SLOT + cb, 128)

    hh, ww = th + 2 * halo, tw + 2 * halo
    ph = hh + 2
    pw = ww + 2 + ((-(ww + 2)) % 8)

    kernel = functools.partial(
        _chain_kernel, th=th, tw=tw, specs=specs, out_cout=out_cout, halo=halo,
        img_h=h, img_w=w, nh_static=nh, nw_static=nw, cins=tuple(cins),
        pet_chunks=pet_chunks,
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
    in_specs += [full(p) for p in packed]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nh * th, nw * tw, out_cout), x.dtype),
        grid=(b, nh, nw),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th, tw, out_cout),
            lambda bi, hi, wi: (bi, hi, wi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((ph, pw, ca), x.dtype),
            pltpu.VMEM((ph, pw, cb), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*operands, *packed)

    return out[:, :h, :w, :]


def _chain_xla(x, ws, bs, acts) -> jnp.ndarray:
    """Reference XLA formulation — identical math, autodiff-friendly.

    The grouped conv (`feature_group_count=C`) IS the fastest depthwise
    formulation XLA has on this chip — both alternatives measured WORSE
    end-to-end on the 10-layer lightweight body @1080p (2026-08-19,
    scripts/diag_planar2.py; grouped-conv baseline 16.6 ms/frame):
      * nine shifted-slice FMAs with f32 accumulation: 59.7 ms — XLA
        materialises the intermediate sums instead of fusing the tap chain;
      * dense 3×3 with diagonal weights (w ⊗ δ_cc', MXU im2col at 32× the
        FLOPs): 23.7 ms — im2col traffic beats the relayout cost but loses
        to the native grouped path.
    """
    if isinstance(x, (list, tuple)):
        x = jnp.concatenate(list(x), axis=-1)
    for w, bias, act in zip(ws, bs, acts):
        if w.ndim == 3:  # depthwise (3, 3, C)
            c = w.shape[2]
            wd = w.astype(x.dtype)[:, :, None, :]  # (3,3,1,C) HWIO grouped
            dn = lax.conv_dimension_numbers(x.shape, wd.shape, ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(
                x, wd, (1, 1), "SAME", dimension_numbers=dn,
                feature_group_count=c,
            ).astype(jnp.float32) + bias.astype(jnp.float32)
        else:
            dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn
            ).astype(jnp.float32) + bias.astype(jnp.float32)
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        x = y.astype(x.dtype)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def conv_chain_fused(acts, tile, x, ws, bs) -> jnp.ndarray:
    """Fused conv chain: (B, H, W, Cin) [or an input tuple to concat] →
    (B, H, W, Cout_last). ``tile`` = static (th, tw, fit_vmem) — the tile
    request plus whether to auto-shrink it to the scoped-VMEM budget."""
    th, tw, fit = tile
    return _chain_pallas(x, ws, bs, acts, th=th, tw=tw, fit_vmem=fit)


def _cc_fwd(acts, tile, x, ws, bs):
    return conv_chain_fused(acts, tile, x, ws, bs), (x, ws, bs)


def _cc_bwd(acts, tile, res, g):
    x, ws, bs = res
    _, vjp = jax.vjp(lambda xx, ww, bb: _chain_xla(xx, ww, bb, acts), x, ws, bs)
    return vjp(g)


conv_chain_fused.defvjp(_cc_fwd, _cc_bwd)


def _auto_pallas(x: jnp.ndarray) -> bool:
    from nerve_tpu.ops.dispatch import pallas_available

    return pallas_available() and x.dtype == jnp.bfloat16


def conv_chain_apply(
    x, params, use_pallas: bool | None = None,
    tile: Tuple[int, int] = (32, 120),
    fit_vmem: bool = True,
) -> jnp.ndarray:
    """Run a conv(+ReLU) chain; fused on TPU bf16, XLA elsewhere.

    ``x``: one (B, H, W, Cin) array OR a sequence of them — a sequence is
    channel-concatenated inside the kernel (adjacent scratch slots; the
    concatenated tensor never exists in HBM).
    ``params``: sequence of (kernel (kh,kw,cin,cout), bias (cout,), act)
    with act ∈ {'relu', 'none'}.
    ``tile``: spatial (th, tw) VMEM tile for the fused path. The default
    suits short chains (halo ≤3); deep chains amortise their halo better
    with larger tiles (see LightweightSuperResolution's whole-body call).
    ``fit_vmem``: auto-shrink the tile to the scoped-VMEM budget (default;
    every production path). Diagnostics pass False to sweep exact tiles.
    """
    if isinstance(x, (list, tuple)):
        x = tuple(x)
        probe = x[0]
    else:
        probe = x
    if use_pallas is None:
        use_pallas = _auto_pallas(probe)
    ws = tuple(w for w, _b, _a in params)
    bs = tuple(b for _w, b, _a in params)
    acts = tuple(a for _w, _b, a in params)
    _layer_specs(ws, acts)  # validate on every path
    if use_pallas:
        return conv_chain_fused(acts, (tile[0], tile[1], fit_vmem), x, ws, bs)
    return _chain_xla(x, ws, bs, acts)
