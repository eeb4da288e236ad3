"""Fused Residual Dense Block — the SR network's FLOP hot spot.

The reference's ResidualDenseBlock (nerve_cl/models/super_resolution.py:212-253)
is 5 densely-connected 3×3 convs (growth 32) + a 1×1 fusion + 0.2-scaled
residual, stacked 8× in SuperResolutionNet. Lowered conv-by-conv through XLA,
every layer round-trips its growing concatenation through HBM (≈4 GB per
block at 1080p) and the 32-channel conv outputs starve the MXU — measured
≈88 ms per block at 1080p on v5e.

This kernel fuses the ENTIRE block in VMEM — one HBM read of the 64-channel
input, one write of the 64-channel output — using a *shift-after-matmul*
formulation chosen for the MXU:

  * A persistent scratch tile holds the dense concatenation zero-padded to a
    fixed 256 channels (64 input + 5·32 growth + padding), with a 1-pixel
    zero ring for SAME-conv semantics.
  * Each dense layer is three per-dy matmuls ``Y = X · W`` (K = the layer's
    exact dense-concat width, N = 96 = 3·32: that row's three 3×3 taps
    computed together at full MXU lane occupancy), instead of nine N=32
    matmuls at 25 % occupancy.
  * Each chunk's conv contribution is assembled by 3 *statically shifted
    adds* of its (…, 32) tap blocks into an f32 accumulator — VPU work
    entirely in VMEM, interleaved between the chunk matmuls.
  * The 1×1 local-feature fusion reuses the same X·(256→64) matmul shape.

Tiles carry a 5-pixel halo (five sequential 3×3 convs). The W-halo is
materialised as overlapping strips by the wrapper (≈4 % extra HBM traffic);
the H-halo is assembled in-kernel from two row-band BlockSpecs — no manual
DMA, the pipeline stays fully automatic.

Gradients: `rdb_fused` carries a custom VJP whose backward differentiates the
mathematically-identical XLA formulation (`_rdb_xla`), so training works
everywhere while serving gets the fused forward.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LAYERS = 5
GROWTH = 32
HALO = NUM_LAYERS  # one pixel per sequential 3x3 conv
KPAD = 256  # slot layout below, padded to 2 MXU K-tiles
# Channel-slot layout inside the scratch (channel-major):
#   [0:8)    bias slot — channel 0 is constant ones (biases fold into matmul)
#   [8:72)   the block's 64 input features
#   [72+32i : 104+32i)  growth features of dense layer i
# Layer i therefore contracts exactly K_i = 72 + 32·i leading channels — a
# cheap static major-dim slice — instead of a zero-padded K=256.
BIAS_SLOT = 8
FEAT_OFF = BIAS_SLOT

# Chunk-schedule switches (exact math either way; all combinations are
# interpret-parity-tested; hardware-timed by scripts/diag_rdb.py 2026-08-19
# on v5e @1080p, 64 feats, tiles 32×240 — docs/perf_notes.md round 3).
DX_MAJOR = True  # dx-major weight packing: per-chunk whole sublane shift,
#                  three major-dim (row) tap adds — vs dy-major's six
#                  sublane-offset slices per layer. MEASURED 30.50 ms/block
#                  vs 34.54 dy-major (−12 %), identical maxerr 1.56e-02.
PET_CHUNKS = False  # DEAD END — do not enable: Mosaic REJECTS bf16 matmul
#                     accumulators ("'tpu.matmul' op Expected matmul acc to
#                     be 32-bit", hardware lowering 2026-08-19), so emitting
#                     the scratch dtype via preferred_element_type cannot
#                     lower. Kept only so diag scripts can demonstrate the
#                     failure; interpret mode accepts it, hardware does not.


def _layer_k(i: int, features: int) -> int:
    return FEAT_OFF + features + GROWTH * i


def _pack_weights(params: Sequence[jnp.ndarray], features: int):
    """(w1,b1,...,w5,b5,lw,lb) → per-layer (K_i, 288) matrices + lff (K5, C).

    Wcat[k, (3·dy+dx)·32 + c] = w_i[dy, dx, k-FEAT_OFF, c]; row 0 carries the
    bias in the CENTER tap block (tap s=4 reads each output exactly once).
    """
    packed = []
    for i in range(NUM_LAYERS):
        w, b = params[2 * i], params[2 * i + 1]
        k_in = w.shape[2]
        ki = _layer_k(i, features)
        wp = jnp.pad(w, ((0, 0), (0, 0), (FEAT_OFF, ki - FEAT_OFF - k_in), (0, 0)))
        wcat = jnp.transpose(wp, (2, 0, 1, 3)).reshape(ki, 9 * GROWTH)
        wcat = wcat.at[0, 4 * GROWTH : 5 * GROWTH].set(b)
        packed.append(wcat.astype(params[0].dtype))
    lw, lb = params[10], params[11]
    kl = _layer_k(NUM_LAYERS, features)
    lwp = jnp.pad(lw, ((FEAT_OFF, kl - FEAT_OFF - lw.shape[0]), (0, 0)))
    lwp = lwp.at[0, :].set(lb)
    packed.append(lwp.astype(lw.dtype))
    return packed


def _pack_weights_dx(params: Sequence[jnp.ndarray], features: int):
    """dx-major repack: column block (3·dx+dy) holds tap (dy, dx).

    A permutation of `_pack_weights`'s column blocks; the centre tap
    (dy=1, dx=1) stays in block 4, so the bias row placement is unchanged.
    """
    packed = _pack_weights(params, features)
    out = []
    for wcat in packed[:NUM_LAYERS]:
        blocks = [
            wcat[:, (3 * dy + dx) * GROWTH : (3 * dy + dx + 1) * GROWTH]
            for dx in range(3)
            for dy in range(3)
        ]
        out.append(jnp.concatenate(blocks, axis=1))
    out.append(packed[NUM_LAYERS])
    return out


def _rdb_kernel(
    b00_ref,
    b01_ref,
    b10_ref,
    b11_ref,
    w0_ref,
    w1_ref,
    w2_ref,
    w3_ref,
    w4_ref,
    lw_ref,
    out_ref,
    scratch,
    *,
    th: int,
    tw: int,
    features: int,
    img_h: int,
    img_w: int,
    nh_static: int,
    nw_static: int,
    dx_major: bool = DX_MAJOR,
    pet_chunks: bool = PET_CHUNKS,
):
    """Fused RDB on NHWC tiles.

    scratch (ph, pw, KPAD) holds the dense concatenation in the slot layout
    above (channels on lanes), with a 1-pixel zero ring (left/top) and zero
    alignment columns (right) for SAME-conv semantics; channel 0 is constant
    ones so biases arrive via the matmul. The ring/ones/padding slots are
    written once on the first grid step and never touched again.

    Each dense layer is three (M, K)·(K, 96) per-dy-row matmuls, each
    followed by three statically dx-shifted adds restoring the conv
    geometry (see make_layer). All slices are STATIC —
    dynamic (pl.ds) row banding was measured 2-3× slower (Mosaic inserts
    operand copies for dynamically-addressed matmul inputs); large tiles are
    afforded by raising the scoped-VMEM ceiling instead.
    """
    hh, ww = th + 2 * HALO, tw + 2 * HALO
    ph = hh + 2
    pw = ww + 2 + ((-(ww + 2)) % 8)  # right-pad so the (ph·pw) merge is legal
    m = ph * pw

    step0 = (
        (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    )

    @pl.when(step0)
    def _init():
        scratch[...] = jnp.zeros((ph, pw, KPAD), scratch.dtype)

    # The ones channel is re-written EVERY tile (not only at step0): boundary
    # tiles zero their strips across the full lane extent below, which wipes
    # it for whichever tile uses the scratch next.
    scratch[:, :, 0:1] = jnp.ones((ph, pw, 1), scratch.dtype)

    # Assemble the (hh, ww) halo window from the 2×2 block neighbourhood by
    # writing each quadrant straight into scratch — concatenating first would
    # materialise a (2th, 2tw) stack temporary (several MB at serving tiles).
    #
    # Boundary handling: SAME-conv semantics re-pad ZEROS at the true image
    # boundary before EVERY conv, so each layer's out-of-image halo values
    # (computed over the padding: relu(bias) garbage, not zero) must be
    # zeroed before the next layer consumes them. The strips are zeroed
    # across the FULL lane extent (input feats there are already zero from
    # the wrapper padding; the ones channel is never read for valid outputs
    # at those positions) — lane-aligned full-width stores, under pl.when so
    # interior tiles skip them. Whole-tile masks (where / multiply / negmask,
    # any layout) measured +14 ms/block; lane-offset strip RMWs similar; this
    # form + the flat unrolled layer loop measured best
    # (scripts/diag_rdb.py).
    hi, wi = pl.program_id(1), pl.program_id(2)

    def zero_boundary_strips():
        @pl.when(hi == 0)
        def _top():
            scratch[1 : 1 + HALO, :, :] = jnp.zeros((HALO, pw, KPAD), scratch.dtype)

        @pl.when(wi == 0)
        def _left():
            scratch[:, 1 : 1 + HALO, :] = jnp.zeros((ph, HALO, KPAD), scratch.dtype)

        # Bottom/right: any of the last two grid rows/cols can overlap the
        # image edge (static offsets; emit a guard only where the overlap is
        # geometrically possible).
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

    def matmul(w_ref, n0=None, n1=None, out_dtype=jnp.float32):
        # (M, K) · (K, n1-n0) → (ph, pw, ·).
        # K = the layer's exact contraction width (a lane slice from 0 — the
        # slots beyond it belong to not-yet-written layers and carry zero
        # weights anyway).
        k = w_ref.shape[0]
        x = scratch[:, :, :k].reshape(m, k)
        wcols = w_ref[:] if n0 is None else w_ref[:, n0:n1]
        y = lax.dot_general(
            x, wcols, (((1,), (0,)), ((), ())),
            preferred_element_type=out_dtype,
        )
        return y.reshape(ph, pw, wcols.shape[1])

    # FLAT unrolled layer loop. Each dense layer is three per-dy N=96 matmul
    # chunks: matmul → bf16 cast → three dx-shifted adds into an f32
    # accumulator (monolithic N=288 + a y_scratch materialisation was ~15 %
    # slower; f32-value chunks and per-tap N=32 chunks 3-4× slower). The
    # earlier fori+switch structure (kept when temps were 4.7 MB each)
    # pessimises scheduling once the boundary-strip writes are present —
    # flat + strips measured 29 ms vs 41-45 ms for every switch-based
    # masking variant (scripts/diag_rdb.py).
    for i, w_ref in enumerate((w0_ref, w1_ref, w2_ref, w3_ref, w4_ref)):
        acc = jnp.zeros((hh, ww, GROWTH), jnp.float32)
        # `outer` iterates dy (row-major packing) or dx (dx-major packing).
        for outer in range(3):
            if pet_chunks:
                y = matmul(
                    w_ref, 3 * outer * GROWTH, (3 * outer + 3) * GROWTH,
                    out_dtype=scratch.dtype,
                )
            else:
                y = matmul(w_ref, 3 * outer * GROWTH, (3 * outer + 3) * GROWTH)
                y = y.astype(scratch.dtype)
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
        f = jnp.maximum(acc, 0.0)
        ki = _layer_k(i, features)
        scratch[1 : 1 + hh, 1 : 1 + ww, ki : ki + GROWTH] = f.astype(scratch.dtype)
        zero_boundary_strips()

    lff = matmul(lw_ref)
    x_in = scratch[1 : 1 + hh, 1 : 1 + ww, FEAT_OFF : FEAT_OFF + features].astype(
        jnp.float32
    )
    out = lff[1 : 1 + hh, 1 : 1 + ww, :] * 0.2 + x_in
    out_ref[0] = out[HALO : HALO + th, HALO : HALO + tw].astype(out_ref.dtype)


def _rdb_pallas_nhwc(
    x: jnp.ndarray,
    params: Sequence[jnp.ndarray],
    th: int = 32,
    tw: int = 240,
    dx_major: bool | None = None,
    pet_chunks: bool | None = None,
) -> jnp.ndarray:
    """One fused RDB on an NHWC (B, H, W, C) array — no layout changes.

    No strip materialisation and no output reassembly: the (TH+10, TW+10)
    input halo window is assembled in-kernel from a 2×2 neighbourhood of
    (TH, TW) BlockSpecs (offsets (hi|hi+1, wi|wi+1)), and each output tile
    writes straight into its final position. The only HBM overhead is the
    4× block refetch, which the automatic pipeline streams.
    """
    b, h, w, c = x.shape
    # Clamp the tile to the image so small inputs (training crops, facade
    # probes) don't pay a serving-tile padding wall (same fix as conv_chain).
    th = min(th, -(-h // 8) * 8)
    tw = min(tw, -(-w // 8) * 8)
    th = max(th, 2 * HALO)
    tw = max(tw - tw % 8, 2 * HALO + (-(2 * HALO) % 8))  # sublane-aligned
    nh = -(-h // th)
    nw = -(-w // tw)

    pad_h = (nh + 1) * th - (h + HALO)
    pad_w = (nw + 1) * tw - (w + HALO)
    xp = jnp.pad(x, ((0, 0), (HALO, pad_h), (HALO, pad_w), (0, 0)))

    dx_major = DX_MAJOR if dx_major is None else dx_major
    pet_chunks = PET_CHUNKS if pet_chunks is None else pet_chunks
    packed = (_pack_weights_dx if dx_major else _pack_weights)(params, c)
    kernel = functools.partial(
        _rdb_kernel, th=th, tw=tw, features=c, img_h=h, img_w=w,
        nh_static=nh, nw_static=nw, dx_major=dx_major, pet_chunks=pet_chunks,
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
        out_shape=jax.ShapeDtypeStruct((b, nh * th, nw * tw, c), x.dtype),
        grid=(b, nh, nw),
        in_specs=[quad_spec(0, 0), quad_spec(0, 1), quad_spec(1, 0), quad_spec(1, 1)]
        + [full_spec(p) for p in packed],
        out_specs=pl.BlockSpec(
            (1, th, tw, c),
            lambda bi, hi, wi: (bi, hi, wi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((ph, pw, KPAD), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            # Raise the scoped-VMEM ceiling above XLA's conservative 16 MB
            # default (v5e has more physical VMEM): serving tiles are sized
            # so scratch + double-buffered quad blocks land ~18-24 MB.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp, xp, xp, xp, *packed)

    return out[:, :h, :w, :]


def _rdb_pallas(
    x: jnp.ndarray, params: Sequence[jnp.ndarray], th: int = 16, tw: int = 120
) -> jnp.ndarray:
    return _rdb_pallas_nhwc(x, params, th=th, tw=tw)


def _rdb_chain_pallas(x: jnp.ndarray, params_list) -> jnp.ndarray:
    """The full RDB stack: fused blocks chained directly in NHWC."""
    for params in params_list:
        x = _rdb_pallas_nhwc(x, params)
    return x


def _rdb_chain_xla(x: jnp.ndarray, params_list) -> jnp.ndarray:
    for params in params_list:
        x = _rdb_xla(x, params)
    return x


@jax.custom_vjp
def rdb_chain_fused(x: jnp.ndarray, params_list: Tuple) -> jnp.ndarray:
    """Fused RDB stack: (B, H, W, C) → (B, H, W, C) through N blocks."""
    return _rdb_chain_pallas(x, params_list)


def _chain_fwd(x, params_list):
    return rdb_chain_fused(x, params_list), (x, params_list)


def _chain_bwd(res, g):
    x, params_list = res
    _, vjp = jax.vjp(lambda xx, pp: _rdb_chain_xla(xx, pp), x, params_list)
    return vjp(g)


rdb_chain_fused.defvjp(_chain_fwd, _chain_bwd)


def rdb_chain_apply(
    x: jnp.ndarray, params_list, use_pallas: bool | None = None
) -> jnp.ndarray:
    """Dispatch the whole RDB stack: fused TPU chain vs XLA formulation."""
    if use_pallas is None:
        use_pallas = _auto_pallas(x)
    params_list = tuple(tuple(p) for p in params_list)
    if use_pallas:
        return rdb_chain_fused(x, params_list)
    return _rdb_chain_xla(x, params_list)


def _rdb_xla(x: jnp.ndarray, params: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Reference XLA formulation (identical math; autodiff/backward path).

    Generic over the block geometry: ``params`` is (w_0, b_0, ...,
    w_{L-1}, b_{L-1}, lw, lb) for any number of dense layers L.
    """
    num_layers = len(params) // 2 - 1
    lw, lb = params[-2], params[-1]
    feats = [x]
    for wk, bk in ((params[2 * i], params[2 * i + 1]) for i in range(num_layers)):
        inp = feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=-1)
        dn = lax.conv_dimension_numbers(inp.shape, wk.shape, ("NHWC", "HWIO", "NHWC"))
        # No preferred_element_type: XLA convs accumulate f32 internally, and
        # a widened output dtype breaks the conv transpose rule under vjp.
        f = lax.conv_general_dilated(
            inp, wk, (1, 1), "SAME", dimension_numbers=dn
        ).astype(jnp.float32) + bk.astype(jnp.float32)
        feats.append(jnp.maximum(f, 0.0).astype(x.dtype))
    full = jnp.concatenate(feats, axis=-1)
    lff = jnp.einsum(
        "bhwk,kn->bhwn", full.astype(jnp.float32), lw.astype(jnp.float32)
    ) + lb.astype(jnp.float32)
    return (lff * 0.2 + x.astype(jnp.float32)).astype(x.dtype)


@jax.custom_vjp
def rdb_fused(x: jnp.ndarray, params: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """Fused residual dense block: (B, H, W, C) → (B, H, W, C).

    ``params`` = (w1, b1, ..., w5, b5, lff_w, lff_b) with wi of shape
    (3, 3, C + (i-1)·GROWTH, GROWTH) and lff_w of shape (C + 5·GROWTH, C).
    """
    return _rdb_pallas(x, params)


def _rdb_fwd(x, params):
    return rdb_fused(x, params), (x, params)


def _rdb_bwd(res, g):
    x, params = res
    _, vjp = jax.vjp(lambda xx, pp: _rdb_xla(xx, pp), x, params)
    return vjp(g)


rdb_fused.defvjp(_rdb_fwd, _rdb_bwd)


def _auto_pallas(x: jnp.ndarray) -> bool:
    # The fused kernel's VMEM budget is tuned for bf16 serving; f32 tiles are
    # 2x larger, so f32 (training/CPU) uses the XLA formulation.
    from nerve_tpu.ops.dispatch import pallas_available

    return pallas_available() and x.dtype == jnp.bfloat16


def rdb_apply(
    x: jnp.ndarray, params: Sequence[jnp.ndarray], use_pallas: bool | None = None
) -> jnp.ndarray:
    """Dispatch between the fused TPU kernel and the XLA formulation."""
    if use_pallas is None:
        use_pallas = _auto_pallas(x)
    if use_pallas:
        return rdb_fused(x, tuple(params))
    return _rdb_xla(x, tuple(params))
