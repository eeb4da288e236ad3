"""int8 RDB chain: quantisation quality and kernel/XLA parity.

The int8 path has no reference analogue (nerve_cl serves f32 torch); the
oracle here is the repo's own exact f32 XLA RDB formulation
(nerve_tpu.ops.rdb._rdb_xla) — the int8 chain must track it within standard
post-training-quantisation error, and the Pallas kernel must match the
bit-faithful XLA int8 formulation exactly (interpret mode on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from nerve_tpu.ops import rdb as rdb_ops
from nerve_tpu.ops import rdb_int8


def _make_params(key, features: int, num_layers: int = 5, growth: int = 32):
    params = []
    cin = features
    for _ in range(num_layers):
        key, k1, k2 = jax.random.split(key, 3)
        params.append(jax.random.normal(k1, (3, 3, cin, growth)) * 0.08)
        params.append(jax.random.normal(k2, (growth,)) * 0.02)
        cin += growth
    key, k1, k2 = jax.random.split(key, 3)
    params.append(jax.random.normal(k1, (cin, features)) * 0.08)
    params.append(jax.random.normal(k2, (features,)) * 0.02)
    return params


@pytest.fixture
def chain():
    key = jax.random.PRNGKey(7)
    features = 64
    params_list = [_make_params(jax.random.fold_in(key, b), features) for b in range(3)]
    x = jax.random.normal(jax.random.fold_in(key, 99), (1, 24, 40, features)) * 0.5
    return x.astype(jnp.float32), params_list


class TestCalibration:
    def test_scales_shape_and_positive(self, chain):
        x, params_list = chain
        scales = rdb_int8.calibrate_rdb_chain(x, params_list)
        assert scales.shape == (3, 6)
        assert bool(jnp.all(scales > 0))

    def test_scales_cover_activations(self, chain):
        """s_in·127 equals the input max-abs by construction."""
        x, params_list = chain
        scales = rdb_int8.calibrate_rdb_chain(x, params_list)
        np.testing.assert_allclose(
            float(scales[0, 0]) * 127.0, float(jnp.max(jnp.abs(x))), rtol=1e-6
        )


class TestQuantisedQuality:
    def test_int8_tracks_f32_chain(self, chain):
        """Whole-chain int8 error vs the exact f32 formulation stays within
        standard PTQ bounds (the serving-quality gate is the PSNR delta in
        scripts/eval_parity.py --int8; this bounds the op-level error)."""
        x, params_list = chain
        ref = x
        for p in params_list:
            ref = rdb_ops._rdb_xla(ref, [jnp.asarray(t) for t in p])

        scales = rdb_int8.calibrate_rdb_chain(x, params_list)
        out = rdb_int8.rdb_chain_quantized_apply(
            x, params_list, scales, use_pallas=False
        )
        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        assert err / scale < 0.05, f"relative int8 error {err / scale:.4f}"
        # And it must be much closer than a trivially-wrong chain.
        assert float(jnp.mean(jnp.abs(out - ref))) < 0.01 * scale

    def test_requant_chain_matches_blockwise(self, chain):
        """int8-through-HBM chaining (requant at next block's s_in) equals
        quantising each block's bf16 output independently, up to the single
        extra rounding step."""
        x, params_list = chain
        scales = rdb_int8.calibrate_rdb_chain(x, params_list)
        qchain = rdb_int8.quantize_rdb_chain(params_list, scales)
        out_chain = rdb_int8.rdb_chain_int8_xla(x, qchain)

        # Blockwise: run each block as a 1-chain (bf16 out), re-feed.
        y = x
        for b in range(3):
            y = rdb_int8.rdb_chain_int8_xla(y, (qchain[b],))
        err = float(jnp.max(jnp.abs(out_chain - y)))
        s_max = max(float(scales[b, 0]) for b in range(3))
        assert err <= 127 * s_max * 0.02 + 1e-4


class TestKernelParity:
    @pytest.mark.parametrize("shape", [(1, 24, 40), (2, 16, 24)])
    def test_pallas_matches_xla_int8_per_block(self, chain, shape):
        """Interpret-mode kernel vs the XLA int8 formulation, block by block
        WITHOUT the inter-block int8 requant: the two programs' f32 epilogues
        can differ by an ulp (FMA contraction is a per-program compiler
        choice), and a borderline requant can turn that ulp into a full int8
        step that cascades — so exactness is asserted where it is
        well-defined (pre-requant f32/bf16 values), and the cascade is
        bounded separately in test_chain_within_quant_steps."""
        x, params_list = chain
        b, h, w = shape
        key = jax.random.PRNGKey(3)
        x = jax.random.normal(key, (b, h, w, 64)) * 0.5
        scales = rdb_int8.calibrate_rdb_chain(x, params_list)
        qchain = rdb_int8.quantize_rdb_chain(params_list, scales)

        for blk in range(len(qchain)):
            ref = rdb_int8.rdb_chain_int8_xla(
                x, (qchain[blk],), out_dtype=jnp.float32
            )
            with pltpu.force_tpu_interpret_mode():
                out = rdb_int8.rdb_chain_int8_pallas(
                    x, (qchain[blk],), out_dtype=jnp.float32, th=16, tw=16
                )
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(ref, np.float32),
                atol=1e-4, rtol=0,
            )

    def test_dx_major_schedule_matches_dy_major(self, chain):
        """The dx-major chunk schedule (call-time column permutation of
        wq/dq + swapped shift geometry) is the same math as dy-major up to
        f32 add ORDER; pre-requant f32 outputs must agree to float-sum
        tolerance, block by block."""
        x, params_list = chain
        scales = rdb_int8.calibrate_rdb_chain(x, params_list)
        qchain = rdb_int8.quantize_rdb_chain(params_list, scales)
        for blk in range(len(qchain)):
            with pltpu.force_tpu_interpret_mode():
                dy = rdb_int8.rdb_chain_int8_pallas(
                    x, (qchain[blk],), out_dtype=jnp.float32, th=16, tw=16,
                    dx_major=False,
                )
                dx = rdb_int8.rdb_chain_int8_pallas(
                    x, (qchain[blk],), out_dtype=jnp.float32, th=16, tw=16,
                    dx_major=True,
                )
            np.testing.assert_allclose(
                np.asarray(dx, np.float32), np.asarray(dy, np.float32),
                atol=1e-4, rtol=0,
            )

    def test_chain_within_quant_steps(self, chain):
        """Whole-chain kernel-vs-XLA difference is bounded by a few int8
        quantisation steps (borderline requant flips cascade spatially but
        cannot grow beyond the step size times the residual gain)."""
        x, params_list = chain
        scales = rdb_int8.calibrate_rdb_chain(x, params_list)
        qchain = rdb_int8.quantize_rdb_chain(params_list, scales)
        ref = rdb_int8.rdb_chain_int8_xla(x, qchain)
        with pltpu.force_tpu_interpret_mode():
            out = rdb_int8.rdb_chain_int8_pallas(x, qchain, th=16, tw=16)
        step = float(jnp.max(scales))  # the coarsest quant step in the chain
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32)
        )))
        assert err <= 4 * step, f"max err {err} vs quant step {step}"

    def test_pallas_single_block_bf16_out(self, chain):
        x, params_list = chain
        scales = rdb_int8.calibrate_rdb_chain(x, params_list)
        qchain = rdb_int8.quantize_rdb_chain(params_list[:1], scales[:1])
        ref = rdb_int8.rdb_chain_int8_xla(x, qchain, out_dtype=jnp.bfloat16)
        with pltpu.force_tpu_interpret_mode():
            out = rdb_int8.rdb_chain_int8_pallas(
                x, qchain, out_dtype=jnp.bfloat16, th=16, tw=16
            )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=1e-2, rtol=0,
        )


class TestPerChannelInt32Taps:
    """Round-4 variant: per-channel (tap-shared) scales + int32 tap
    accumulation — one dequant per layer instead of per 96-lane chunk."""

    def test_quality_tracks_f32(self, chain):
        x, params_list = chain
        scales = rdb_int8.calibrate_rdb_chain(x, params_list)
        qchain = rdb_int8.quantize_rdb_chain(params_list, scales,
                                             per_channel=True)
        out = rdb_int8.rdb_chain_int8_xla(x, qchain, int32_taps=True,
                                          out_dtype=jnp.float32)
        ref = x
        for prm in params_list:
            ref = rdb_ops._rdb_xla(ref, [jnp.asarray(t) for t in prm])
        rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
        assert rel < 0.06, f"per-channel int8 relative err {rel:.4f}"

    def test_pallas_matches_xla(self, chain):
        from jax.experimental.pallas import tpu as pltpu

        x, params_list = chain
        scales = rdb_int8.calibrate_rdb_chain(x, params_list)
        qchain = rdb_int8.quantize_rdb_chain(params_list, scales,
                                             per_channel=True)
        ref = rdb_int8.rdb_chain_int8_xla(x, qchain, int32_taps=True,
                                          out_dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = rdb_int8.rdb_chain_int8_pallas(
                x, qchain, out_dtype=jnp.float32, th=32, tw=128,
                int32_taps=True,
            )
        tol = 4 * float(jnp.max(scales))
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err <= tol, f"kernel vs XLA int8 err {err:.5f} (tol {tol:.5f})"

    def test_dx_major_composes(self, chain):
        """The dx-major column permutation must preserve per-channel
        tap-shared dequant (first-G columns stay the channel scales)."""
        from jax.experimental.pallas import tpu as pltpu

        x, params_list = chain
        scales = rdb_int8.calibrate_rdb_chain(x, params_list)
        qchain = rdb_int8.quantize_rdb_chain(params_list, scales,
                                             per_channel=True)
        ref = rdb_int8.rdb_chain_int8_xla(x, qchain, int32_taps=True,
                                          out_dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = rdb_int8.rdb_chain_int8_pallas(
                x, qchain, out_dtype=jnp.float32, th=32, tw=128,
                int32_taps=True, dx_major=True,
            )
        tol = 4 * float(jnp.max(scales))
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err <= tol, f"dx-major int32-taps err {err:.5f} (tol {tol:.5f})"
