"""int8 conv chains: quantisation quality and kernel/XLA parity.

No reference analogue (nerve_cl serves f32 torch); the oracle is the repo's
own exact f32 XLA chain (nerve_tpu.ops.conv_chain._chain_xla). The int8
chain must track it within standard PTQ error, and the Pallas kernel must
match the bit-faithful XLA int8 formulation (interpret mode on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from nerve_tpu.ops import conv_chain as cc
from nerve_tpu.ops import conv_chain_int8 as cc8


def _head_chain(key):
    """The full model's feature-head shape: 3→64 relu."""
    k1, k2 = jax.random.split(key)
    return [(jax.random.normal(k1, (3, 3, 3, 64)) * 0.2,
             jax.random.normal(k2, (64,)) * 0.05, "relu")]


def _gff_like_chain(key):
    """3×3 64→64 relu → 1×1 64→12 none (gff + upsampler-ish shapes)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return [
        (jax.random.normal(k1, (3, 3, 64, 64)) * 0.08,
         jax.random.normal(k2, (64,)) * 0.02, "relu"),
        (jax.random.normal(k3, (1, 1, 64, 12)) * 0.15, jnp.zeros((12,)), "none"),
    ]


def _attn_like_chain(key):
    """3×3 → 3×3 → 1×1 with a tiny logit output (aggregator attention)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return [
        (jax.random.normal(k1, (3, 3, 40, 32)) * 0.1, jnp.zeros((32,)), "relu"),
        (jax.random.normal(k2, (3, 3, 32, 32)) * 0.1, jnp.zeros((32,)), "relu"),
        (jax.random.normal(k3, (1, 1, 32, 3)) * 0.2, jnp.zeros((3,)), "none"),
    ]


def _x(key, c, h=24, w=40):
    return jax.random.normal(key, (1, h, w, c)) * 0.5


class TestCalibration:
    def test_scales_shape_positive(self):
        key = jax.random.PRNGKey(0)
        params = _gff_like_chain(key)
        x = _x(jax.random.fold_in(key, 9), 64)
        scales = cc8.calibrate_conv_chain(x, params)
        assert scales.shape == (3,)
        assert bool(jnp.all(scales > 0))
        np.testing.assert_allclose(
            float(scales[0]) * 127.0, float(jnp.max(jnp.abs(x))), rtol=1e-6
        )

    def test_depthwise_rejected(self):
        params = [(jnp.ones((3, 3, 8)), jnp.zeros((8,)), "none")]
        with pytest.raises(ValueError, match="dense"):
            cc8.calibrate_conv_chain(jnp.ones((1, 8, 8, 8)), params)


class TestQuality:
    @pytest.mark.parametrize("make", [_head_chain, _gff_like_chain, _attn_like_chain])
    def test_int8_tracks_f32(self, make):
        key = jax.random.PRNGKey(3)
        params = make(key)
        cin = params[0][0].shape[2]
        cout = params[-1][0].shape[3]
        x = _x(jax.random.fold_in(key, 7), cin)
        ref = cc.conv_chain_apply(x, params, use_pallas=False)
        scales = cc8.calibrate_conv_chain(x, params)
        qchain = cc8.quantize_conv_chain(params, scales)
        out = cc8.conv_chain_int8_apply(x, qchain, cout, use_pallas=False)
        assert out.shape == ref.shape
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        rel = float(jnp.max(jnp.abs(out - ref))) / scale
        assert rel < 0.08, f"int8 relative err {rel:.4f}"

    def test_multi_input_concat(self):
        """Sequence input (fused channel concat) matches concatenated XLA."""
        key = jax.random.PRNGKey(5)
        params = _attn_like_chain(key)
        x1 = _x(jax.random.fold_in(key, 1), 24)
        x2 = _x(jax.random.fold_in(key, 2), 16)
        scales = cc8.calibrate_conv_chain([x1, x2], params)
        qchain = cc8.quantize_conv_chain(params, scales)
        a = cc8.conv_chain_int8_apply([x1, x2], qchain, 3, use_pallas=False)
        b = cc8.conv_chain_int8_apply(
            jnp.concatenate([x1, x2], axis=-1), qchain, 3, use_pallas=False
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestKernelParity:
    @pytest.mark.parametrize("make,cin", [
        (_head_chain, 3), (_gff_like_chain, 64), (_attn_like_chain, 40),
    ])
    def test_pallas_matches_xla_int8(self, make, cin):
        key = jax.random.PRNGKey(11)
        params = make(key)
        cout = params[-1][0].shape[3]
        x = _x(jax.random.fold_in(key, 13), cin, h=20, w=48)
        scales = cc8.calibrate_conv_chain(x, params)
        qchain = cc8.quantize_conv_chain(params, scales)
        ref = cc8.conv_chain_int8_apply(
            x, qchain, cout, use_pallas=False, out_dtype=jnp.float32
        )
        with pltpu.force_tpu_interpret_mode():
            got = cc8.conv_chain_int8_pallas(
                x, qchain, cout, out_dtype=jnp.float32, th=16, tw=24
            )
        # Same tolerance rationale as tests/test_rdb_int8: separately
        # compiled programs may flip a borderline requant by one step.
        tol = 2 * float(jnp.max(scales))
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err <= tol, f"kernel vs XLA int8 err {err:.5f} (tol {tol:.5f})"

    def test_pallas_tiled_boundary_exact(self):
        """Tiles smaller than the image: SAME-conv boundary semantics hold
        (halo strips re-zeroed between layers)."""
        key = jax.random.PRNGKey(17)
        params = _gff_like_chain(key)
        x = _x(jax.random.fold_in(key, 19), 64, h=40, w=64)
        scales = cc8.calibrate_conv_chain(x, params)
        qchain = cc8.quantize_conv_chain(params, scales)
        ref = cc8.conv_chain_int8_apply(
            x, qchain, 12, use_pallas=False, out_dtype=jnp.float32
        )
        with pltpu.force_tpu_interpret_mode():
            got = cc8.conv_chain_int8_pallas(
                x, qchain, 12, out_dtype=jnp.float32, th=16, tw=32
            )
        tol = 2 * float(jnp.max(scales))
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err <= tol, f"tiled boundary err {err:.5f} (tol {tol:.5f})"
