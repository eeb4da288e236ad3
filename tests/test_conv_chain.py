"""Fused conv-chain kernel vs the XLA formulation (interpret mode).

Covers the boundary-semantics contract: SAME convs re-pad zeros at the true
image edge before EVERY layer, so chained convs must match a layer-by-layer
XLA reference exactly INCLUDING the outermost pixels (the kernel zeroes its
out-of-image halo strips between layers — see nerve_tpu/ops/conv_chain.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from nerve_tpu.ops import conv_chain as cc


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _mk(rng, kh, cin, cout):
    w = jnp.asarray(rng.standard_normal((kh, kh, cin, cout)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32)) * 0.1
    return w, b


class TestConvChain:
    def test_three_layer_chain_exact_incl_boundary(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 16, 18, 8)).astype(np.float32)) * 0.5
        params = [(*_mk(rng, 3, 8, 8), "relu"), (*_mk(rng, 3, 8, 8), "relu"),
                  (*_mk(rng, 3, 8, 3), "none")]
        ws = tuple(p[0] for p in params)
        bs = tuple(p[1] for p in params)
        acts = ("relu", "relu", "none")
        ref = cc._chain_xla(x, ws, bs, acts)
        with pltpu.force_tpu_interpret_mode():
            got = cc.conv_chain_apply(x, params, use_pallas=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    @pytest.mark.parametrize("pet_chunks", [False, True])
    def test_multi_tile_matches_single(self, rng, pet_chunks):
        x = jnp.asarray(rng.standard_normal((1, 21, 27, 8)).astype(np.float32)) * 0.5
        params = [(*_mk(rng, 3, 8, 8), "relu"), (*_mk(rng, 3, 8, 8), "none")]
        ws, bs = tuple(p[0] for p in params), tuple(p[1] for p in params)
        acts = ("relu", "none")
        ref = cc._chain_xla(x, ws, bs, acts)
        with pltpu.force_tpu_interpret_mode():
            tiled = cc._chain_pallas(x, ws, bs, acts, th=8, tw=16,
                                     pet_chunks=pet_chunks)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref), atol=2e-6)

    def test_depthwise_whole_body_chain(self, rng):
        """LightweightSuperResolution-shaped chain — head 3×3, alternating
        depthwise/pointwise blocks, 3×3 tail — exact vs XLA including image
        boundaries, multi-tile, deep halo (4 × 3×3-support layers)."""
        x = jnp.asarray(rng.standard_normal((1, 19, 25, 3)).astype(np.float32)) * 0.5
        dw = lambda c: (  # noqa: E731
            jnp.asarray(rng.standard_normal((3, 3, c)).astype(np.float32)) * 0.2,
            jnp.zeros((c,), jnp.float32),
            "none",
        )
        params = [
            (*_mk(rng, 3, 3, 8), "relu"),
            dw(8), (*_mk(rng, 1, 8, 8), "relu"),
            dw(8), (*_mk(rng, 1, 8, 8), "relu"),
            (*_mk(rng, 3, 8, 4), "none"),
        ]
        ws = tuple(p[0] for p in params)
        bs = tuple(p[1] for p in params)
        acts = tuple(p[2] for p in params)
        ref = cc._chain_xla(x, ws, bs, acts)
        with pltpu.force_tpu_interpret_mode():
            got = cc._chain_pallas(x, ws, bs, acts, th=8, tw=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    def test_bf16_error_bounded_vs_f32(self, rng):
        """bf16 serving parity bound (round-1 advisor finding): the fused
        chain's per-dy partial sums round to bf16 before the f32 tap
        accumulate, adding rounding vs XLA's fully-f32-accumulated conv.
        Bound that error on bf16 inputs: |fused_bf16 − xla_f32| must stay
        within a few bf16 ulps of the activation scale."""
        x32 = jnp.asarray(rng.standard_normal((1, 16, 18, 8)).astype(np.float32)) * 0.5
        params = [(*_mk(rng, 3, 8, 8), "relu"), (*_mk(rng, 3, 8, 8), "relu"),
                  (*_mk(rng, 3, 8, 8), "none")]
        ws = tuple(p[0] for p in params)
        bs = tuple(p[1] for p in params)
        acts = ("relu", "relu", "none")
        ref = cc._chain_xla(x32, ws, bs, acts)

        xb = x32.astype(jnp.bfloat16)
        params_b = [(w.astype(jnp.bfloat16), b.astype(jnp.bfloat16), a)
                    for w, b, a in params]
        with pltpu.force_tpu_interpret_mode():
            got = cc.conv_chain_apply(xb, params_b, use_pallas=True)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        # bf16 eps = 2^-8; three chained layers with bf16 operands and
        # bf16 partial-sum rounding stay within ~4 eps of the f32 oracle.
        assert err <= 4 * (2.0 ** -8) * max(scale, 1.0), (err, scale)

    def test_mixed_1x1_and_small_output(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 12, 14, 6)).astype(np.float32)) * 0.5
        params = [(*_mk(rng, 1, 6, 16), "relu"), (*_mk(rng, 3, 16, 2), "none")]
        ws, bs = tuple(p[0] for p in params), tuple(p[1] for p in params)
        ref = cc._chain_xla(x, ws, bs, ("relu", "none"))
        with pltpu.force_tpu_interpret_mode():
            got = cc.conv_chain_apply(x, params, use_pallas=True)
        assert got.shape == (2, 12, 14, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    def test_gradient_via_custom_vjp(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 10, 12, 4)).astype(np.float32))
        params = [(*_mk(rng, 3, 4, 4), "relu"), (*_mk(rng, 3, 4, 4), "none")]

        def loss(xx):
            return jnp.sum(cc.conv_chain_apply(xx, params, use_pallas=False) ** 2)

        g = jax.grad(loss)(x)
        assert g.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_validation_errors(self, rng):
        x = jnp.zeros((1, 8, 8, 4))
        w5 = jnp.zeros((5, 5, 4, 4))
        with pytest.raises(ValueError, match="3x3/1x1"):
            cc.conv_chain_apply(x, [(w5, jnp.zeros(4), "relu")], use_pallas=False)
        w3 = jnp.zeros((3, 3, 4, 4))
        with pytest.raises(ValueError, match="activation"):
            cc.conv_chain_apply(x, [(w3, jnp.zeros(4), "gelu")], use_pallas=False)
        with pytest.raises(ValueError, match="mismatch"):
            cc.conv_chain_apply(
                x,
                [(w3, jnp.zeros(4), "relu"), (jnp.zeros((3, 3, 8, 4)), jnp.zeros(4), "none")],
                use_pallas=False,
            )


class TestVmemFit:
    """Scoped-VMEM auto-fit: the round-2 driver bench died because the
    10-layer lightweight whole-body chain requested tile (64, 240), whose
    unrolled-stage temporaries Mosaic cannot share (~85 MB of spill slots
    measured on v5e → OOM at the 100 MB cap). Production tiles must be
    fitted to the budget BEFORE the pallas_call is built."""

    LIGHTWEIGHT_SPECS = (
        [("3x3", 3, 32, "relu")]
        + [("dw3", 32, 32, "none"), ("1x1", 32, 32, "relu")] * 4
        + [("3x3", 32, 12, "none")]
    )

    def test_lightweight_chain_tile_is_shrunk(self):
        est = cc._est_chain_vmem(
            self.LIGHTWEIGHT_SPECS, [3], 12, 64, 240, 6, 2, False
        )
        assert est > cc._VMEM_BUDGET  # the failing round-2 request
        th, tw = cc._fit_chain_tile(
            self.LIGHTWEIGHT_SPECS, [3], 12, 64, 240, 6, 2, False
        )
        assert (th, tw) != (64, 240)
        assert cc._est_chain_vmem(
            self.LIGHTWEIGHT_SPECS, [3], 12, th, tw, 6, 2, False
        ) <= cc._VMEM_BUDGET
        assert th >= 16 and tw >= 16 and th % 8 == 0 and tw % 8 == 0

    def test_small_requests_pass_through(self):
        specs = [("3x3", 8, 8, "relu")]
        assert cc._fit_chain_tile(specs, [8], 8, 32, 120, 1, 2, False) == (32, 120)

    def test_fit_applies_in_chain_pallas_interpret(self, rng):
        # End-to-end: a deep chain with an oversized tile request still
        # produces exact results after the auto-fit (interpret mode).
        cin = 3
        params = [(*_mk(rng, 3, cin, 8), "relu")]
        for _ in range(4):
            params.append((*_mk(rng, 3, 8, 8), "relu"))
        params.append((*_mk(rng, 3, 8, 4), "none"))
        x = jnp.asarray(rng.standard_normal((1, 24, 32, cin)).astype(np.float32)) * 0.5
        ws = tuple(p[0] for p in params)
        bs = tuple(p[1] for p in params)
        acts = tuple(p[2] for p in params)
        ref = cc._chain_xla(x, ws, bs, acts)
        with pltpu.force_tpu_interpret_mode():
            got = cc._chain_pallas(x, ws, bs, acts, th=64, tw=240, fit_vmem=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
