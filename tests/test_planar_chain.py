"""Planar (channels-major) fused conv chain vs the XLA formulation.

Same boundary-semantics contract as test_conv_chain: SAME convs re-pad
zeros at the true image edge before EVERY layer, and the kernel's
roll-based shifts wrap through halo regions that must be re-zeroed —
parity must hold INCLUDING the outermost pixels, across multi-tile grids
in both spatial dimensions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from nerve_tpu.ops import planar_chain as pc


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _mk(rng, kh, cin, cout):
    w = jnp.asarray(rng.standard_normal((kh, kh, cin, cout)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32)) * 0.1
    return w, b


def _mk_dw(rng, c):
    w = jnp.asarray(rng.standard_normal((3, 3, c)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((c,)).astype(np.float32)) * 0.1
    return w, b


def _run(params, x, th, tw):
    ws = tuple(p[0] for p in params)
    bs = tuple(p[1] for p in params)
    acts = tuple(p[2] for p in params)
    ref = pc._planar_xla(x, ws, bs, acts)
    with pltpu.force_tpu_interpret_mode():
        got = pc._planar_pallas(x, ws, bs, acts, th=th, tw=tw, fit_vmem=False)
    return np.asarray(got), np.asarray(ref)


class TestPlanarChain:
    def test_dense_3x3_single_layer(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 3, 16, 130)).astype(np.float32))
        params = [(*_mk(rng, 3, 3, 8), "relu")]
        got, ref = _run(params, x, th=8, tw=128)
        np.testing.assert_allclose(got, ref, atol=3e-6)

    def test_pointwise_1x1(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 128)).astype(np.float32))
        params = [(*_mk(rng, 1, 8, 6), "none")]
        got, ref = _run(params, x, th=8, tw=128)
        np.testing.assert_allclose(got, ref, atol=3e-6)

    def test_depthwise(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 128)).astype(np.float32))
        params = [(*_mk_dw(rng, 8), "relu")]
        got, ref = _run(params, x, th=8, tw=128)
        np.testing.assert_allclose(got, ref, atol=3e-6)

    def test_lightweight_body_shape_multi_tile(self, rng):
        """head + 2×(dw+pw) + tail across a 2×2 tile grid with edge tiles
        (h, w not multiples of the tile) — the production structure."""
        x = jnp.asarray(rng.standard_normal((1, 3, 30, 200)).astype(np.float32)) * 0.5
        params = [(*_mk(rng, 3, 3, 8), "relu")]
        for _ in range(2):
            params.append((*_mk_dw(rng, 8), "none"))
            params.append((*_mk(rng, 1, 8, 8), "relu"))
        params.append((*_mk(rng, 3, 8, 12), "none"))
        got, ref = _run(params, x, th=16, tw=128)
        np.testing.assert_allclose(got, ref, atol=5e-6)

    def test_batch_and_tile_reuse(self, rng):
        """B > 1 reuses the scratch across grid steps — stale data from the
        previous tile must never leak through the halo/padding rows."""
        x = jnp.asarray(rng.standard_normal((2, 4, 20, 140)).astype(np.float32))
        params = [(*_mk(rng, 3, 4, 4), "relu"), (*_mk(rng, 3, 4, 4), "none")]
        got, ref = _run(params, x, th=8, tw=128)
        np.testing.assert_allclose(got, ref, atol=3e-6)

    def test_bf16_matches_xla_bf16(self, rng):
        x = (jnp.asarray(rng.standard_normal((1, 3, 24, 132)).astype(np.float32))
             * 0.5).astype(jnp.bfloat16)
        params = []
        w, b = _mk(rng, 3, 3, 8)
        params.append((w.astype(jnp.bfloat16), b.astype(jnp.bfloat16), "relu"))
        wd, bd = _mk_dw(rng, 8)
        params.append((wd.astype(jnp.bfloat16), bd.astype(jnp.bfloat16), "none"))
        w2, b2 = _mk(rng, 1, 8, 4)
        params.append((w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16), "none"))
        ws = tuple(p[0] for p in params)
        bs = tuple(p[1] for p in params)
        acts = tuple(p[2] for p in params)
        ref = pc._planar_xla(x, ws, bs, acts).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            got = pc._planar_pallas(
                x, ws, bs, acts, th=8, tw=128, fit_vmem=False
            ).astype(np.float32)
        scale = float(jnp.max(jnp.abs(ref))) or 1.0
        assert float(jnp.max(jnp.abs(got - ref))) / scale < 2e-2

    def test_grad_flows_via_xla_vjp(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 3, 16, 128)).astype(np.float32))
        w, b = _mk(rng, 3, 3, 4)

        def loss(xx, ww, bb):
            y = pc.planar_chain_apply(xx, [(ww, bb, "relu")], use_pallas=False)
            return jnp.sum(y ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
        assert all(jnp.all(jnp.isfinite(gi)) for gi in g)

    def test_vmem_fit_shrinks_oversized_request(self):
        specs = (
            [("3x3", 3, 32, "relu")]
            + [("dw3", 32, 32, "none"), ("1x1", 32, 32, "relu")] * 4
            + [("3x3", 32, 12, "none")]
        )
        th, tw = pc._fit_planar_tile(specs, 3, 256, 1920, 6, 2)
        assert pc._est_planar_vmem(specs, 3, th, tw, 6, 2) <= pc._VMEM_BUDGET
        assert th % 8 == 0 and tw % 128 == 0
