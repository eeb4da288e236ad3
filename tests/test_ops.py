"""Parity tests for nerve_tpu.ops against the PyTorch semantics the reference
relies on (torch runs on CPU here purely as a numerical oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from nerve_tpu import ops


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


class TestPixelShuffle:
    @pytest.mark.parametrize("scale", [2, 3, 4])
    def test_matches_torch(self, rng, scale):
        x = rng.standard_normal((2, 5, 7, 3 * scale * scale)).astype(np.float32)
        ours = np.asarray(ops.pixel_shuffle(jnp.asarray(x), scale))
        theirs = _to_nhwc(torch.pixel_shuffle(_nchw(x), scale))
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("scale", [2, 3])
    def test_planar_matches_torch(self, rng, scale):
        """Channel-first d2s == torch.pixel_shuffle's native NCHW output."""
        x = rng.standard_normal((2, 5, 7, 3 * scale * scale)).astype(np.float32)
        ours = np.asarray(ops.pixel_shuffle_planar(jnp.asarray(x), scale))
        theirs = torch.pixel_shuffle(_nchw(x), scale).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("scale", [2, 3])
    def test_packed_xla_fallback(self, rng, scale):
        x = rng.standard_normal((1, 8, 8, 3 * scale * scale)).astype(np.float32)
        got = np.asarray(ops.depth_to_space_packed(jnp.asarray(x), scale))
        ref = np.asarray(ops.pixel_shuffle(jnp.asarray(x), scale)).reshape(
            1, 8 * scale, 8 * scale * 3
        )
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("scale", [2, 3])
    def test_packed_mxu_kernel_interpret(self, rng, scale):
        """The MXU scatter-matmul kernel is exact (interpret mode on CPU;
        real-TPU lowering + timing covered by scripts/diag_d2s.py)."""
        from nerve_tpu.ops.pixel_shuffle import _TW

        x = rng.standard_normal((1, 16, _TW, 3 * scale * scale)).astype(np.float32)
        got = np.asarray(
            ops.depth_to_space_packed(jnp.asarray(x), scale, use_pallas=True,
                                      interpret=True)
        )
        ref = np.asarray(ops.pixel_shuffle(jnp.asarray(x), scale)).reshape(
            1, 16 * scale, _TW * scale * 3
        )
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


class TestResize:
    @pytest.mark.parametrize("scale", [2, 4])
    def test_bicubic_upsample_close_to_torch(self, rng, scale):
        x = rng.random((2, 16, 12, 3)).astype(np.float32)
        ours = np.asarray(ops.upsample_bicubic(jnp.asarray(x), scale))
        theirs = _to_nhwc(
            F.interpolate(_nchw(x), scale_factor=scale, mode="bicubic", align_corners=False)
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_bicubic_downscale_matches_torch(self, rng):
        x = rng.random((1, 16, 16, 3)).astype(np.float32)
        ours = np.asarray(ops.resize_bicubic(jnp.asarray(x), (9, 7)))
        theirs = _to_nhwc(
            F.interpolate(_nchw(x), size=(9, 7), mode="bicubic", align_corners=False)
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_bilinear_matches_torch(self, rng):
        x = rng.random((1, 9, 11, 4)).astype(np.float32)
        ours = np.asarray(ops.resize_bilinear(jnp.asarray(x), (18, 22)))
        theirs = _to_nhwc(
            F.interpolate(_nchw(x), size=(18, 22), mode="bilinear", align_corners=False)
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


class TestFlowWarp:
    def test_matches_grid_sample(self, rng):
        """Parity with the reference warp (super_resolution.py:104-143):
        grid + flow, normalised, grid_sample bilinear/zeros/align_corners=True."""
        b, h, w, c = 2, 13, 17, 8
        feat = rng.standard_normal((b, h, w, c)).astype(np.float32)
        flow = (rng.standard_normal((b, h, w, 2)) * 3).astype(np.float32)

        ours = np.asarray(ops.flow_warp(jnp.asarray(feat), jnp.asarray(flow)))

        tfeat = _nchw(feat)
        tflow = _nchw(flow)
        gy, gx = torch.meshgrid(
            torch.arange(h, dtype=torch.float32),
            torch.arange(w, dtype=torch.float32),
            indexing="ij",
        )
        grid = torch.stack([gx, gy], dim=0).unsqueeze(0).expand(b, -1, -1, -1)
        grid = grid + tflow
        grid = grid.clone()
        grid[:, 0] = 2.0 * grid[:, 0] / (w - 1) - 1.0
        grid[:, 1] = 2.0 * grid[:, 1] / (h - 1) - 1.0
        grid = grid.permute(0, 2, 3, 1)
        theirs = _to_nhwc(
            F.grid_sample(tfeat, grid, mode="bilinear", padding_mode="zeros", align_corners=True)
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_chunked_matches_unchunked(self, rng):
        feat = jnp.asarray(rng.standard_normal((1, 16, 12, 4)).astype(np.float32))
        flow = jnp.asarray((rng.standard_normal((1, 16, 12, 2)) * 4).astype(np.float32))
        full = ops.flow_warp(feat, flow, chunk_rows=0)
        chunked = ops.flow_warp(feat, flow, chunk_rows=4)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-5)

    def test_zero_flow_is_identity(self, rng):
        feat = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
        out = np.asarray(ops.flow_warp(jnp.asarray(feat), jnp.zeros((1, 8, 8, 2), np.float32)))
        np.testing.assert_allclose(out, feat, rtol=1e-5, atol=1e-5)

    def test_packed_gather_matches_default(self, rng):
        """The (B,H,W·C)-view gather is the same taps in the same order —
        outputs must be bitwise identical, including clamped edge flows."""
        b, h, w, c = 2, 13, 17, 8
        feat = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        flow = jnp.asarray((rng.standard_normal((b, h, w, 2)) * 6).astype(np.float32))
        base = np.asarray(ops.flow_warp(feat, flow, chunk_rows=0))
        packed = np.asarray(ops.flow_warp(feat, flow, chunk_rows=0, packed_gather=True))
        np.testing.assert_array_equal(packed, base)
        # chunked + packed (the serving configuration shape)
        base_c = np.asarray(ops.flow_warp(feat, flow, chunk_rows=4))
        packed_c = np.asarray(ops.flow_warp(feat, flow, chunk_rows=4, packed_gather=True))
        np.testing.assert_array_equal(packed_c, base_c)

    def test_packed_gather_single_column_edge(self, rng):
        feat = jnp.asarray(rng.standard_normal((1, 6, 1, 4)).astype(np.float32))
        flow = jnp.asarray((rng.standard_normal((1, 6, 1, 2)) * 2).astype(np.float32))
        base = np.asarray(ops.flow_warp(feat, flow, chunk_rows=0))
        packed = np.asarray(ops.flow_warp(feat, flow, chunk_rows=0, packed_gather=True))
        np.testing.assert_array_equal(packed, base)

    @pytest.mark.parametrize("shape,chunk", [((2, 8, 8, 5), 0), ((2, 13, 9, 4), 4),
                                             ((1, 1, 1, 3), 0), ((1, 32, 24, 8), 8)])
    def test_custom_vjp_matches_autodiff(self, rng, shape, chunk):
        """The one-hot-matmul backward (custom VJP) must equal the plain
        autodiff of the gather formulation — whose transpose is a TPU
        scatter-add that measured 617 ms vs the matmul backward's 7.5 ms at
        the (32, 64, 64, 32) train shape (the round-4 1.1 %-MFU root cause)."""
        from nerve_tpu.ops import warp as warp_mod

        b, h, w, c = shape
        feat = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        flow = jnp.asarray((rng.standard_normal((b, h, w, 2)) * 3).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))

        _, vjp_plain = jax.vjp(
            lambda fe, fl: warp_mod._flow_warp_impl(fe, fl, chunk, False), feat, flow
        )
        _, vjp_custom = jax.vjp(
            lambda fe, fl: ops.flow_warp(fe, fl, chunk_rows=chunk), feat, flow
        )
        (df_p, dfl_p), (df_c, dfl_c) = vjp_plain(g), vjp_custom(g)
        np.testing.assert_allclose(np.asarray(df_c), np.asarray(df_p),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dfl_c), np.asarray(dfl_p),
                                   rtol=1e-4, atol=1e-4)


class TestCorrelation:
    def _torch_corr(self, f1, f2, d):
        """The reference loop, verbatim semantics (efficient_layers.py:313-343)."""
        x1, x2 = _nchw(f1), _nchw(f2)
        b, c, h, w = x1.shape
        x2p = F.pad(x2, [d, d, d, d])
        out = []
        for i in range(2 * d + 1):
            for j in range(2 * d + 1):
                sl = x2p[:, :, i : i + h, j : j + w]
                out.append((x1 * sl).sum(dim=1, keepdim=True))
        return _to_nhwc(torch.cat(out, dim=1) / c)

    @pytest.mark.parametrize("d", [1, 4])
    def test_xla_matches_reference_semantics(self, rng, d):
        f1 = rng.standard_normal((2, 10, 12, 16)).astype(np.float32)
        f2 = rng.standard_normal((2, 10, 12, 16)).astype(np.float32)
        ours = np.asarray(
            ops.correlation_volume(jnp.asarray(f1), jnp.asarray(f2), d, use_pallas=False)
        )
        theirs = self._torch_corr(f1, f2, d)
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)

    def test_grad_flows(self, rng):
        f1 = jnp.asarray(rng.standard_normal((1, 6, 6, 4)).astype(np.float32))
        f2 = jnp.asarray(rng.standard_normal((1, 6, 6, 4)).astype(np.float32))
        g = jax.grad(lambda a, b: jnp.sum(ops.correlation_volume(a, b, 2, use_pallas=False)))(
            f1, f2
        )
        assert g.shape == f1.shape
        assert bool(jnp.any(g != 0))

    @pytest.mark.parametrize("planar", [False, True])
    @pytest.mark.parametrize("strips", [False, True])
    def test_pallas_kernels_match_xla_interpret(self, rng, planar, strips):
        """Both Pallas layouts (NHWC lane-reduce / channel-planar streaming
        sum) vs the XLA formulation, incl. the strip-mined wide-frame path."""
        from jax.experimental.pallas import tpu as pltpu

        from nerve_tpu.ops import correlation as corr

        d = 2
        h, w, c = 11, (40 if strips else 12), 8
        f1 = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
        f2 = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
        ref = corr._correlation_xla(f1, f2, d)
        impl = corr._correlation_pallas_planar if planar else corr._correlation_pallas
        with pltpu.force_tpu_interpret_mode():
            got = impl(f1, f2, d, th=8, tw=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestFusedRDB:
    def _params(self, rng, c=16):
        params = []
        cin = c
        for _ in range(5):
            params.append(jnp.asarray(rng.standard_normal((3, 3, cin, 32)).astype(np.float32)) * 0.05)
            params.append(jnp.asarray(rng.standard_normal((32,)).astype(np.float32)) * 0.01)
            cin += 32
        params.append(jnp.asarray(rng.standard_normal((cin, c)).astype(np.float32)) * 0.05)
        params.append(jnp.zeros((c,), jnp.float32))
        return tuple(params)

    @pytest.mark.parametrize("dx_major", [False, True])
    @pytest.mark.parametrize("pet_chunks", [False, True])
    def test_pallas_matches_xla_formulation(self, rng, dx_major, pet_chunks):
        """Fused kernel (interpret mode) vs the XLA RDB — tolerance covers the
        MXU's default bf16 operand rounding, which interpret mode emulates.
        All four chunk schedules (dy/dx-major packing × f32/native-dtype
        matmul emission) are exact-math variants and must agree."""
        from jax.experimental.pallas import tpu as pltpu

        from nerve_tpu.ops import rdb

        x = jnp.asarray(rng.standard_normal((2, 26, 30, 16)).astype(np.float32)) * 0.1
        params = self._params(rng)
        ref = rdb._rdb_xla(x, params)
        with pltpu.force_tpu_interpret_mode():
            single = rdb._rdb_pallas_nhwc(
                x, params, th=16, tw=120, dx_major=dx_major, pet_chunks=pet_chunks
            )
            tiled = rdb._rdb_pallas_nhwc(
                x, params, th=12, tw=16, dx_major=dx_major, pet_chunks=pet_chunks
            )
        # Exact incl. the outermost pixels: the kernel re-zeros out-of-image
        # halo strips between layers, matching per-conv SAME zero padding.
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(np.asarray(single), np.asarray(ref), atol=1e-5 * scale)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref), atol=1e-5 * scale)

    def test_gradient_via_custom_vjp(self, rng):
        from nerve_tpu.ops import rdb

        x = jnp.asarray(rng.standard_normal((1, 12, 12, 16)).astype(np.float32)) * 0.1
        params = self._params(rng)
        g = jax.grad(lambda xx: jnp.sum(rdb._rdb_xla(xx, params) ** 2))(x)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestPooling:
    def test_max_pool2d_matches_torch(self, rng):
        x = rng.standard_normal((2, 16, 16, 8)).astype(np.float32)
        ours = np.asarray(ops.max_pool2d(jnp.asarray(x), 3, 2, 1))
        theirs = _to_nhwc(F.max_pool2d(_nchw(x), 3, 2, 1))
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("out_size,in_size", [(8, 32), (8, 20), (1, 7)])
    def test_adaptive_avg_pool_matches_torch(self, rng, out_size, in_size):
        x = rng.standard_normal((2, in_size, in_size, 4)).astype(np.float32)
        ours = np.asarray(ops.adaptive_avg_pool2d(jnp.asarray(x), out_size))
        theirs = _to_nhwc(F.adaptive_avg_pool2d(_nchw(x), out_size))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


class TestMetrics:
    def test_psnr_known_value(self):
        from nerve_tpu.utils.metrics import psnr

        a = jnp.zeros((1, 8, 8, 3))
        b = jnp.full((1, 8, 8, 3), 0.1)
        # MSE = 0.01 → PSNR = 20 dB
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)

    def test_ssim_identity_is_one(self, rng):
        from nerve_tpu.utils.metrics import ssim

        x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_matches_torch_reference(self, rng):
        """Compare against a straightforward torch implementation of windowed SSIM."""
        from nerve_tpu.utils.metrics import ssim

        x = rng.random((1, 40, 40, 1)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
        ours = float(ssim(jnp.asarray(x), jnp.asarray(y)))

        # torch oracle
        tx, ty = _nchw(x), _nchw(y)
        k = torch.arange(11, dtype=torch.float32) - 5
        g = torch.exp(-(k**2) / (2 * 1.5**2))
        g = (g / g.sum()).view(1, 1, 11, 1)
        win = g @ g.view(1, 1, 1, 11)

        def blur(z):
            return F.conv2d(z, win)

        mu_x, mu_y = blur(tx), blur(ty)
        sxx = blur(tx * tx) - mu_x**2
        syy = blur(ty * ty) - mu_y**2
        sxy = blur(tx * ty) - mu_x * mu_y
        c1, c2 = 0.01**2, 0.03**2
        s = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
            (mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2)
        )
        np.testing.assert_allclose(ours, float(s.mean()), rtol=1e-4, atol=1e-4)

    def test_ms_ssim_identity_is_one(self, rng):
        from nerve_tpu.utils.metrics import ms_ssim

        x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        assert float(ms_ssim(x, x, levels=3)) == pytest.approx(1.0, abs=1e-5)

    def test_ms_ssim_single_level_equals_ssim(self, rng):
        from nerve_tpu.utils.metrics import ms_ssim, ssim

        x = rng.random((1, 32, 32, 3)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
        a = float(ms_ssim(jnp.asarray(x), jnp.asarray(y), levels=1))
        b = float(ssim(jnp.asarray(x), jnp.asarray(y)))
        assert a == pytest.approx(b, abs=1e-5)

    def test_ms_ssim_monotone_under_noise(self, rng):
        from nerve_tpu.utils.metrics import ms_ssim

        x = rng.random((1, 96, 96, 3)).astype(np.float32)
        scores = []
        for sd in (0.02, 0.08, 0.25):
            y = np.clip(x + rng.normal(0, sd, x.shape), 0, 1).astype(np.float32)
            scores.append(float(ms_ssim(jnp.asarray(x), jnp.asarray(y), levels=3)))
        assert scores[0] > scores[1] > scores[2]

    def test_vmaf_proxy_scale_and_monotonicity(self, rng):
        import jax

        from nerve_tpu.utils.metrics import vmaf_proxy

        x = rng.random((1, 96, 96, 3)).astype(np.float32)
        fn = jax.jit(lambda a, b: vmaf_proxy(a, b, levels=3))
        perfect = float(fn(jnp.asarray(x), jnp.asarray(x)))
        assert perfect == pytest.approx(100.0, abs=1e-3)
        prev = perfect
        for sd in (0.02, 0.08, 0.25):
            y = np.clip(x + rng.normal(0, sd, x.shape), 0, 1).astype(np.float32)
            score = float(fn(jnp.asarray(x), jnp.asarray(y)))
            assert 0.0 <= score < prev
            prev = score
