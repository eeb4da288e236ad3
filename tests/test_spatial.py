"""Spatial (height-sharded) parallel inference vs single-device forward.

With a zero-init flow head (fresh model ⇒ flow ≡ 0) the network's reach is
its conv stencil only, so a sufficient halo makes the sharded forward
EXACTLY equal to the single-device one — the test asserts that, plus the
output sharding layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerve_tpu.models import SuperResolutionNet
from nerve_tpu.parallel.mesh import make_mesh
from nerve_tpu.parallel.spatial import spatial_sr_apply, spatial_sharding


@pytest.fixture(scope="module")
def mesh4():
    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    return make_mesh(data=1, model=4)


def test_spatial_matches_single_device(mesh4):
    key = jax.random.PRNGKey(0)
    model = SuperResolutionNet(
        scale_factor=2, num_features=16, num_residual_blocks=1, temporal_window=1
    )
    frames = jax.random.uniform(key, (1, 3, 32, 24, 3), jnp.float32)
    variables = model.init(key, frames)

    want = model.apply(variables, frames)
    got = spatial_sr_apply(model, variables, frames, mesh4, halo=8)

    assert got.shape == want.shape == (1, 64, 48, 3)
    # halo=8 < receptive field: central rows (far from every slab boundary
    # relative to the shortfall) still agree loosely.
    np.testing.assert_allclose(
        np.asarray(got[:, 28:36]), np.asarray(want[:, 28:36]), atol=1e-2
    )


def test_spatial_exact_interior_with_sufficient_halo(mesh4):
    key = jax.random.PRNGKey(1)
    model = SuperResolutionNet(
        scale_factor=2, num_features=16, num_residual_blocks=1, temporal_window=1
    )
    frames = jax.random.uniform(key, (1, 3, 64, 16, 3), jnp.float32)
    variables = model.init(key, frames)

    want = model.apply(variables, frames)
    # halo = slab size (16) ≥ conv receptive field for this tiny net.
    got = spatial_sr_apply(model, variables, frames, mesh4, halo=16)
    # Interior rows (away from the image top/bottom edge band — see the
    # module docstring's exactness contract) are EXACT, including every
    # slab boundary.
    r = 2 * 18  # scale * receptive field
    np.testing.assert_allclose(
        np.asarray(got[:, r:-r]), np.asarray(want[:, r:-r]), atol=1e-5
    )
    # The edge bands stay close (different but valid boundary conditions).
    assert float(jnp.max(jnp.abs(got - want))) < 0.5


def test_spatial_exact_full_depth_realistic_slabs(mesh4):
    """Full default DEPTH (8 RDBs / 64 feats — receptive field R≈55 rows)
    with 64-row slabs and halo 64: the realistic RF-to-slab ratio of the
    driver dryrun's 540p-height case (__graft_entry__ case 4b), shrunk in
    batch-free width for suite runtime. Interior rows must be exact."""
    key = jax.random.PRNGKey(3)
    model = SuperResolutionNet(
        scale_factor=2, num_features=64, num_residual_blocks=8,
        temporal_window=1, flow_downsample=2,
    )
    frames = jax.random.uniform(key, (1, 3, 256, 48, 3), jnp.float32)
    variables = jax.jit(model.init)(key, frames[:, :, :64, :48])

    want = jax.jit(model.apply)(variables, frames)
    got = spatial_sr_apply(model, variables, frames, mesh4, halo=64)
    assert got.shape == want.shape == (1, 512, 96, 3)
    r = 2 * 70  # scale * (receptive field + margin)
    np.testing.assert_allclose(
        np.asarray(got[:, r:-r]), np.asarray(want[:, r:-r]), atol=5e-5
    )


def test_spatial_sharded_io_layout(mesh4):
    key = jax.random.PRNGKey(2)
    model = SuperResolutionNet(
        scale_factor=2, num_features=16, num_residual_blocks=1, temporal_window=1
    )
    frames = jax.random.uniform(key, (1, 3, 32, 16, 3), jnp.float32)
    variables = model.init(key, frames)
    sharded = jax.device_put(frames, spatial_sharding(mesh4))
    out = spatial_sr_apply(model, variables, sharded, mesh4, halo=8)
    # Output stays H-sharded over the model axis.
    spec = out.sharding.spec
    assert spec[1] == "model"


def test_spatial_rejects_indivisible_height(mesh4):
    model = SuperResolutionNet(
        scale_factor=2, num_features=16, num_residual_blocks=1, temporal_window=1
    )
    frames = jnp.zeros((1, 3, 30, 16, 3))
    with pytest.raises(ValueError, match="not divisible"):
        spatial_sr_apply(model, {}, frames, mesh4)


class TestSpatialLightweight:
    """Height-sharded LightweightSuperResolution (the ≥60 fps config)."""

    def _model_vars(self, key, h=64, w=24):
        from nerve_tpu.models import LightweightSuperResolution

        model = LightweightSuperResolution(scale_factor=2)
        frame = jax.random.uniform(key, (1, h, w, 3), jnp.float32)
        variables = model.init(key, frame)
        return model, variables, frame

    def test_exact_interior(self, mesh4=None):
        from nerve_tpu.parallel.spatial import spatial_lightweight_apply

        if jax.device_count() < 4:
            pytest.skip("needs >= 4 devices")
        mesh = make_mesh(data=1, model=4)
        key = jax.random.PRNGKey(3)
        model, variables, frame = self._model_vars(key)
        want = model.apply(variables, frame)
        got = spatial_lightweight_apply(model, variables, frame, mesh, halo=8)
        assert got.shape == want.shape == (1, 128, 48, 3)
        # halo 8 ≥ receptive field (6 conv rows + bicubic radius 2): every
        # row outside the image top/bottom edge band is exact, including all
        # slab boundaries.
        r = 2 * 8
        np.testing.assert_allclose(
            np.asarray(got[:, r:-r]), np.asarray(want[:, r:-r]), atol=1e-5
        )
        assert float(jnp.max(jnp.abs(got - want))) < 0.5

    @pytest.mark.parametrize("layout", ["planar", "packed"])
    def test_layouts_match_nhwc(self, layout):
        from nerve_tpu.parallel.spatial import spatial_lightweight_apply

        if jax.device_count() < 4:
            pytest.skip("needs >= 4 devices")
        mesh = make_mesh(data=1, model=4)
        key = jax.random.PRNGKey(4)
        model, variables, frame = self._model_vars(key)
        nhwc = np.asarray(
            spatial_lightweight_apply(model, variables, frame, mesh, halo=8)
        )
        got = np.asarray(
            spatial_lightweight_apply(
                model, variables, frame, mesh, halo=8, output_layout=layout
            )
        )
        if layout == "planar":
            ref = np.transpose(nhwc, (0, 3, 1, 2))
        else:
            ref = nhwc.reshape(nhwc.shape[0], nhwc.shape[1], -1)
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_combined_data_model(self):
        from nerve_tpu.parallel.spatial import spatial_lightweight_apply

        if jax.device_count() < 8:
            pytest.skip("needs >= 8 devices")
        mesh = make_mesh(data=2, model=4)
        key = jax.random.PRNGKey(5)
        from nerve_tpu.models import LightweightSuperResolution

        model = LightweightSuperResolution(scale_factor=2)
        frames = jax.random.uniform(key, (2, 64, 16, 3), jnp.float32)
        variables = model.init(key, frames[:1])
        want = model.apply(variables, frames)
        got = spatial_lightweight_apply(
            model, variables, frames, mesh, halo=8, data_axis="data"
        )
        r = 2 * 8
        np.testing.assert_allclose(
            np.asarray(got[:, r:-r]), np.asarray(want[:, r:-r]), atol=1e-5
        )


class TestSpatialStreaming:
    """Height-sharded streaming pipeline vs the single-device scan."""

    def test_exact_interior_vs_single_device_streaming(self):
        from nerve_tpu.models.streaming import enhance_video_streaming
        from nerve_tpu.parallel.spatial import spatial_streaming_apply

        if jax.device_count() < 4:
            pytest.skip("needs >= 4 devices")
        mesh = make_mesh(data=1, model=4)
        key = jax.random.PRNGKey(6)
        model = SuperResolutionNet(
            scale_factor=2, num_features=16, num_residual_blocks=1,
            temporal_window=1,
        )
        video = jax.random.uniform(key, (1, 4, 64, 16, 3), jnp.float32)
        variables = model.init(key, video[:, :3])

        want = enhance_video_streaming(model, variables, video)
        got = spatial_streaming_apply(model, variables, video, mesh, halo=16)
        assert got.shape == want.shape == (1, 4, 128, 32, 3)
        # halo = slab height ≥ the tiny net's receptive field: every frame's
        # interior rows (away from the image top/bottom edge band) are exact,
        # including all slab boundaries.
        r = 2 * 18
        np.testing.assert_allclose(
            np.asarray(got[:, :, r:-r]), np.asarray(want[:, :, r:-r]), atol=1e-5
        )
        assert float(jnp.max(jnp.abs(got - want))) < 0.5
