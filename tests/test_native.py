"""Native C++ pipeline tests: build, parity with the NumPy fallback, and the
prefetching loader."""

import numpy as np
import pytest

from nerve_tpu import native


@pytest.fixture(scope="module")
def have_native():
    return native.native_available()


class TestDegrade:
    def test_library_builds(self, have_native):
        assert have_native, "g++ build of the native pipeline failed"

    def test_deterministic_downsample_matches_numpy(self, have_native, rng):
        """With sigma=0 the pipeline is deterministic → exact parity."""
        hr = rng.random((3, 16, 20, 3)).astype(np.float32)
        ours = native.degrade_batch(hr, scale=2, noise_sigma=0.0)
        ref = native.degrade_batch(hr, scale=2, noise_sigma=0.0, force_numpy=True)
        assert ours.shape == (3, 8, 10, 3)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_blur_matches_numpy(self, have_native, rng):
        hr = rng.random((2, 12, 12, 1)).astype(np.float32)
        ours = native.degrade_batch(hr, scale=2, blur_k=3)
        ref = native.degrade_batch(hr, scale=2, blur_k=3, force_numpy=True)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_noise_statistics(self, have_native, rng):
        hr = np.full((4, 32, 32, 1), 0.5, np.float32)
        lr = native.degrade_batch(hr, scale=2, noise_sigma=0.05, seed=1)
        resid = lr - 0.5
        assert 0.03 < resid.std() < 0.07
        # Seeded determinism.
        lr2 = native.degrade_batch(hr, scale=2, noise_sigma=0.05, seed=1)
        np.testing.assert_array_equal(lr, lr2)

    def test_range_clamped(self, have_native, rng):
        hr = rng.random((2, 8, 8, 3)).astype(np.float32)
        lr = native.degrade_batch(hr, scale=2, noise_sigma=0.5)
        assert lr.min() >= 0.0 and lr.max() <= 1.0


class TestCorruptionMasks:
    def test_shapes_and_content(self, have_native):
        masks = native.corruption_masks(4, 32, 32, seed=0)
        assert masks.shape == (4, 32, 32, 1)
        for i in range(4):
            s = masks[i].sum()
            assert s > 0, "mask must corrupt something"
            assert s < 32 * 32, "mask must not corrupt everything"
        assert set(np.unique(masks)) <= {0.0, 1.0}

    def test_rectangles_are_contiguous(self, have_native):
        masks = native.corruption_masks(1, 24, 24, seed=3)[0, :, :, 0]
        ys, xs = np.nonzero(masks)
        area = (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)
        assert area == len(ys)  # bounding box fully filled → one rectangle


class TestPrefetchLoader:
    def test_yields_all_batches(self, rng):
        hr = rng.random((20, 16, 16, 3)).astype(np.float32)
        loader = native.PrefetchLoader(hr, batch_size=4, scale=2, noise_sigma=0.01)
        batches = list(loader)
        assert len(batches) == 5 == len(loader)
        for b in batches:
            assert b["lr"].shape == (4, 8, 8, 3)
            assert b["hr"].shape == (4, 16, 16, 3)

    def test_trains_with_loader(self):
        """End-to-end: the native pipeline feeds a jitted train step."""
        import jax
        import jax.numpy as jnp
        import optax

        from nerve_tpu.models import LightweightSuperResolution
        from nerve_tpu.utils.data import smooth_random_images

        hr = np.asarray(smooth_random_images(jax.random.PRNGKey(0), 16, 16))
        model = LightweightSuperResolution(scale_factor=2)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        params, stats = variables["params"], variables.get("batch_stats", {})
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(p, st, o, lr, hr_):
            def loss_fn(pp):
                out, mut = model.apply(
                    {"params": pp, "batch_stats": st}, lr, True, mutable=["batch_stats"]
                )
                return jnp.mean((out - hr_) ** 2), mut["batch_stats"]

            (loss, st2), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), st2, o, loss

        losses = []
        for batch in native.PrefetchLoader(hr, batch_size=8, scale=2):
            params, stats, opt_state, loss = step(
                params, stats, opt_state, jnp.asarray(batch["lr"]), jnp.asarray(batch["hr"])
            )
            losses.append(float(loss))
        assert all(np.isfinite(l) for l in losses)
