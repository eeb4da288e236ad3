"""Utils tests: checkpoint/resume, export round-trip, profiling harness,
config system."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestConfig:
    def test_default_yaml_loads(self):
        from nerve_tpu import load_config

        cfg = load_config()
        assert cfg.model.super_resolution.num_features == 64
        assert cfg.continual.ewc.lam == 5000.0
        assert cfg.abr.quality_ladder[0].resolution == 360
        assert len(cfg.abr.quality_ladder) == 5

    def test_overrides(self):
        from nerve_tpu import load_config

        cfg = load_config(overrides={"training.batch_size": 4, "federated.num_clients": 7})
        assert cfg.training.batch_size == 4
        assert cfg.federated.num_clients == 7

    def test_unknown_key_raises(self):
        from nerve_tpu import load_config

        with pytest.raises(KeyError):
            load_config(overrides={"training.nonexistent": 1})

    def test_roundtrip(self, tmp_path):
        from nerve_tpu import load_config, save_config
        from nerve_tpu.config import config_to_dict

        cfg = load_config(overrides={"training.epochs": 3})
        p = str(tmp_path / "cfg.yaml")
        save_config(cfg, p)
        cfg2 = load_config(p)
        assert config_to_dict(cfg) == config_to_dict(cfg2)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from nerve_tpu.utils.checkpoint import CheckpointManager

        state = {
            "params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
            "step": jnp.int32(7),
        }
        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep_last_n=2)
        assert mgr.save(1, state)
        template = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored = mgr.restore(template)
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
        )
        assert int(restored["step"]) == 7
        mgr.close()

    def test_retention(self, tmp_path):
        from nerve_tpu.utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep_last_n=2)
        for step in range(4):
            mgr.save(step, {"x": jnp.float32(step)})
        assert mgr.latest_step() == 3
        restored = mgr.restore({"x": jnp.float32(0)})
        assert float(restored["x"]) == 3.0
        mgr.close()

    def test_missing_raises(self, tmp_path):
        from nerve_tpu.utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(tmp_path / "empty"))
        with pytest.raises(FileNotFoundError):
            mgr.restore({"x": jnp.float32(0)})
        mgr.close()


class TestExport:
    def test_stablehlo_roundtrip(self, tmp_path):
        from nerve_tpu.utils.export import export_stablehlo, load_stablehlo

        def fn(x):
            return jnp.sin(x) * 2.0

        x = jnp.linspace(0, 1, 16)
        p = str(tmp_path / "fn.stablehlo")
        nbytes = export_stablehlo(fn, (x,), p)
        assert nbytes > 0 and os.path.exists(p)
        loaded = load_stablehlo(p)
        np.testing.assert_allclose(
            np.asarray(loaded(x)), np.asarray(fn(x)), rtol=1e-6
        )

    def test_export_sr_model(self, tmp_path):
        from nerve_tpu.models import LightweightSuperResolution
        from nerve_tpu.utils.export import export_sr_model, load_stablehlo

        model = LightweightSuperResolution(scale_factor=2)
        x = jnp.zeros((1, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        p = str(tmp_path / "sr.stablehlo")
        nbytes = export_sr_model(model, variables, (1, 16, 16, 3), p)
        assert nbytes > 0
        loaded = load_stablehlo(p)
        out = loaded(x)
        ref = model.apply(variables, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_bf16_quantized_export(self, tmp_path):
        from nerve_tpu.models import LightweightSuperResolution
        from nerve_tpu.utils.export import export_sr_model

        model = LightweightSuperResolution(scale_factor=2)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        n_full = export_sr_model(model, variables, (1, 8, 8, 3), str(tmp_path / "f.hlo"))
        n_q = export_sr_model(
            model, variables, (1, 8, 8, 3), str(tmp_path / "q.hlo"), quantize=True
        )
        assert n_q < n_full  # bf16 weights halve the embedded constants


class TestProfiling:
    def test_timed_scan_measures(self):
        from nerve_tpu.utils.profiling import measure_dispatch_overhead, timed_scan

        x = jnp.ones((64, 64))
        out = timed_scan(lambda a: a @ a, x, iters=3)
        assert out["ms_per_call"] >= 0
        assert measure_dispatch_overhead(2) >= 0

    def test_timer_sections(self):
        from nerve_tpu.utils.profiling import Timer

        t = Timer()
        with t.section("a"):
            pass
        assert "a" in t.sections
