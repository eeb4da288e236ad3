"""Model-level int8 serving path: calibration, variables, forward quality."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nerve_tpu.models import SuperResolutionNet
from nerve_tpu.models.quantize import calibrate_sr_scales, quantize_sr_variables
from nerve_tpu.models.streaming import streaming_prime, streaming_step


def _small_model(**kw):
    return SuperResolutionNet(
        scale_factor=2, num_features=32, num_residual_blocks=2,
        temporal_window=1, **kw,
    )


class TestQuantizedSR:
    def test_quantized_nonstandard_geometry(self):
        """quantized=True composes with non-default RDB geometries via the
        generic XLA int8 fallback (VERDICT r3 item #8): the fused Pallas
        kernel stays specialised to the reference's 5×32 block, but
        quantize_rdb_chain infers (num_layers, growth) from the param shapes
        and rdb_chain_int8_apply routes other geometries to the exact XLA
        formulation."""
        from nerve_tpu.models.super_resolution import RDBStack
        from nerve_tpu.ops import rdb_int8

        stack_f = RDBStack(num_features=16, num_blocks=2, num_layers=4,
                           growth_rate=16)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 12, 16, 16)) * 2 - 1
        vars_f = stack_f.init(jax.random.PRNGKey(1), x)
        ref = stack_f.apply(vars_f, x)

        from nerve_tpu.models.quantize import rdb_params_from_tree

        params_list = rdb_params_from_tree(vars_f["params"], 2, num_layers=4)
        assert rdb_int8.chain_geometry(
            rdb_int8.quantize_rdb_chain(
                params_list, jnp.ones((2, 5)))) == (4, 16)
        scales = rdb_int8.calibrate_rdb_chain(x.astype(jnp.float32), params_list)
        assert scales.shape == (2, 5)  # (num_blocks, 1 + num_layers)
        qchain = rdb_int8.quantize_rdb_chain(params_list, scales)

        stack_q = RDBStack(num_features=16, num_blocks=2, num_layers=4,
                           growth_rate=16, quantized=True)
        out = stack_q.apply(
            {"params": vars_f["params"], "quant": {"qchain": qchain}}, x
        )
        assert out.shape == ref.shape
        err = float(jnp.max(jnp.abs(out - ref)))
        assert err < 0.1, f"max abs err {err}"
        psnr_like = -10 * np.log10(float(jnp.mean((out - ref) ** 2)) + 1e-12)
        assert psnr_like > 30, f"quantisation 'PSNR' vs f32 only {psnr_like:.1f} dB"

    def test_quantized_nonstandard_geometry_init(self):
        """init of a non-default quantized stack builds a structure-valid
        default quant collection (unit scales) without raising."""
        from nerve_tpu.models.super_resolution import RDBStack

        stack = RDBStack(num_features=16, num_blocks=1, num_layers=4,
                         growth_rate=16, quantized=True)
        x = jnp.zeros((1, 8, 8, 16))
        variables = stack.init(jax.random.PRNGKey(0), x)
        wq, dq, meta = variables["quant"]["qchain"][0]
        assert len(wq) == 5 and dq.shape == (4, 144)  # 4 layers, 9·16 taps

    def test_quantized_forward_tracks_f32(self):
        model = _small_model()
        qmodel = _small_model(quantized=True)
        key = jax.random.PRNGKey(0)
        frames = jax.random.uniform(key, (1, 3, 16, 24, 3))
        variables = model.init(jax.random.PRNGKey(1), frames)

        ref = model.apply(variables, frames)
        variables_q = quantize_sr_variables(qmodel, variables, frames)
        out = qmodel.apply(variables_q, frames)

        assert out.shape == ref.shape
        # Output is clamped [0,1]; int8 RDB quantisation error stays small
        # relative to that range (headline gate: PSNR delta on eval_parity).
        err = float(jnp.max(jnp.abs(out - ref)))
        assert err < 0.05, f"max abs err {err}"
        psnr_like = -10 * np.log10(float(jnp.mean((out - ref) ** 2)) + 1e-12)
        assert psnr_like > 35, f"quantisation 'PSNR' vs f32 only {psnr_like:.1f} dB"

    def test_scales_shape(self):
        model = _small_model(quantized=True)
        frames = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 16, 24, 3))
        variables = model.clone(quantized=False).init(jax.random.PRNGKey(1), frames)
        scales = calibrate_sr_scales(model, variables, frames)
        assert scales.shape == (2, 6)
        assert bool(jnp.all(scales > 0))

    def test_streaming_with_quant_collection(self):
        """The quant collection flows through the streaming methods."""
        model = _small_model(quantized=True)
        key = jax.random.PRNGKey(0)
        frames = jax.random.uniform(key, (1, 3, 16, 24, 3))
        variables = model.clone(quantized=False).init(jax.random.PRNGKey(1), frames)
        variables_q = quantize_sr_variables(model, variables, frames)

        carry = streaming_prime(model, variables_q, frames[:, 0])
        carry, out = streaming_step(model, variables_q, carry, frames[:, 1])
        assert out.shape == (1, 32, 48, 3)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_engine_quantized_path(self):
        """EnhancementEngine with sr_quantized: calibrate through the whole
        pipeline, then forward with the int8 RDB chain."""
        import dataclasses

        from nerve_tpu.models.enhancement_engine import EngineConfig, EnhancementEngine
        from nerve_tpu.models.quantize import quantize_engine_variables

        cfg = EngineConfig(
            frame_recovery_enabled=False, sr_num_features=32,
            sr_num_residual_blocks=2, sr_temporal_window=1,
        )
        engine = EnhancementEngine(dataclasses.replace(cfg, sr_quantized=True))
        frames = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 16, 24, 3))
        variables = EnhancementEngine(cfg).init(jax.random.PRNGKey(1), frames)
        ref = EnhancementEngine(cfg).apply(variables, frames)["enhanced"]

        variables_q = quantize_engine_variables(engine, variables, frames)
        out = engine.apply(variables_q, frames)["enhanced"]
        assert out.shape == ref.shape
        assert float(jnp.max(jnp.abs(out - ref))) < 0.05

    def test_quantized_chains_forward_tracks_f32(self):
        """quantized_chains=True (int8 at head/flow/attn/gff/upsampler too —
        VERDICT r3 item #2) calibrates every site in one pass and stays
        close to the f32 forward."""
        model = _small_model()
        qmodel = _small_model(quantized=True, quantized_chains=True)
        key = jax.random.PRNGKey(0)
        frames = jax.random.uniform(key, (1, 3, 16, 24, 3))
        variables = model.init(jax.random.PRNGKey(1), frames)
        # Perturb ALL params (the upsampler/flow convs are zero-initialised;
        # untrained, the output would be exactly the clamped bicubic base in
        # both paths and the comparison would be vacuous).
        leaves, treedef = jax.tree.flatten(variables["params"])
        keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
        variables = dict(variables)
        variables["params"] = jax.tree.unflatten(treedef, [
            p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
            for p, k in zip(leaves, keys)
        ])

        ref = model.apply(variables, frames)
        variables_q = quantize_sr_variables(qmodel, variables, frames)
        # Every chain site calibrated its own entry.
        q = variables_q["quant"]
        assert "qchain" in q["rdbs"]
        assert "qhead" in q["feature_extractor"]
        assert "qflow" in q["motion_estimator"]
        assert "qattn" in q["temporal_aggregator"]
        assert "qconv" in q["gff"]
        assert "qconv" in q["upsampler"]
        out = qmodel.apply(variables_q, frames)

        assert out.shape == ref.shape
        err = float(jnp.max(jnp.abs(out - ref)))
        # Nonzero: proves the int8 path actually ran (exact equality would
        # mean the quantised sites were skipped).
        assert 1e-7 < err < 0.1, f"max abs err {err}"
        psnr_like = -10 * np.log10(float(jnp.mean((out - ref) ** 2)) + 1e-12)
        assert psnr_like > 30, f"full-chain int8 'PSNR' vs f32 {psnr_like:.1f} dB"

    def test_quantized_chains_streaming(self):
        """The chain quant collection flows through the streaming methods."""
        model = _small_model(quantized=True, quantized_chains=True)
        key = jax.random.PRNGKey(0)
        frames = jax.random.uniform(key, (1, 3, 16, 24, 3))
        variables = model.clone(
            quantized=False, quantized_chains=False
        ).init(jax.random.PRNGKey(1), frames)
        variables_q = quantize_sr_variables(model, variables, frames)

        carry = streaming_prime(model, variables_q, frames[:, 0])
        carry, out = streaming_step(model, variables_q, carry, frames[:, 1])
        assert out.shape == (1, 32, 48, 3)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_init_creates_default_quant_collection(self):
        model = _small_model(quantized=True)
        frames = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 16, 24, 3))
        variables = model.init(jax.random.PRNGKey(1), frames)
        assert "quant" in variables
        qchain = variables["quant"]["rdbs"]["qchain"]
        assert len(qchain) == 2
        wq, dq, meta = qchain[0]
        assert wq[0].dtype == jnp.int8 and dq.shape == (5, 288)
