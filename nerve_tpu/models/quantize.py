"""Post-training int8 quantisation for SuperResolutionNet serving.

Builds the "quant" variable collection consumed by ``RDBStack(quantized=
True)`` (models/super_resolution.py): a calibration forward captures the
RDB chain's input (the temporal aggregator's output) on representative
frames, derives static per-tensor activation scales, and pre-quantises the
packed int8 weights (nerve_tpu.ops.rdb_int8).

Usage::

    model  = SuperResolutionNet(..., quantized=True)
    # variables: trained f32 variables of the SAME architecture
    variables_q = quantize_sr_variables(model, variables, calib_frames)
    out = model.apply(variables_q, frames)        # int8 RDB chain

No reference analogue (nerve_cl serves f32 torch); this is the TPU v5e
394-TOPS serving path.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from nerve_tpu.ops import rdb_int8


@jax.jit
def _calibrate_and_quantize(agg, params_list):
    """One jitted program for scale calibration + weight quantisation —
    eagerly this is ~100 tiny dispatches, painful on tunneled TPU setups."""
    scales = rdb_int8.calibrate_rdb_chain(agg, params_list)
    return scales, rdb_int8.quantize_rdb_chain(
        params_list, scales, per_channel=rdb_int8.PER_CHANNEL_INT8
    )


def rdb_params_from_tree(rdbs_params: Dict[str, Any], num_blocks: int,
                         num_layers: int = 5):
    """variables["params"]["rdbs"] → per-block flat param lists (f32)."""
    out = []
    for b in range(num_blocks):
        prm = []
        for i in range(num_layers):
            prm.append(jnp.asarray(rdbs_params[f"rdb{b}_dense{i}_kernel"], jnp.float32))
            prm.append(jnp.asarray(rdbs_params[f"rdb{b}_dense{i}_bias"], jnp.float32))
        prm.append(jnp.asarray(rdbs_params[f"rdb{b}_lff_kernel"], jnp.float32))
        prm.append(jnp.asarray(rdbs_params[f"rdb{b}_lff_bias"], jnp.float32))
        out.append(prm)
    return out


def _capture_sr_agg(model, variables, frames):
    """Calibration forward: capture the RDB chain's input (the temporal
    aggregator's output) plus the chain's flat f32 param lists."""
    cal_model = model.clone(quantized=False)
    cal_vars = {k: v for k, v in variables.items() if k != "quant"}
    _, inter = cal_model.apply(
        cal_vars, jnp.asarray(frames),
        capture_intermediates=lambda mdl, _: mdl.name == "temporal_aggregator",
        mutable=["intermediates"],
    )
    agg = inter["intermediates"]["temporal_aggregator"]["__call__"][0]
    params_list = rdb_params_from_tree(
        variables["params"]["rdbs"], model.num_residual_blocks
    )
    return agg.astype(jnp.float32), params_list


def calibrate_sr_scales(model, variables, frames) -> jnp.ndarray:
    """Run a calibration forward and return (num_blocks, 6) act scales.

    ``frames``: representative LR windows (B, T, H, W, C) — a handful of
    real frames is enough for per-tensor max-abs calibration.
    """
    agg, params_list = _capture_sr_agg(model, variables, frames)
    scales, _ = _calibrate_and_quantize(agg, params_list)
    return scales


def quantize_sr_variables(model, variables, frames) -> Dict[str, Any]:
    """f32 variables + calibration frames → variables with the quant
    collection (pre-quantised int8 chains). See module docstring.

    Every quantised site (the RDB stack with ``quantized=True``, and with
    ``quantized_chains=True`` also the feature head, flow head, attention
    logits, global fusion and upsampler convs) calibrates IN-GRAPH during
    one forward of a ``quant_calibrate=True`` clone: each site derives its
    max-abs activation scales from its true input distribution, stores the
    pre-quantised chain into the mutable "quant" collection, and passes the
    EXACT f32/bf16 result downstream. One jitted program — eagerly this is
    hundreds of tiny dispatches, painful on tunneled TPU setups.
    """
    cal_model = model.clone(quant_calibrate=True)
    cal_vars = {k: v for k, v in variables.items() if k != "quant"}

    @jax.jit
    def _run(v, f):
        _, mut = cal_model.apply(v, f, mutable=["quant"])
        return dict(mut).get("quant", {})

    quant = _run(cal_vars, jnp.asarray(frames))
    out = {k: v for k, v in variables.items() if k != "quant"}
    out["quant"] = quant
    return out


def quantize_engine_variables(engine, variables, frames,
                              corruption_mask=None) -> Dict[str, Any]:
    """EnhancementEngine analogue of :func:`quantize_sr_variables`.

    ``engine``: an EnhancementEngine whose config has ``sr_quantized=True``
    (and the full SR net enabled). ``frames``: (B, T, H, W, C) calibration
    windows run through the whole engine pipeline so the RDB chain sees its
    true input distribution (post-recovery, post-aggregation).
    """
    import dataclasses

    cal_cfg = dataclasses.replace(engine.config, sr_quant_calibrate=True)
    cal_engine = engine.clone(config=cal_cfg)
    cal_vars = {k: v for k, v in variables.items() if k != "quant"}

    adaptive = hasattr(cal_engine, "estimate_complexity")

    @jax.jit
    def _run(v, f, m):
        if adaptive:
            # AdaptiveEnhancementEngine(frames, budget, pref, train) — no
            # mask arg; the inner engine runs mask-free at default budget.
            _, mut = cal_engine.apply(v, f, mutable=["quant"])
        else:
            _, mut = cal_engine.apply(v, f, None, m, mutable=["quant"])
        return dict(mut).get("quant", {})

    quant = _run(cal_vars, jnp.asarray(frames), corruption_mask)
    out = {k: v for k, v in variables.items() if k != "quant"}
    out["quant"] = quant
    return out
