"""Model export for deployment.

The reference's CI pipeline has an ONNX-export + FP16-quantise *stub*
(.github/workflows/model-deployment.yml:40-60 — echo statements only). The
TPU-native real equivalent is StableHLO serialisation via ``jax.export``:
the jitted forward (with weights embedded or as arguments) becomes a
portable, versioned artifact any XLA runtime (TPU/GPU/CPU, TF, IREE) can
load — plus an optional bf16 weight cast as the "quantised" variant.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def export_stablehlo(
    fn,
    example_args: Sequence[Any],
    path: str,
) -> int:
    """Serialise ``jax.jit(fn)`` at the example shapes to a StableHLO blob.

    Returns the number of bytes written.
    """
    exported = jax.export.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_stablehlo(path: str):
    """Deserialise an exported function; returns a callable."""
    with open(path, "rb") as f:
        blob = f.read()
    exported = jax.export.deserialize(blob)
    return exported.call


def cast_params_bf16(params: Any) -> Any:
    """bf16 weight cast — the deployment 'quantised' variant (the reference
    CI's FP16-quantise step is a stub; bf16 is the TPU-native precision)."""
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params,
    )


def export_sr_model(
    model,
    variables: Any,
    input_shape: Tuple[int, ...],
    path: str,
    quantize: bool = False,
) -> int:
    """Export an SR model forward (weights embedded) to StableHLO."""
    if quantize:
        variables = dict(variables)
        variables["params"] = cast_params_bf16(variables["params"])

    def forward(x):
        return model.apply(variables, x)

    example = jnp.zeros(input_shape, jnp.float32)
    return export_stablehlo(forward, (example,), path)
