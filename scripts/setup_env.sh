#!/usr/bin/env bash
# Environment bootstrap for NERVE-TPU (counterpart of the reference's
# scripts/setup_env.sh venv setup, adapted to JAX/TPU).
set -euo pipefail

PYTHON=${PYTHON:-python3}

$PYTHON -m venv .venv
source .venv/bin/activate
pip install --upgrade pip

if [[ "${NERVE_TPU_DEVICE:-tpu}" == "tpu" ]]; then
    pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
else
    pip install jax
fi

pip install flax optax orbax-checkpoint chex einops numpy pyyaml \
    gymnasium scipy prometheus-client pytest
pip install -e .

echo "Environment ready. Run: python -m pytest tests/ -q"
