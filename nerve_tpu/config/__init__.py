"""Config loading for NERVE-TPU.

Unlike the reference — whose ``nerve_cl/config/default.yaml`` is declared but
never loaded by any code — this package ships a typed schema
(:mod:`nerve_tpu.config.schema`) plus a YAML loader with dotted overrides,
and all ``experiments/`` entry points consume it.
"""

from __future__ import annotations

import os
from typing import Optional

import yaml

from nerve_tpu.config.schema import (  # noqa: F401
    ABRAgentConfig,
    ABRConfig,
    ABRRewardConfig,
    CheckpointConfig,
    Config,
    ContinualConfig,
    DataConfig,
    DistillationConfig,
    EnhancementConfig,
    EWCConfig,
    FederatedConfig,
    FrameRecoveryConfig,
    MAMLConfig,
    MemoryConfig,
    MeshConfig,
    MetricsConfig,
    MLOpsConfig,
    ModelConfig,
    PrivacyConfig,
    ProjectConfig,
    QualityLevelConfig,
    SuperResolutionConfig,
    TrainingConfig,
    apply_overrides,
    config_from_dict,
    config_to_dict,
)

_DEFAULT_YAML = os.path.join(os.path.dirname(__file__), "default.yaml")


def load_config(path: Optional[str] = None, overrides: Optional[dict] = None) -> Config:
    """Load a Config from YAML (defaults to the packaged default.yaml).

    Args:
        path: YAML file path; None loads the packaged defaults.
        overrides: dotted-path overrides, e.g. {"training.batch_size": 8}.
    """
    if path is None:
        path = _DEFAULT_YAML
    if os.path.exists(path):
        with open(path) as f:
            data = yaml.safe_load(f) or {}
    else:
        data = {}
    cfg = config_from_dict(data)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(config_to_dict(cfg), f, sort_keys=False)
