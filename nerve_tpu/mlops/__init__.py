"""MLOps layer: drift detection, A/B testing, monitoring export.

Parity with the reference's standalone ``mlops/`` utilities
(mlops/drift/detector.py, mlops/ab_testing/manager.py,
mlops/monitoring/prometheus.yml) — with the gaps closed: the reference ships
a Prometheus scrape config but no code ever exports metrics (SURVEY.md §5);
here :mod:`nerve_tpu.mlops.monitoring` actually serves them.
"""

from nerve_tpu.mlops.drift import DriftDetector, DriftResult, ModelDriftMonitor  # noqa: F401
from nerve_tpu.mlops.ab_testing import ABTestManager, ExperimentConfig  # noqa: F401
from nerve_tpu.mlops.monitoring import MetricsExporter, TrainingLogger  # noqa: F401
