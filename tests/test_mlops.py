"""MLOps layer tests — drift statistics, A/B analysis, metric export.
These cover math the reference ships completely untested (SURVEY.md §4)."""

import numpy as np
import pytest

from nerve_tpu.mlops import (
    ABTestManager,
    DriftDetector,
    ExperimentConfig,
    MetricsExporter,
    ModelDriftMonitor,
    TrainingLogger,
)


class TestDriftDetector:
    def _ref(self, rng, n=400, d=5):
        return rng.normal(0, 1, (n, d))

    @pytest.mark.parametrize("method", ["mmd", "ks", "psi"])
    def test_no_drift_on_same_distribution(self, method):
        rng = np.random.default_rng(0)
        det = DriftDetector(method=method, threshold=0.05)
        det.set_reference(self._ref(rng))
        result = det.detect(self._ref(rng))
        assert not result.is_drift, (method, result.score)

    @pytest.mark.parametrize("method", ["mmd", "ks", "psi"])
    def test_detects_strong_shift(self, method):
        rng = np.random.default_rng(0)
        det = DriftDetector(method=method, threshold=0.05)
        det.set_reference(self._ref(rng))
        shifted = self._ref(rng) + 3.0
        result = det.detect(shifted)
        assert result.is_drift, (method, result.score)

    def test_windowed_update(self):
        rng = np.random.default_rng(0)
        det = DriftDetector(method="psi", window_size=50)
        det.set_reference(self._ref(rng))
        out = None
        for i in range(50):
            out = det.update(rng.normal(0, 1, 5))
        assert out is not None
        assert det.current_window == []

    def test_requires_reference(self):
        det = DriftDetector()
        with pytest.raises(ValueError):
            det.detect(np.zeros((10, 3)))


class TestModelDriftMonitor:
    def test_degradation_triggers_retrain(self):
        mon = ModelDriftMonitor(baseline_metric=80.0, window=10)
        out = None
        for _ in range(10):
            out = mon.record(60.0)  # 25% degradation
        assert out["should_retrain"]

    def test_stable_metric_no_retrain(self):
        mon = ModelDriftMonitor(baseline_metric=80.0, window=10)
        out = None
        for _ in range(10):
            out = mon.record(79.0)
        assert not out["should_retrain"]


class TestABTesting:
    def _mgr(self):
        mgr = ABTestManager()
        mgr.create_experiment(
            ExperimentConfig("exp1", "model_a", "model_b", traffic_split=0.5)
        )
        return mgr

    def test_assignment_deterministic_and_split(self):
        mgr = self._mgr()
        a1 = mgr.assign_variant("exp1", "user42")
        a2 = mgr.assign_variant("exp1", "user42")
        assert a1 == a2
        assignments = [mgr.assign_variant("exp1", f"u{i}") for i in range(1000)]
        frac = assignments.count("treatment") / 1000
        assert 0.4 < frac < 0.6

    def test_analysis_detects_improvement(self):
        mgr = self._mgr()
        rng = np.random.default_rng(0)
        for v in rng.normal(70, 2, 100):
            mgr.record_metric("exp1", "control", "vmaf", v)
        for v in rng.normal(75, 2, 100):
            mgr.record_metric("exp1", "treatment", "vmaf", v)
        res = mgr.analyze("exp1")
        assert res["significant"] and res["diff"] > 4
        conclusion = mgr.conclude_experiment("exp1")
        assert conclusion["winner"] == "model_b"

    def test_no_difference_keeps_control(self):
        mgr = self._mgr()
        rng = np.random.default_rng(0)
        for v in rng.normal(70, 2, 100):
            mgr.record_metric("exp1", "control", "vmaf", v)
        for v in rng.normal(70, 2, 100):
            mgr.record_metric("exp1", "treatment", "vmaf", v)
        conclusion = mgr.conclude_experiment("exp1")
        assert conclusion["winner"] == "model_a"

    def test_insufficient_data(self):
        mgr = self._mgr()
        assert mgr.analyze("exp1")["status"] == "insufficient_data"


class TestMonitoring:
    def test_exporter_snapshot(self):
        exp = MetricsExporter()  # no port → no HTTP server
        exp.gauge("psnr", 31.5)
        exp.counter_inc("frames", 10)
        exp.counter_inc("frames", 5)
        snap = exp.snapshot()
        assert snap["psnr"] == 31.5 and snap["frames"] == 15

    def test_training_logger_roundtrip(self, tmp_path):
        logger = TrainingLogger(str(tmp_path), "test")
        logger.log(1, {"loss": 0.5})
        logger.log(2, {"loss": 0.25}, note="ok")
        records = logger.read()
        assert len(records) == 2
        assert records[1]["loss"] == 0.25 and records[1]["note"] == "ok"
