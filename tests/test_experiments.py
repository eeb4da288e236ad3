"""Smoke tests for the CLI entry points — each runs a tiny end-to-end
configuration on CPU, exercising the full subsystem wiring."""

import sys

import numpy as np
import pytest


class TestTrainBaseline:
    def test_tiny_run(self, tmp_path):
        from experiments import train_baseline

        history = train_baseline.main(
            [
                "--epochs", "1",
                "--batch-size", "4",
                "--train-samples", "8",
                "--val-samples", "4",
                "--lr-size", "16",
                "--num-features", "8",
                "--num-blocks", "1",
                "--checkpoint-dir", str(tmp_path / "ckpt"),
            ]
        )
        assert np.isfinite(history["final_psnr"])


class TestTrainContinual:
    @pytest.mark.parametrize("strategy", ["ewc", "replay", "si"])
    def test_strategies(self, strategy):
        from experiments import train_continual

        scores = train_continual.main(
            [
                "--strategy", strategy,
                "--num-tasks", "2",
                "--epochs-per-task", "1",
                "--batch-size", "8",
                "--samples-per-task", "16",
            ]
        )
        assert len(scores) == 2
        assert all(np.isfinite(v) for v in scores.values())

    def test_maml_strategy_wired(self):
        """The reference declares --strategy maml but never implements it."""
        from experiments import train_continual

        scores = train_continual.main(
            [
                "--strategy", "maml",
                "--num-tasks", "2",
                "--epochs-per-task", "1",
                "--samples-per-task", "8",
            ]
        )
        assert len(scores) == 2


class TestTrainFederated:
    def test_mesh_simulation(self):
        from experiments import train_federated

        out = train_federated.main(
            [
                "--mode", "simulation",
                "--num-clients", "8",
                "--num-rounds", "2",
                "--samples-per-client", "8",
                "--local-steps", "2",
            ]
        )
        assert np.isfinite(out["final_loss"])

    def test_trainer_mode(self):
        from experiments import train_federated

        out = train_federated.main(
            [
                "--mode", "trainer",
                "--num-clients", "3",
                "--num-rounds", "1",
                "--samples-per-client", "8",
                "--local-epochs", "1",
            ]
        )
        assert np.isfinite(out["final_loss"])


class TestTrainABR:
    def test_sequential_training(self, tmp_path):
        from experiments import train_abr

        out = train_abr.main(
            [
                "--num-steps", "250",
                "--checkpoint", str(tmp_path / "ppo.npz"),
            ]
        )
        assert out["episodes"] > 0

    def test_vectorized_training(self, tmp_path):
        from experiments import train_abr

        out = train_abr.main(
            [
                "--vectorized",
                "--num-steps", "512",
                "--num-envs", "4",
                "--checkpoint", str(tmp_path / "ppo.npz"),
            ]
        )
        assert np.isfinite(out["mean_step_reward"])

    def test_eval_mode(self, tmp_path):
        from experiments import train_abr

        out = train_abr.main(
            ["--mode", "eval", "--checkpoint", str(tmp_path / "missing.npz")]
        )
        assert np.isfinite(out["mean_vmaf"])
