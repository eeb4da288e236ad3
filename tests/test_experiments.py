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


class TestEnhance:
    """nerve-enhance serving CLI (experiments/enhance.py) — the whole-video
    workflow the reference only exposes as a Python API
    (nerve_cl/models/enhancement_engine.py:186-248)."""

    def _write_video(self, path, t=4, c=3, h=16, w=16, dtype=np.float32):
        rng = np.random.default_rng(0)
        video = rng.uniform(0, 1, (t, c, h, w)).astype(np.float32)
        if dtype == np.uint8:
            video = (video * 255).astype(np.uint8)
        np.save(path, video)
        return video

    def test_sr_only_npy(self, tmp_path, capsys):
        from experiments import enhance

        inp, outp = tmp_path / "v.npy", tmp_path / "out.npy"
        self._write_video(inp)
        rc = enhance.main([
            str(inp), "-o", str(outp), "--mode", "sr_only",
            "--sr-features", "8", "--sr-blocks", "1",
        ])
        assert rc == 0
        out = np.load(outp)
        assert out.shape == (4, 3, 32, 32) and out.dtype == np.uint8
        import json
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["frames"] == 4 and summary["mode"] == "sr_only"

    def test_uint8_ingest_lightweight_float_out(self, tmp_path):
        from experiments import enhance

        inp, outp = tmp_path / "v.npy", tmp_path / "out.npy"
        self._write_video(inp, dtype=np.uint8)
        rc = enhance.main([
            str(inp), "-o", str(outp), "--mode", "lightweight", "--float",
        ])
        assert rc == 0
        out = np.load(outp)
        assert out.shape == (4, 3, 32, 32) and out.dtype == np.float32
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_adaptive_budget_picks_lightweight(self, tmp_path, capsys):
        from experiments import enhance

        inp, outp = tmp_path / "v.npy", tmp_path / "out.npy"
        self._write_video(inp)
        rc = enhance.main([
            str(inp), "-o", str(outp), "--adaptive", "--budget", "0.2",
            "--sr-features", "8", "--sr-blocks", "1", "--mode", "sr_only",
        ])
        assert rc == 0
        import json
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["mode"] == "lightweight"  # budget < 0.3 threshold

    def test_int8_full_serving(self, tmp_path, capsys):
        """--int8 full: the engine calibrates on the input's first window
        and serves the fully-quantised SR net (RDB + all conv-chain sites)."""
        from experiments import enhance

        inp, outp = tmp_path / "v.npy", tmp_path / "out.npy"
        self._write_video(inp)
        rc = enhance.main([
            str(inp), "-o", str(outp), "--mode", "sr_only",
            "--sr-features", "8", "--sr-blocks", "1", "--int8", "full",
        ])
        assert rc == 0
        out = np.load(outp)
        assert out.shape == (4, 3, 32, 32) and out.dtype == np.uint8
        import json
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["int8"] == "full"

    def test_train_then_serve(self, tmp_path):
        """The full user workflow: nerve-train writes an orbax checkpoint,
        nerve-enhance grafts its SR params and serves."""
        from experiments import enhance, train_baseline

        ckpt = tmp_path / "ckpt"
        train_baseline.main([
            "--epochs", "1", "--batch-size", "4", "--train-samples", "8",
            "--val-samples", "4", "--lr-size", "16", "--num-features", "8",
            "--num-blocks", "1", "--checkpoint-dir", str(ckpt),
        ])
        inp, outp = tmp_path / "v.npy", tmp_path / "out.npy"
        self._write_video(inp)
        rc = enhance.main([
            str(inp), "-o", str(outp), "--mode", "sr_only",
            "--sr-features", "8", "--sr-blocks", "1",
            "--sr-checkpoint", str(ckpt),
        ])
        assert rc == 0
        assert np.load(outp).shape == (4, 3, 32, 32)

    def test_sr_checkpoint_shape_mismatch_errors(self, tmp_path):
        from experiments import enhance, train_baseline

        ckpt = tmp_path / "ckpt"
        train_baseline.main([
            "--epochs", "1", "--batch-size", "4", "--train-samples", "8",
            "--val-samples", "4", "--lr-size", "16", "--num-features", "8",
            "--num-blocks", "1", "--checkpoint-dir", str(ckpt),
        ])
        inp = tmp_path / "v.npy"
        self._write_video(inp)
        import pytest as _pytest

        with _pytest.raises(SystemExit, match="sr-checkpoint"):
            enhance.main([
                str(inp), "--mode", "sr_only",
                "--sr-features", "16", "--sr-blocks", "1",
                "--sr-checkpoint", str(ckpt),
            ])
