"""Continual-learning subsystem tests, mirroring the reference's behavioural
properties (tests/test_continual.py in the reference) plus the gaps it left
untested (SI path-integral, Reptile movement, memory strategies)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerve_tpu.continual import (
    EWC,
    FOMAML,
    MAML,
    ContentAdaptiveMAML,
    ContinualDistillation,
    DistillationLoss,
    EpisodicMemory,
    OnlineEWC,
    Reptile,
    StreamingEpisodicMemory,
    SynapticIntelligence,
)


# --------------------------------------------------------------------------- #
# A tiny linear model standing in for the video nets (the reference tests do
# the same with nn.Linear(10, 10), test_continual.py:61).
# --------------------------------------------------------------------------- #


def linear_apply(params, x):
    return x @ params["w"] + params["b"]


def make_linear_params(key, din=10, dout=10):
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.normal(k1, (din, dout)) * 0.1,
        "b": jnp.zeros((dout,)),
    }


def mse_loss(params, batch):
    x, y = batch
    return jnp.mean((linear_apply(params, x) - y) ** 2)


@pytest.fixture
def lin_params():
    return make_linear_params(jax.random.PRNGKey(0))


def make_batch(key, n=16):
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (n, 10))
    y = jax.random.normal(ky, (n, 10))
    return (x, y)


# --------------------------------------------------------------------------- #
# Episodic memory
# --------------------------------------------------------------------------- #


class TestEpisodicMemory:
    def _fill(self, mem, n, content_types=("a", "b")):
        rng = np.random.default_rng(0)
        for i in range(n):
            mem.store(
                rng.random((4, 4, 3)).astype(np.float32),
                rng.random((8, 8, 3)).astype(np.float32),
                {"content_type": content_types[i % len(content_types)]},
                importance=float(i),
            )

    def test_store_and_sample_shapes(self):
        mem = EpisodicMemory(capacity=20)
        self._fill(mem, 10)
        batch = mem.sample(4)
        assert batch["lr"].shape == (4, 4, 4, 3)
        assert batch["hr"].shape == (4, 8, 8, 3)

    def test_capacity_enforced(self):
        mem = EpisodicMemory(capacity=5, strategy="fifo")
        self._fill(mem, 20)
        assert len(mem) == 5

    @pytest.mark.parametrize("strategy", ["reservoir", "stratified", "importance", "fifo"])
    def test_strategies_respect_capacity(self, strategy):
        mem = EpisodicMemory(capacity=8, strategy=strategy)
        self._fill(mem, 50)
        assert len(mem) <= 8

    def test_importance_keeps_most_important(self):
        mem = EpisodicMemory(capacity=5, strategy="importance")
        self._fill(mem, 50)
        imps = [s.importance for s in mem._samples]
        # The last (highest-importance) samples should dominate.
        assert min(imps) >= 40

    def test_content_filtered_sampling(self):
        mem = EpisodicMemory(capacity=20)
        self._fill(mem, 10, content_types=("x", "y"))
        batch = mem.sample(4, content_type="x")
        assert batch is not None and batch["lr"].shape[0] == 4
        assert mem.sample(4, content_type="missing") is None

    def test_stats_and_clear(self):
        mem = EpisodicMemory(capacity=10)
        self._fill(mem, 6)
        stats = mem.get_stats()
        assert stats["size"] == 6
        assert set(stats["content_distribution"]) == {"a", "b"}
        mem.clear()
        assert len(mem) == 0 and mem.sample(2) is None

    def test_save_load_roundtrip(self, tmp_path):
        mem = EpisodicMemory(capacity=10)
        self._fill(mem, 6)
        p = str(tmp_path / "mem.npz")
        mem.save(p)
        mem2 = EpisodicMemory(capacity=10)
        mem2.load(p)
        assert len(mem2) == 6
        np.testing.assert_array_equal(mem2._samples[0].frame_lr, mem._samples[0].frame_lr)

    def test_streaming_recency_bias(self):
        mem = StreamingEpisodicMemory(capacity=50, recency_weight=0.95)
        rng = np.random.default_rng(0)
        for i in range(50):
            mem.store(
                np.full((2, 2, 1), i, np.float32),
                np.full((4, 4, 1), i, np.float32),
                {"content_type": "a"},
            )
        batch = mem.sample(20)
        # With heavy recency weighting, recent samples dominate.
        mean_val = batch["lr"].mean()
        assert mean_val > 15.0

    def test_streaming_recency_at_capacity(self):
        """Timestamps must track the slots replacement-evictions land in.

        Round-1 defect: after a reservoir replacement at index i, the NEW
        timestamp was appended at the end while slot i kept its stale one, so
        recency weights attached to the wrong samples. Verify every slot's
        timestamp matches the value stored in it (values encode store order).
        """
        for strategy in ("reservoir", "fifo", "importance", "stratified"):
            mem = StreamingEpisodicMemory(
                capacity=8, strategy=strategy, recency_weight=0.95, seed=1
            )
            for i in range(64):
                mem.store(
                    np.full((2, 2, 1), i, np.float32),
                    np.full((4, 4, 1), i, np.float32),
                    {"content_type": "ab"[i % 2]},
                    importance=float(i),  # monotone so 'importance' always evicts
                )
            assert len(mem._timestamps) == len(mem._samples)
            for ts, s in zip(mem._timestamps, mem._samples):
                # store i happens at clock i+1
                assert ts == int(s.frame_lr[0, 0, 0]) + 1, strategy
            # And the recency-weighted sampler therefore favours late stores.
            batch = mem.sample(20)
            assert batch["lr"].mean() > 16.0, strategy


# --------------------------------------------------------------------------- #
# EWC / SI
# --------------------------------------------------------------------------- #


class TestEWC:
    def test_penalty_zero_before_registration(self, lin_params):
        ewc = EWC(mse_loss)
        assert float(ewc.penalty(lin_params)) == 0.0

    def test_penalty_increases_with_perturbation(self, lin_params):
        """The key behavioural property (reference test_continual.py:60-89)."""
        ewc = EWC(mse_loss, lam=1.0)
        batches = [make_batch(jax.random.PRNGKey(i)) for i in range(3)]
        ewc.register_task(0, lin_params, batches)
        assert ewc.num_tasks == 1
        p0 = float(ewc.penalty(lin_params))
        assert p0 == pytest.approx(0.0, abs=1e-8)
        perturbed = jax.tree_util.tree_map(lambda p: p + 0.5, lin_params)
        assert float(ewc.penalty(perturbed)) > p0

    def test_separate_mode_accumulates_tasks(self, lin_params):
        ewc = EWC(mse_loss, mode="separate")
        for t in range(2):
            ewc.register_task(t, lin_params, [make_batch(jax.random.PRNGKey(t))])
        assert ewc.num_tasks == 2
        perturbed = jax.tree_util.tree_map(lambda p: p + 1.0, lin_params)
        assert float(ewc.penalty(perturbed)) > 0

    def test_online_ewc_ema_merges(self, lin_params):
        ewc = OnlineEWC(mse_loss, decay=0.5)
        ewc.register_task(0, lin_params, [make_batch(jax.random.PRNGKey(0))])
        f1 = float(jnp.sum(ewc._fisher["w"]))
        ewc.register_task(1, lin_params, [make_batch(jax.random.PRNGKey(1))])
        f2 = float(jnp.sum(ewc._fisher["w"]))
        assert f2 != f1

    def test_per_sample_fisher(self, lin_params):
        ewc = EWC(mse_loss, per_sample_fisher=True)
        ewc.register_task(0, lin_params, [make_batch(jax.random.PRNGKey(0), n=4)])
        assert float(jnp.sum(ewc._fisher["w"])) > 0

    def test_state_dict_roundtrip(self, lin_params):
        ewc = EWC(mse_loss)
        ewc.register_task(0, lin_params, [make_batch(jax.random.PRNGKey(0))])
        sd = ewc.state_dict()
        ewc2 = EWC(mse_loss)
        ewc2.load_state_dict(sd)
        perturbed = jax.tree_util.tree_map(lambda p: p + 0.1, lin_params)
        np.testing.assert_allclose(
            float(ewc.penalty(perturbed)), float(ewc2.penalty(perturbed)), rtol=1e-6
        )


class TestSynapticIntelligence:
    def test_importance_accumulates_and_penalizes(self, lin_params):
        si = SynapticIntelligence(lam=1.0)
        si.start_task(lin_params)
        params = lin_params
        for i in range(5):
            batch = make_batch(jax.random.PRNGKey(i))
            g = jax.grad(mse_loss)(params, batch)
            new_params = jax.tree_util.tree_map(lambda p, gi: p - 0.05 * gi, params, g)
            si.update_importance(params, new_params, g)
            params = new_params
        si.register_task(params)
        assert float(si.penalty(params)) == pytest.approx(0.0, abs=1e-8)
        perturbed = jax.tree_util.tree_map(lambda p: p + 0.5, params)
        assert float(si.penalty(perturbed)) > 0


# --------------------------------------------------------------------------- #
# MAML family
# --------------------------------------------------------------------------- #


def regression_task_batches(key, n_tasks=4, n=8):
    """Sine-offset regression tasks with a task leading axis."""
    keys = jax.random.split(key, n_tasks)
    xs, ys = [], []
    for i, k in enumerate(keys):
        x = jax.random.normal(k, (n, 10))
        y = x * 0.5 + i * 0.1
        xs.append(x)
        ys.append(y)
    return (jnp.stack(xs), jnp.stack(ys))


class TestMAML:
    def test_adapt_changes_params(self, lin_params):
        maml = MAML(mse_loss, lin_params, inner_steps=3)
        batch = make_batch(jax.random.PRNGKey(0))
        adapted = maml.adapt(batch)
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), adapted, lin_params
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0

    @pytest.mark.parametrize("cls", [MAML, FOMAML])
    def test_meta_training_reduces_loss(self, cls, lin_params):
        maml = cls(mse_loss, lin_params, inner_lr=0.05, outer_lr=0.01, inner_steps=2)
        key = jax.random.PRNGKey(0)
        support = regression_task_batches(key)
        query = regression_task_batches(jax.random.PRNGKey(1))
        losses = [maml.train_step(support, query) for _ in range(20)]
        assert losses[-1] < losses[0]

    def test_reptile_moves_toward_tasks(self, lin_params):
        rep = Reptile(mse_loss, lin_params, inner_lr=0.05, outer_lr=0.5, inner_steps=3)
        tasks = regression_task_batches(jax.random.PRNGKey(0))
        before = mse_loss(rep.params, (tasks[0][0], tasks[1][0]))
        for _ in range(10):
            rep.train_step(tasks)
        after = mse_loss(rep.params, (tasks[0][0], tasks[1][0]))
        assert float(after) < float(before)

    def test_content_adaptive_lrs(self, lin_params):
        cam = ContentAdaptiveMAML(mse_loss, lin_params, inner_steps=2)
        batch = make_batch(jax.random.PRNGKey(0))
        adapted = cam.adapt_to_content(batch, "sports")
        assert jax.tree_util.tree_structure(adapted) == jax.tree_util.tree_structure(lin_params)
        before = float(cam.log_inner_lrs["sports"])
        cam.meta_update_content_lr("sports", batch, make_batch(jax.random.PRNGKey(1)))
        assert float(cam.log_inner_lrs["sports"]) != before


# --------------------------------------------------------------------------- #
# Distillation
# --------------------------------------------------------------------------- #


class TestDistillation:
    def test_loss_pure_distill_and_blend(self):
        dl = DistillationLoss(alpha=0.5)
        s = jnp.ones((2, 4))
        t = jnp.zeros((2, 4))
        assert float(dl(s, t)) == pytest.approx(1.0)
        tgt = jnp.ones((2, 4))
        assert float(dl(s, t, tgt)) == pytest.approx(0.5)

    def test_continual_distillation_keys_and_teacher(self, lin_params):
        cd = ContinualDistillation(linear_apply)
        x, y = make_batch(jax.random.PRNGKey(0))
        out = cd.compute_loss(lin_params, x, y)
        assert set(out) == {"task", "distill", "total"}
        assert float(out["distill"]) == 0.0
        cd.register_task(lin_params)
        assert cd.num_tasks == 1
        out2 = cd.compute_loss(lin_params, x, y)
        # Teacher == student → distillation term 0, total = (1-α)·task.
        assert float(out2["distill"]) == pytest.approx(0.0, abs=1e-8)
        perturbed = jax.tree_util.tree_map(lambda p: p + 0.1, lin_params)
        out3 = cd.compute_loss(perturbed, x, y)
        assert float(out3["distill"]) > 0
