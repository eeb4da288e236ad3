"""Flower adapter: drive the Strategy facade with a faked flwr module.

flwr is not installed here, so the adapter is exercised against a minimal
in-test implementation of the Flower API surface it touches
(flwr.common.{ndarrays_to_parameters, parameters_to_ndarrays, FitIns,
EvaluateIns}, flwr.server.strategy.Strategy) — this validates the adapter's
logic and the exact API names it will resolve against the real package.
"""

from __future__ import annotations

import sys
import types
from dataclasses import dataclass, field
from typing import Any, Dict, List

import numpy as np
import pytest


@dataclass
class _Params:
    tensors: List[np.ndarray]


@dataclass
class _FitIns:
    parameters: Any
    config: Dict[str, Any]


@dataclass
class _EvaluateIns:
    parameters: Any
    config: Dict[str, Any]


@dataclass
class _FitRes:
    parameters: Any
    num_examples: int
    metrics: Dict[str, float] = field(default_factory=dict)


@dataclass
class _EvalRes:
    loss: float
    num_examples: int
    metrics: Dict[str, float] = field(default_factory=dict)


class _Client:
    def __init__(self, cid):
        self.cid = cid


class _ClientManager:
    def __init__(self, cids):
        self._clients = {cid: _Client(cid) for cid in cids}

    def all(self):
        return self._clients


@pytest.fixture
def fake_flwr(monkeypatch):
    flwr = types.ModuleType("flwr")
    common = types.ModuleType("flwr.common")
    common.ndarrays_to_parameters = lambda arrs: _Params([np.asarray(a) for a in arrs])
    common.parameters_to_ndarrays = lambda p: list(p.tensors)
    common.FitIns = _FitIns
    common.EvaluateIns = _EvaluateIns
    server = types.ModuleType("flwr.server")
    strategy = types.ModuleType("flwr.server.strategy")

    class Strategy:
        pass

    strategy.Strategy = Strategy
    flwr.common = common
    flwr.server = server
    server.strategy = strategy
    monkeypatch.setitem(sys.modules, "flwr", flwr)
    monkeypatch.setitem(sys.modules, "flwr.common", common)
    monkeypatch.setitem(sys.modules, "flwr.server", server)
    monkeypatch.setitem(sys.modules, "flwr.server.strategy", strategy)
    return flwr


class TestFlowerAdapter:
    def test_import_error_without_flwr(self):
        from nerve_tpu.federated.flower_compat import make_flower_strategy

        with pytest.raises(ImportError, match="flwr is not installed"):
            make_flower_strategy()

    def test_round_trip(self, fake_flwr):
        from nerve_tpu.federated.flower_compat import make_flower_strategy

        init = [np.ones((2, 2), np.float32), np.zeros((3,), np.float32)]
        strat = make_flower_strategy(
            initial_parameters=init, min_fit_clients=2, fraction_fit=0.5, seed=0
        )

        params0 = strat.initialize_parameters(_ClientManager([]))
        assert [a.shape for a in params0.tensors] == [(2, 2), (3,)]

        cm = _ClientManager([f"c{i}" for i in range(4)])
        fits = strat.configure_fit(1, params0, cm)
        assert len(fits) == 2
        client, fit_ins = fits[0]
        assert fit_ins.config["local_epochs"] == 5
        assert fit_ins.config["server_round"] == 1

        # Two clients report updated parameters; FedAvg must weight by n.
        r1 = _FitRes(_Params([np.full((2, 2), 2.0, np.float32),
                              np.full((3,), 2.0, np.float32)]), 1, {"loss": 1.0})
        r2 = _FitRes(_Params([np.full((2, 2), 4.0, np.float32),
                              np.full((3,), 4.0, np.float32)]), 3, {"loss": 3.0})
        agg, metrics = strat.aggregate_fit(1, [(client, r1), (client, r2)], [])
        np.testing.assert_allclose(agg.tensors[0], np.full((2, 2), 3.5))
        assert metrics["loss"] == pytest.approx(2.5)

        # Evaluation aggregation is sample-weighted too.
        evs = strat.configure_evaluate(1, agg, cm)
        assert len(evs) == 4
        loss, emetrics = strat.aggregate_evaluate(
            1,
            [(client, _EvalRes(1.0, 1, {"psnr": 30.0})),
             (client, _EvalRes(3.0, 3, {"psnr": 34.0}))],
            [],
        )
        assert loss == pytest.approx(2.5)
        assert emetrics["psnr"] == pytest.approx(33.0)

    def test_adaptive_epoch_policy_passes_through(self, fake_flwr):
        from nerve_tpu.federated.flower_compat import make_flower_strategy

        strat = make_flower_strategy(
            min_fit_clients=1, epoch_reduction_round=2,
            base_local_epochs=5, reduced_local_epochs=3,
        )
        cm = _ClientManager(["a", "b"])
        _, ins_early = strat.configure_fit(1, None, cm)[0]
        _, ins_late = strat.configure_fit(3, None, cm)[0]
        assert ins_early.config["local_epochs"] == 5
        assert ins_late.config["local_epochs"] == 3
