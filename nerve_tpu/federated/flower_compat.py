"""Flower interoperability adapter.

The reference serves federation over Flower gRPC
(/root/reference/nerve_cl/federated/server.py:113-139: ``fl.server
.start_server`` with a FedAvg subclass). NERVE-TPU's native transport is the
framed-numpy TCP server (``nerve_tpu.federated.transport``) — smaller, no
gRPC dependency, and sufficient for the in-repo trainer — but external
clients that already speak Flower should not need rewriting. This module
adapts :class:`nerve_tpu.federated.server.VideoEnhancementStrategy` to
Flower's ``Strategy`` interface so a stock Flower server can drive it:

    import flwr as fl
    from nerve_tpu.federated.flower_compat import make_flower_strategy

    strategy = make_flower_strategy(initial_parameters=get_parameters(params))
    fl.server.start_server(server_address="0.0.0.0:8080", strategy=strategy)

``flwr`` is NOT bundled in this environment; the adapter resolves it at call
time and raises a clear ImportError otherwise. The adapter's logic (client
sampling, adaptive epochs, weighted FedAvg, version retention) is all
delegated to the TPU-native strategy, so both transports share one policy
implementation and its tests.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from nerve_tpu.federated.server import VideoEnhancementStrategy, weighted_average


def _flwr():
    try:
        import flwr  # noqa: F401
        import flwr.common as common
        import flwr.server.strategy as strategy_mod
    except ImportError as e:  # pragma: no cover - exercised via fake module
        raise ImportError(
            "flwr is not installed in this environment. The TPU-native "
            "transport (nerve_tpu.federated.transport + start_server) covers "
            "in-framework federation; install flwr only for interop with "
            "external Flower clients."
        ) from e
    return common, strategy_mod


def make_flower_strategy(
    initial_parameters: Optional[List[np.ndarray]] = None,
    **strategy_kwargs,
):
    """Build a Flower ``Strategy`` backed by VideoEnhancementStrategy.

    ``strategy_kwargs`` are forwarded to
    :class:`~nerve_tpu.federated.server.VideoEnhancementStrategy`
    (fraction_fit, min_fit_clients, keep_last_versions, epoch policies,
    fedprox_mu, ...).
    """
    common, strategy_mod = _flwr()
    inner = VideoEnhancementStrategy(**strategy_kwargs)

    class NerveTpuFlowerStrategy(strategy_mod.Strategy):
        """Flower Strategy façade over the TPU-native FedAvg policy."""

        def __init__(self):
            super().__init__()
            self.inner = inner
            self._initial = initial_parameters

        # -- fit ---------------------------------------------------------- #
        def initialize_parameters(self, client_manager):
            if self._initial is None:
                return None
            return common.ndarrays_to_parameters(self._initial)

        def configure_fit(self, server_round, parameters, client_manager):
            clients = list(client_manager.all().values())
            ids = [getattr(c, "cid", str(i)) for i, c in enumerate(clients)]
            selected, config = self.inner.configure_fit(server_round, ids)
            fit_ins = common.FitIns(parameters, config)
            by_id = dict(zip(ids, clients))
            return [(by_id[cid], fit_ins) for cid in selected]

        def aggregate_fit(self, server_round, results, failures):
            converted = [
                (
                    common.parameters_to_ndarrays(fit_res.parameters),
                    fit_res.num_examples,
                    dict(fit_res.metrics or {}),
                )
                for _, fit_res in results
            ]
            arrays, metrics = self.inner.aggregate_fit(server_round, converted)
            if arrays is None:
                return None, metrics
            return common.ndarrays_to_parameters(arrays), metrics

        # -- evaluate ------------------------------------------------------ #
        def configure_evaluate(self, server_round, parameters, client_manager):
            clients = list(client_manager.all().values())
            ev_ins = common.EvaluateIns(parameters, {"server_round": server_round})
            return [(c, ev_ins) for c in clients]

        def aggregate_evaluate(self, server_round, results, failures):
            if not results:
                return None, {}
            pairs: Sequence[Tuple[int, Dict[str, float]]] = [
                (r.num_examples, {**dict(r.metrics or {}), "loss": r.loss})
                for _, r in results
            ]
            metrics = weighted_average(pairs)
            return metrics.get("loss"), metrics

        def evaluate(self, server_round, parameters):
            return None  # no centralized evaluation (parity: reference has none)

    return NerveTpuFlowerStrategy()
