"""Federated-learning subsystem.

Parity with the reference's ``nerve_cl/federated`` interface
(nerve_cl/federated/__init__.py:1-31) — client, server/strategy, privacy,
clustering — but TPU-native in structure:

  * The distributed backend of the reference is Flower's gRPC star topology
    exchanging numpy weight lists (federated/client.py:15-24,
    server.py:134-138). Here the in-process simulation maps the client
    population onto a ('client',) mesh axis: local training is a vmapped,
    shard_map-ed jitted loop, and FedAvg is a weighted ``psum`` over ICI
    (:mod:`nerve_tpu.federated.simulation`).
  * The truly-external client/server mode keeps a thin socket transport
    (:mod:`nerve_tpu.federated.transport`) speaking framed numpy arrays —
    the same wire format as the reference (state_dict ⇄ list of ndarrays).
  * The reference's ``FederatedTrainer.train_round`` never actually trains or
    aggregates (verified stub, server.py:166-193); ours does.
"""

from nerve_tpu.federated.common import (  # noqa: F401
    get_parameters,
    set_parameters,
    tree_from_arrays,
    tree_to_arrays,
)
from nerve_tpu.federated.privacy import (  # noqa: F401
    DPConfig,
    PrivacyConfig,
    compute_noise_multiplier,
    dp_gradient_transform,
    get_privacy_spent,
    make_private,
)
from nerve_tpu.federated.client import VideoEnhancementClient, create_client  # noqa: F401
from nerve_tpu.federated.server import (  # noqa: F401
    FederatedTrainer,
    VideoEnhancementStrategy,
    start_server,
    weighted_average,
)
from nerve_tpu.federated.clustering import UserClustering, UserProfile  # noqa: F401
from nerve_tpu.federated.simulation import MeshFederatedSimulation  # noqa: F401
