"""NERVE-TPU: TPU-native continual-learning framework for dynamic video quality enhancement.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
reference framework `manikya7022/Continual-Learning-for-Dynamic-Video-Quality-Enhancement`
(a pure PyTorch research codebase, package ``nerve_cl``). Nothing here is a
translation: models are functional flax modules in NHWC layout, per-frame Python
loops become batched/`vmap`-ed computations, the hot ops (correlation volume,
flow warping, fused upsampling) are Pallas TPU kernels, and every learning
subsystem (continual / federated / ABR-RL) is built around jitted pytree
update rules and `jax.sharding` meshes instead of object-oriented wrappers.

Capability pillars (parity map to the reference):
  * ``nerve_tpu.models``     — temporal super-resolution, frame recovery,
    combined enhancement engine (reference ``nerve_cl/models/``).
  * ``nerve_tpu.continual``  — EWC/SI, episodic replay, MAML/Reptile,
    distillation (reference ``nerve_cl/continual/``).
  * ``nerve_tpu.federated``  — client/server FL, FedAvg-as-psum on a client
    mesh axis, differential privacy, clustering (reference ``nerve_cl/federated/``).
  * ``nerve_tpu.abr``        — streaming simulator + PPO bitrate agent
    (reference ``nerve_cl/abr/``).
  * ``nerve_tpu.ops``        — the TPU-native compute layer (Pallas kernels +
    XLA formulations) replacing cuDNN/ATen internals.
  * ``nerve_tpu.parallel``   — mesh construction, sharding rules, collectives.
  * ``nerve_tpu.utils``      — metrics (PSNR/SSIM), checkpointing, data.
"""

__version__ = "0.1.0"

from nerve_tpu.config import Config, load_config, save_config  # noqa: F401
