import jax, jax.numpy as jnp
from nerve_tpu.utils.profiling import timed_scan
from nerve_tpu.models import SuperResolutionNet
key = jax.random.PRNGKey(0)
H, W = 1080, 1920
def t(model, frames, label, iters=4):
    v = jax.jit(model.init)(key, frames)
    r = timed_scan(lambda x: model.apply(v, x), frames, iters=iters, dispatch_overhead_ms=30)
    print(f"{label}: {r['ms_per_call']:.0f} ms", flush=True)
f3 = jax.random.uniform(key, (1, 3, H, W, 3), jnp.float32)
f1 = jax.random.uniform(key, (1, 1, H, W, 3), jnp.float32)
t(SuperResolutionNet(num_residual_blocks=8, flow_downsample=2, dtype=jnp.bfloat16), f3, "full")
t(SuperResolutionNet(num_residual_blocks=0, flow_downsample=2, dtype=jnp.bfloat16), f3, "no-RDB")
t(SuperResolutionNet(num_residual_blocks=8, temporal_window=0, dtype=jnp.bfloat16), f1, "no-motion")
t(SuperResolutionNet(num_residual_blocks=0, temporal_window=0, dtype=jnp.bfloat16), f1, "neither")
