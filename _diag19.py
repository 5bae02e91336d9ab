import time
import numpy as np
import jax, jax.numpy as jnp
rng = np.random.default_rng(1)
bufs = [rng.integers(0,256,(8,376,1248),dtype=np.uint8) for _ in range(6)]
bufs_f = [rng.random((8,376,1248),dtype=np.float32) for _ in range(3)]
x = jax.device_put(bufs[5]); jax.block_until_ready(x)
for i in range(5):
    t0 = time.perf_counter()
    x = jax.device_put(bufs[i])
    jax.block_until_ready(x)
    print(f"u8 upload {i}: {(time.perf_counter()-t0)*1000:.1f} ms", flush=True)
for i in range(3):
    t0 = time.perf_counter()
    x = jax.device_put(bufs_f[i])
    jax.block_until_ready(x)
    print(f"f32 upload {i}: {(time.perf_counter()-t0)*1000:.1f} ms", flush=True)
