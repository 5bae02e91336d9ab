import time
from concurrent.futures import ThreadPoolExecutor
import numpy as np
import jax, jax.numpy as jnp
from visualslam_tpu.models.pyramid import build_pyramid
from visualslam_tpu.utils.config import FAST_CONFIG

pc = FAST_CONFIG.pyramid
rng = np.random.default_rng(0)
bufs = [rng.integers(0,256,(8,376,1248),dtype=np.uint8) for _ in range(6)]
fe = jax.jit(jax.vmap(lambda im: build_pyramid(im.astype(jnp.float32)/255.0, pc)))
x = jax.device_put(bufs[0]); y = fe(x); jax.block_until_ready(y)

# serial: upload then compute, 4 rounds
t0 = time.perf_counter()
for i in range(4):
    x = jax.device_put(bufs[i])
    y = fe(x)
jax.block_until_ready(y)
print(f"serial 4x(upload+pyr): {(time.perf_counter()-t0)*1000:.0f} ms")

# threaded prefetch
ex = ThreadPoolExecutor(1)
t0 = time.perf_counter()
fut = ex.submit(jax.device_put, bufs[0])
for i in range(4):
    x = fut.result()
    if i < 3:
        fut = ex.submit(jax.device_put, bufs[i+1])
    y = fe(x)
    jax.block_until_ready(y)
print(f"prefetch 4x(upload+pyr): {(time.perf_counter()-t0)*1000:.0f} ms")
