import time, jax, jax.numpy as jnp, numpy as np
g = jax.jit(lambda x: x.astype(jnp.float32).sum())
for shape, name in [((1,752,480),"1 frame 360KB"), ((4,752,480),"4 frames 1.4MB"),
                    ((8,752,480),"8 frames 2.9MB"), ((16,752,480),"16 frames 5.8MB")]:
    data = np.random.randint(0,255,shape,dtype=np.uint8)
    jax.block_until_ready(g(data))
    t0 = time.perf_counter()
    for _ in range(5): out = g(data)
    jax.block_until_ready(out); v=float(out)
    dt = (time.perf_counter()-t0)/5*1000
    mb = data.nbytes/1e6
    print(f"{name:22s} {dt:8.2f} ms  ({mb/dt*1000:.1f} MB/s)")

# async overlap: device_put returns immediately?
data = np.random.randint(0,255,(8,752,480),dtype=np.uint8)
t0 = time.perf_counter()
d = jax.device_put(data)
enq = (time.perf_counter()-t0)*1000
jax.block_until_ready(d)
tot = (time.perf_counter()-t0)*1000
print(f"device_put enqueue {enq:.2f} ms, complete {tot:.2f} ms")
# second for steady state
data2 = np.random.randint(0,255,(8,752,480),dtype=np.uint8)
t0 = time.perf_counter()
d2 = jax.device_put(data2)
enq = (time.perf_counter()-t0)*1000
jax.block_until_ready(d2)
tot = (time.perf_counter()-t0)*1000
print(f"device_put enqueue {enq:.2f} ms, complete {tot:.2f} ms")
