import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
key = jax.random.PRNGKey(0)
_HP = jax.lax.Precision.HIGHEST

def timeit(name, fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:8.3f} ms")

for O, S, F in [(12496, 8192, 9), (12496, 8192, 18), (12496, 57344, 18),
                (76800, 8193, 256), (12496, 7, 36)]:
    data = jax.random.normal(key, (O, F))
    seg = jax.random.randint(key, (O,), 0, S)
    ss = jax.jit(partial(jax.ops.segment_sum, num_segments=S))
    timeit(f"segment_sum O={O} S={S} F={F}", ss, data, seg)

    @partial(jax.jit, static_argnames=())
    def mxu(data, seg):
        oh = (seg[None, :] == jnp.arange(S)[:, None]).astype(jnp.bfloat16)
        return jax.lax.dot_general(oh, data.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    timeit(f"onehot-mxu   O={O} S={S} F={F}", mxu, data, seg)

    @partial(jax.jit, static_argnames=())
    def mxu_f32(data, seg):
        oh = (seg[None, :] == jnp.arange(S)[:, None]).astype(jnp.float32)
        return jax.lax.dot_general(oh, data, (((1,), (0,)), ((), ())),
                                   precision=_HP)
    timeit(f"onehot-f32hp O={O} S={S} F={F}", mxu_f32, data, seg)
