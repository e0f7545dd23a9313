import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
from orb_slam3_noted_tpu.optim import window_ba as WB
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE

cam = Camera(PINHOLE, (458.654, 457.296, 367.215, 248.375))
key = jax.random.PRNGKey(0)
KF, NF, MP, KW = 64, 1200, 8192, 6
O = (KW+1)*NF + 4096
Rcw = jnp.tile(jnp.eye(3, dtype=jnp.float32), (KF+1, 1, 1))
tcw = jax.random.normal(key, (KF+1, 3)) * 0.1
pts = jax.random.normal(key, (MP, 3)) * 2 + jnp.array([0,0,5.0])
obs = WB.WindowObs(
    pose_idx=jax.random.randint(key, (O,), 0, KF),
    wpose_idx=jax.random.randint(key, (O,), 0, KW+1),
    point_idx=jax.random.randint(key, (O,), 0, MP),
    uv=jax.random.uniform(key, (O,2))*400,
    uv_r=jnp.full((O,), -1.0),
    inv_sigma2=jnp.ones((O,)),
    is_stereo=jnp.zeros((O,), bool),
    valid=jnp.ones((O,), bool))
_HP = jax.lax.Precision.HIGHEST

def timeit(name, fn, *args, n=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1000:8.3f} ms")

def blocks(Rcw, tcw, points, obs, barrier):
    active = obs.valid
    r, Jp, Jl, _, w, ok, cost = WB._evaluate(cam, Rcw, tcw, points, obs, active, jnp.asarray(True), 0.0)
    if barrier:
        r, Jp, Jl, w = jax.lax.optimization_barrier((r, Jp, Jl, w))
    wJp = w[:, None, None] * Jp
    W_o = jnp.einsum("oai,oaj->oij", wJp, Jl, precision=_HP)
    if barrier:
        W_o = jax.lax.optimization_barrier(W_o)
    Hpp = jax.ops.segment_sum(jnp.einsum("oai,oaj->oij", wJp, Jp, precision=_HP), obs.wpose_idx, num_segments=KW+1)
    gp = jax.ops.segment_sum(jnp.einsum("oai,oa->oi", Jp, w[:, None] * r, precision=_HP), obs.wpose_idx, num_segments=KW+1)
    Hll = jax.ops.segment_sum(jnp.einsum("oai,oaj->oij", (w[:, None, None] * Jl), Jl, precision=_HP), obs.point_idx, num_segments=MP)
    gl = jax.ops.segment_sum(jnp.einsum("oai,oa->oi", Jl, w[:, None] * r, precision=_HP), obs.point_idx, num_segments=MP)
    key2 = obs.point_idx * (KW + 1) + obs.wpose_idx
    U = jax.ops.segment_sum(W_o, key2, num_segments=MP * (KW + 1))
    return Hpp.sum() + gp.sum() + Hll.sum() + gl.sum() + U.sum() + cost

timeit("blocks no barrier", jax.jit(partial(blocks, barrier=False)), Rcw, tcw, pts, obs)
timeit("blocks with barrier", jax.jit(partial(blocks, barrier=True)), Rcw, tcw, pts, obs)
