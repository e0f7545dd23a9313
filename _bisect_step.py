import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
from orb_slam3_noted_tpu.optim import window_ba as WB
from orb_slam3_noted_tpu.optim import factors
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
    valid=jnp.ones((O,), bool),
)
kf_slots = jnp.arange(KW, dtype=jnp.int32)
pfw = jnp.zeros(KW, bool).at[0].set(True)
ptf = jnp.zeros(MP, bool)

def timeit(name, fn, n=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:8.3f} ms")

ev = jax.jit(lambda R,t,p: WB._evaluate(cam, R, t, p, obs, obs.valid, jnp.asarray(True), 0.0))
timeit("evaluate", lambda: ev(Rcw, tcw, pts))

lin0 = ev(Rcw, tcw, pts)
lin = (lin0[0], lin0[1], lin0[2], lin0[4])

step = jax.jit(lambda R,t,p,lin: WB._lm_step(cam, R, t, p, obs, kf_slots, pfw, ptf,
        obs.valid, jnp.asarray(True), jnp.asarray(1e-4), 0.0, KW, lin, lin0[6]))
timeit("_lm_step full", lambda: step(Rcw, tcw, pts, lin))
