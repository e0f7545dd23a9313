import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
from orb_slam3_noted_tpu.optim import window_ba as WB
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE

cam = Camera(PINHOLE, (458.654, 457.296, 367.215, 248.375))
key = jax.random.PRNGKey(0)
KF, NF, MP, KW = 64, 1200, 8192, 6
O = (KW+1)*NF + 4096

def mkobs(key):
    return WB.WindowObs(
        pose_idx=jax.random.randint(key, (O,), 0, KF),
        wpose_idx=jax.random.randint(key, (O,), 0, KW+1),
        point_idx=jax.random.randint(key, (O,), 0, MP),
        uv=jax.random.uniform(key, (O,2))*400,
        uv_r=jnp.full((O,), -1.0),
        inv_sigma2=jnp.ones((O,)),
        is_stereo=jnp.zeros((O,), bool),
        valid=jnp.ones((O,), bool))

Rcw = jnp.tile(jnp.eye(3, dtype=jnp.float32), (KF+1, 1, 1))
tcw = jax.random.normal(key, (KF+1, 3)) * 0.1
pts = jax.random.normal(key, (MP, 3)) * 2 + jnp.array([0,0,5.0])
obs = mkobs(key)
kf_slots = jnp.arange(KW, dtype=jnp.int32)
pfw = jnp.zeros(KW, bool).at[0].set(True)
ptf = jnp.zeros(MP, bool)

def timeit(name, fn, *args, n=5):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.3f} ms")

def phase_fori(Rcw, tcw, pts, obs, n):
    active = obs.valid; uh = jnp.asarray(True)
    r0, Jp0, Jl0, _, w0, _, c0 = WB._evaluate(cam, Rcw, tcw, pts, obs, active, uh, 0.0)
    def body(_, st):
        R, t, p, lam, lin, c = st
        return WB._lm_step(cam, R, t, p, obs, kf_slots, pfw, ptf, active, uh, lam, 0.0, KW, lin, c)
    R, t, p, _, _, _ = jax.lax.fori_loop(0, n, body, (Rcw, tcw, pts, jnp.asarray(1e-4), (r0,Jp0,Jl0,w0), c0))
    return R, t, p

def phase_unroll(Rcw, tcw, pts, obs, n):
    active = obs.valid; uh = jnp.asarray(True)
    r0, Jp0, Jl0, _, w0, _, c0 = WB._evaluate(cam, Rcw, tcw, pts, obs, active, uh, 0.0)
    st = (Rcw, tcw, pts, jnp.asarray(1e-4), (r0,Jp0,Jl0,w0), c0)
    for _ in range(n):
        st = WB._lm_step(cam, st[0], st[1], st[2], obs, kf_slots, pfw, ptf, active, uh, st[3], 0.0, KW, st[4], st[5])
    return st[0], st[1], st[2]

f5 = jax.jit(partial(phase_fori, n=5))
u5 = jax.jit(partial(phase_unroll, n=5))
f1 = jax.jit(partial(phase_fori, n=1))
timeit("fori 1 step", f1, Rcw, tcw, pts, obs)
timeit("fori 5 steps", f5, Rcw, tcw, pts, obs)
timeit("unrolled 5 steps", u5, Rcw, tcw, pts, obs)
