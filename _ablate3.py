import time, jax, jax.numpy as jnp, numpy as np
key = jax.random.PRNGKey(0)
O = 12496
_HP = jax.lax.Precision.HIGHEST
Jfull = jax.random.normal(key, (O, 3, 3))
dxc = jax.random.normal(key, (O, 3, 6))
R = jax.random.normal(key, (O, 3, 3))
xc = jax.random.normal(key, (O, 3))

def timeit(name, fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:8.3f} ms")

timeit("einsum oab,obc->oac HP", jax.jit(lambda a,b: jnp.einsum("oab,obc->oac", a, b, precision=_HP)), Jfull, dxc)
timeit("einsum oab,obc->oac default", jax.jit(lambda a,b: jnp.einsum("oab,obc->oac", a, b)), Jfull, dxc)

@jax.jit
def jac_pair(Jfull, dxc, R):
    Jp = -jnp.einsum("oab,obc->oac", Jfull, dxc, precision=_HP)
    Jl = -jnp.einsum("oab,obc->oac", Jfull, R, precision=_HP)
    okm = jnp.ones((O,1,1), bool)
    Jp = jnp.clip(jnp.nan_to_num(Jp * okm, nan=0.0, posinf=0.0, neginf=0.0), -1e6, 1e6)
    Jl = jnp.clip(jnp.nan_to_num(Jl * okm, nan=0.0, posinf=0.0, neginf=0.0), -1e6, 1e6)
    return Jp.sum() + Jl.sum()
timeit("jac pair + sanitize", jac_pair, Jfull, dxc, R)

from orb_slam3_noted_tpu.geometry import so3
@jax.jit
def dxc_build(xc):
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype), (O, 3, 3))
    return jnp.concatenate([eye, -so3.hat(xc)], axis=-1).sum()
timeit("dxc concat+hat", dxc_build, xc)

# full residual+jacobian chain with explicit args (no closures)
from orb_slam3_noted_tpu.optim import factors
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
cam = Camera(PINHOLE, (458.654, 457.296, 367.215, 248.375))
Rt = jnp.tile(jnp.eye(3, dtype=jnp.float32), (65, 1, 1))
tt = jax.random.normal(key, (65, 3)) * 0.1
pts = jax.random.normal(key, (8192, 3)) * 2 + jnp.array([0,0,5.0])
import functools
@functools.partial(jax.jit)
def rr(Rt, tt, pts, pose_idx, point_idx, uv, uv_r, inv_s2, is_st, valid):
    obs = factors.ReprojObs(pose_idx=pose_idx, point_idx=point_idx, uv=uv,
        uv_r=uv_r, inv_sigma2=inv_s2, is_stereo=is_st, valid=valid)
    r, Jp, Jl, chi2, ok, _ = factors.reproj_residuals(cam, Rt, tt, pts, obs, bf=0.0)
    return r.sum() + Jp.sum() + Jl.sum() + chi2.sum()
args = (jax.random.randint(key, (O,), 0, 64), jax.random.randint(key, (O,), 0, 8192),
        jax.random.uniform(key, (O,2))*400, jnp.full((O,), -1.0), jnp.ones((O,)),
        jnp.zeros((O,), bool), jnp.ones((O,), bool))
timeit("reproj_residuals full (w/ Jp,Jl)", lambda: rr(Rt, tt, pts, *args))
