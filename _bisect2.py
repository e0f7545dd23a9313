import time, jax, jax.numpy as jnp, numpy as np
from orb_slam3_noted_tpu.optim import factors
from orb_slam3_noted_tpu.models import cameras as cam_mod
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.geometry import so3

cam = Camera(PINHOLE, (458.654, 457.296, 367.215, 248.375))
key = jax.random.PRNGKey(0)
KF, MP = 64, 8192
O = 12496
Rcw = jnp.tile(jnp.eye(3, dtype=jnp.float32), (KF+1, 1, 1))
tcw = jax.random.normal(key, (KF+1, 3)) * 0.1
pts = jax.random.normal(key, (MP, 3)) * 2 + jnp.array([0,0,5.0])
obs = factors.ReprojObs(
    pose_idx=jax.random.randint(key, (O,), 0, KF),
    point_idx=jax.random.randint(key, (O,), 0, MP),
    uv=jax.random.uniform(key, (O,2))*400,
    uv_r=jnp.full((O,), -1.0),
    inv_sigma2=jnp.ones((O,)),
    is_stereo=jnp.zeros((O,), bool),
    valid=jnp.ones((O,), bool),
)

def timeit(name, fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.3f} ms")

rr = jax.jit(lambda R,t,p: factors.reproj_residuals(cam, R, t, p, obs, bf=0.0))
timeit("reproj_residuals", lambda: rr(Rcw, tcw, pts))

g3 = jax.jit(lambda R: (R[obs.pose_idx], tcw[obs.pose_idx], pts[obs.point_idx]))
timeit("3 gathers", lambda: g3(Rcw))

@jax.jit
def proj_only(R, t, p):
    Ro = R[obs.pose_idx]; to = t[obs.pose_idx]; xw = p[obs.point_idx]
    xc = jnp.einsum("oij,oj->oi", Ro, xw) + to
    params = cam.params_array(xc.dtype)
    uv_hat = cam_mod.pinhole_project(params, xc)
    Jproj = cam_mod.pinhole_project_jac(params, xc)
    return uv_hat, Jproj
timeit("gathers+project+jac", lambda: proj_only(Rcw, tcw, pts))

@jax.jit
def jac_chain(R, t, p):
    Ro = R[obs.pose_idx]; to = t[obs.pose_idx]; xw = p[obs.point_idx]
    xc = jnp.einsum("oij,oj->oi", Ro, xw) + to
    params = cam.params_array(xc.dtype)
    Jproj = cam_mod.pinhole_project_jac(params, xc)
    z = xc[:, 2]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype), (O, 3, 3))
    dxc = jnp.concatenate([eye, -so3.hat(xc)], axis=-1)
    row3 = jnp.zeros((O, 1, 3), xc.dtype)
    Jfull = jnp.concatenate([Jproj, row3], axis=1)
    Jp = -jnp.einsum("oab,obc->oac", Jfull, dxc)
    Jl = -jnp.einsum("oab,obc->oac", Jfull, Ro)
    return Jp, Jl
timeit("full jac chain", lambda: jac_chain(Rcw, tcw, pts))
