import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
from orb_slam3_noted_tpu.optim import window_ba as WB
from orb_slam3_noted_tpu.optim import factors
from orb_slam3_noted_tpu.geometry import se3, so3
from orb_slam3_noted_tpu.geometry.linalg3 import inv3
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.optim.robust import CHI2_MONO, CHI2_STEREO, huber_cost, huber_weight

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
_HP = jax.lax.Precision.HIGHEST

def timeit(name, fn, *args, n=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.3f} ms")

@partial(jax.jit, static_argnames=("mode",))
def step_ablate(Rcw, tcw, points, obs, mode="full"):
    active = obs.valid; use_huber = jnp.asarray(True); lam = jnp.asarray(1e-4); bf = 0.0
    M = points.shape[0]; dtype = tcw.dtype
    r, Jp, Jl, _, w, ok, cost_old = WB._evaluate(cam, Rcw, tcw, points, obs, active, use_huber, bf)
    if mode == "eval":
        return cost_old
    wfree = jnp.concatenate([(~pfw).astype(dtype), jnp.zeros((1,), dtype)])
    point_free = (~ptf).astype(dtype)
    Jp = Jp * wfree[obs.wpose_idx][:, None, None]
    Jl = Jl * point_free[obs.point_idx][:, None, None]
    wJp = w[:, None, None] * Jp
    W_o = jnp.einsum("oai,oaj->oij", wJp, Jl, precision=_HP)
    Hpp = jax.ops.segment_sum(jnp.einsum("oai,oaj->oij", wJp, Jp, precision=_HP), obs.wpose_idx, num_segments=KW+1)[:KW]
    gp = jax.ops.segment_sum(jnp.einsum("oai,oa->oi", Jp, w[:, None] * r, precision=_HP), obs.wpose_idx, num_segments=KW+1)[:KW]
    Hll = jax.ops.segment_sum(jnp.einsum("oai,oaj->oij", w[:, None, None] * Jl, Jl, precision=_HP), obs.point_idx, num_segments=M)
    gl = jax.ops.segment_sum(jnp.einsum("oai,oa->oi", Jl, w[:, None] * r, precision=_HP), obs.point_idx, num_segments=M)
    if mode == "blocks":
        return Hpp.sum() + gp.sum() + Hll.sum() + gl.sum() + W_o.sum()
    eye6 = jnp.eye(6, dtype=dtype); eye3 = jnp.eye(3, dtype=dtype)
    Hpp_d = Hpp + lam * Hpp * eye6 + (1e-8 + pfw.astype(dtype))[:, None, None] * eye6
    Hll_d = Hll + lam * Hll * eye3 + (1e-8 + ptf.astype(dtype))[:, None, None] * eye3
    Cinv = inv3(Hll_d)
    key2 = obs.point_idx * (KW + 1) + obs.wpose_idx
    U = jax.ops.segment_sum(W_o, key2, num_segments=M * (KW + 1)).reshape(M, KW + 1, 6, 3)[:, :KW]
    T1 = jnp.einsum("mpab,mbc->mpac", U, Cinv, precision=_HP)
    S_sub = jnp.einsum("mpac,mqbc->paqb", T1, U, precision=_HP)
    S = -S_sub
    S = S.at[jnp.arange(KW), :, jnp.arange(KW), :].add(Hpp_d)
    rhs = -gp + jnp.einsum("mpac,mc->pa", T1, gl, precision=_HP)
    if mode == "schur":
        return S.sum() + rhs.sum()
    n = KW * 6
    dp = jnp.linalg.solve(S.reshape(n, n), rhs.reshape(n)).reshape(KW, 6)
    if mode == "solve":
        return dp.sum()
    dp = jnp.nan_to_num(dp) * (~pfw)[:, None]
    utdp = jnp.einsum("mpab,pa->mb", U, dp, precision=_HP)
    dl = jnp.einsum("mbc,mc->mb", Cinv, -gl - utdp, precision=_HP)
    dl = jnp.nan_to_num(dl) * point_free[:, None]
    Rw, tw = Rcw[kf_slots], tcw[kf_slots]
    Rw_new, tw_new = se3.compose(se3.exp(dp), (Rw, tw))
    Rw_new = so3.normalize(Rw_new)
    R_new = Rcw.at[kf_slots].set(Rw_new)
    t_new = tcw.at[kf_slots].set(tw_new)
    p_new = points + dl
    r2, Jp2, Jl2, _, w2, _, cost_new = WB._evaluate(cam, R_new, t_new, p_new, obs, active, use_huber, bf)
    return cost_new

for mode in ["eval", "blocks", "schur", "solve", "full"]:
    timeit(f"step:{mode}", lambda m=mode: step_ablate(Rcw, tcw, pts, obs, mode=m))
