import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
key = jax.random.PRNGKey(0)
O, KW, M = 12496, 6, 8192
r = jax.random.normal(key, (O, 3))
Jp = jax.random.normal(key, (O, 3, 6))
Jl = jax.random.normal(key, (O, 3, 3))
w = jax.random.uniform(key, (O,))
widx = jax.random.randint(key, (O,), 0, KW+1)
midx = jax.random.randint(key, (O,), 0, M)
_HP = jax.lax.Precision.HIGHEST

def timeit(name, fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1000:8.3f} ms")

@jax.jit
def blocks_hp(r, Jp, Jl, w, widx, midx):
    wJp = w[:, None, None] * Jp
    W_o = jnp.einsum("oai,oaj->oij", wJp, Jl, precision=_HP)
    Hpp = jax.ops.segment_sum(jnp.einsum("oai,oaj->oij", wJp, Jp, precision=_HP), widx, num_segments=KW+1)
    gp = jax.ops.segment_sum(jnp.einsum("oai,oa->oi", Jp, w[:, None] * r, precision=_HP), widx, num_segments=KW+1)
    Hll = jax.ops.segment_sum(jnp.einsum("oai,oaj->oij", w[:, None, None] * Jl, Jl, precision=_HP), midx, num_segments=M)
    gl = jax.ops.segment_sum(jnp.einsum("oai,oa->oi", Jl, w[:, None] * r, precision=_HP), midx, num_segments=M)
    return W_o.sum() + Hpp.sum() + gp.sum() + Hll.sum() + gl.sum()
timeit("blocks precision=HIGHEST", blocks_hp, r, Jp, Jl, w, widx, midx)

@jax.jit
def blocks_manual(r, Jp, Jl, w, widx, midx):
    wJp = w[:, None, None] * Jp
    W_o = jnp.sum(wJp[:, :, :, None] * Jl[:, :, None, :], axis=1)
    Hpp = jax.ops.segment_sum(jnp.sum(wJp[:, :, :, None] * Jp[:, :, None, :], axis=1), widx, num_segments=KW+1)
    gp = jax.ops.segment_sum(jnp.sum(Jp * (w[:, None] * r)[:, :, None], axis=1), widx, num_segments=KW+1)
    Hll = jax.ops.segment_sum(jnp.sum((w[:, None, None] * Jl)[:, :, :, None] * Jl[:, :, None, :], axis=1), midx, num_segments=M)
    gl = jax.ops.segment_sum(jnp.sum(Jl * (w[:, None] * r)[:, :, None], axis=1), midx, num_segments=M)
    return W_o.sum() + Hpp.sum() + gp.sum() + Hll.sum() + gl.sum()
timeit("blocks manual bcast-sum", blocks_manual, r, Jp, Jl, w, widx, midx)

@jax.jit
def blocks_default(r, Jp, Jl, w, widx, midx):
    wJp = w[:, None, None] * Jp
    W_o = jnp.einsum("oai,oaj->oij", wJp, Jl)
    Hpp = jax.ops.segment_sum(jnp.einsum("oai,oaj->oij", wJp, Jp), widx, num_segments=KW+1)
    gp = jax.ops.segment_sum(jnp.einsum("oai,oa->oi", Jp, w[:, None] * r), widx, num_segments=KW+1)
    Hll = jax.ops.segment_sum(jnp.einsum("oai,oaj->oij", w[:, None, None] * Jl, Jl), midx, num_segments=M)
    gl = jax.ops.segment_sum(jnp.einsum("oai,oa->oi", Jl, w[:, None] * r), midx, num_segments=M)
    return W_o.sum() + Hpp.sum() + gp.sum() + Hll.sum() + gl.sum()
timeit("blocks precision=default", blocks_default, r, Jp, Jl, w, widx, midx)

# separate segsums vs einsums: are the SEGSUMS slow here?
@jax.jit
def segs_only(Jp, widx, midx):
    a = jax.ops.segment_sum(Jp, widx, num_segments=KW+1)
    b = jax.ops.segment_sum(Jp, midx, num_segments=M)
    return a.sum() + b.sum()
timeit("2 segsums of (O,3,6)", segs_only, Jp, widx, midx)

Wo = jax.random.normal(key, (O, 6, 3))
k2 = midx * (KW + 1) + widx
@jax.jit
def seg_u(Wo, k2):
    return jax.ops.segment_sum(Wo, k2, num_segments=M * (KW + 1)).sum()
timeit("segsum U (O,6,3)->57k", seg_u, Wo, k2)
