import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_enable_x64", True)

def bench(name, fn, *args, reps=50):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms")

x = jnp.ones((8, 128), jnp.float32)
bench("jitted identity+1 (dispatch floor)", jax.jit(lambda x: x + 1), x)

K = 36455
a64 = jnp.ones((K, 3), jnp.float64); b64 = jnp.ones((K, 3, 3), jnp.float64)
a32 = a64.astype(jnp.float32); b32 = b64.astype(jnp.float32)

@jax.jit
def chain64(R, X):
    y = jnp.einsum("kij,kj->ki", R, X)
    for _ in range(10):
        y = jnp.einsum("kij,kj->ki", R, y) + X
    return y

@jax.jit
def chain32(R, X):
    y = jnp.einsum("kij,kj->ki", R, X)
    for _ in range(10):
        y = jnp.einsum("kij,kj->ki", R, y) + X
    return y

bench("11x batched 3x3 matvec f64 (K=36k)", chain64, b64, a64)
bench("11x batched 3x3 matvec f32 (K=36k)", chain32, b32, a32)

# big gather like Jp_ext[pt_obs_idx]
M, L = 11315, 15
tbl = jnp.zeros((M, L), jnp.int32)
v64 = jnp.ones((K + 1, 2, 3), jnp.float64)
v32 = v64.astype(jnp.float32)
bench("gather (M,15,2,3) f64", jax.jit(lambda t, v: v[t].sum(axis=1)), tbl, v64)
bench("gather (M,15,2,3) f32", jax.jit(lambda t, v: v[t].sum(axis=1)), tbl, v32)
