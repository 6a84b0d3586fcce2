"""Microbenchmark: pair-gram formulations (blocky einsum vs flat planar).

The (27, R, 16) gathered pair stacks tile as (8, 128) with only 16 live
lanes -> 8x HBM waste, and XLA inserts relayout copies per trial. Candidate:
keep everything (C, R*16) flat (full tiles) and reduce contiguous 16-groups.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

R, L = 3837, 16
Q = R * L
key = jax.random.PRNGKey(0)
A27 = jax.random.normal(key, (27, Q), jnp.float32).astype(jnp.bfloat16)
B27 = jax.random.normal(key, (27, Q), jnp.float32).astype(jnp.bfloat16)
W3 = jax.random.normal(key, (3, Q), jnp.float32).astype(jnp.bfloat16)
A_blk = A27.reshape(27, R, L)
B_blk = B27.reshape(27, R, L)
W_blk = W3.reshape(3, R, L)


def bench(name, fn, *args, reps=50):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    # time inside one dispatch via scan chaining
    def looped(a0, args):
        def body(c, _):
            o = f(*args)
            return c + o.astype(jnp.float32).sum() * 1e-30, None
        out, _ = jax.lax.scan(body, a0, None, length=reps)
        return out
    lj = jax.jit(lambda a0, *args: looped(a0, args))
    o = lj(jnp.float32(0.0), *args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = lj(jnp.float32(0.0), *args); jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {dt*1e6:9.1f} us")
    return dt


# 1) current blocky einsum
def blocky(A, B, W):
    A9 = A.reshape(9, 3, R, L)
    B9 = B.reshape(9, 3, R, L)
    return jnp.einsum("icrl,jcrl->ijr", A9 * W[None], B9,
                      preferred_element_type=jnp.float32).reshape(81, R)
bench("blocky einsum (27,R,16)", blocky, A_blk, B_blk, W_blk)


# 2) flat planar products + reshape-reduce
def flat_reshape(A, B, W):
    Aw = (A.reshape(9, 3, Q) * W[None]).astype(jnp.bfloat16)
    B9 = B.reshape(9, 3, Q)
    P = (Aw[:, None] * B9[None, :]).sum(2)  # (9,9,Q) f32? keep bf16 mult
    return P.reshape(81, R, L).sum(-1)
bench("flat products + reshape-reduce", flat_reshape, A27, B27, W3)


# 3) flat products + reduce_window
def flat_window(A, B, W):
    Aw = A.reshape(9, 3, Q) * W[None]
    B9 = B.reshape(9, 3, Q)
    P = (Aw[:, None] * B9[None, :]).sum(2).reshape(81, Q).astype(jnp.float32)
    red = jax.lax.reduce_window(P, 0.0, jax.lax.add, (1, L), (1, L), "VALID")
    return red
bench("flat products + reduce_window", flat_window, A27, B27, W3)


# 4) flat products, accumulate f32, reshape-reduce
def flat_f32(A, B, W):
    Aw = (A.astype(jnp.float32).reshape(9, 3, Q) * W.astype(jnp.float32)[None])
    B9 = B.astype(jnp.float32).reshape(9, 3, Q)
    P = (Aw[:, None] * B9[None, :]).sum(2)
    return P.reshape(81, R, L).sum(-1)
bench("flat f32 products + reshape-reduce", flat_f32, A27, B27, W3)


# 5) dot_general over 48-wide contraction per r-batch (MXU batched)
def batched_dot(A, B, W):
    Aw = (A.reshape(9, 3, R, L) * W.reshape(3, R, L)[None]).reshape(27, R, L)
    Am = jnp.moveaxis(Aw.reshape(9, 3 * 1, R, L), 2, 0).reshape(R, 9, 3 * L)
    Bm = jnp.moveaxis(B.reshape(9, 3, R, L), 2, 0).reshape(R, 9, 3 * L)
    O = jax.lax.dot_general(Am, Bm, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return jnp.moveaxis(O, 0, 2).reshape(81, R)
bench("batched dot_general (R,9,48)", batched_dot, A27, B27, W3)
