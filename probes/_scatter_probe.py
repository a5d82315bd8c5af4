"""Is a vmapped per-row dynamic_update_slice (scatter) in-place inside a
while_loop, or a full-cache copy per iteration?  Times 200 iterations of
(a) scalar-index DUS, (b) per-row vmapped DUS, (c) no write (control) on the
fused-layout cache shape (L=8, rows=4, S=768, d=256, bf16)."""
import json
import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_tpu')
import numpy as np
import jax
import jax.numpy as jnp

L, R, S, D = 8, 4, 768, 256
ITERS = 200

k0 = jnp.zeros((L, R, S, D), jnp.bfloat16)
new0 = jnp.ones((L, R, 1, D), jnp.bfloat16)
zero = jnp.int32(0)


def scalar_write(buf, new, i):
    return jax.lax.dynamic_update_slice(buf, new, (zero, zero, i, zero))


def perrow_write(buf, new, idx):
    def one_row(b, n, i):
        return jax.lax.dynamic_update_slice(b, n, (zero, i, zero))
    return jax.vmap(one_row, in_axes=(1, 1, 0), out_axes=1)(buf, new, idx)


@jax.jit
def loop_scalar(buf, new):
    def body(c):
        i, b = c
        return i + 1, scalar_write(b, new, i)
    return jax.lax.while_loop(lambda c: c[0] < ITERS, body, (jnp.int32(0), buf))


@jax.jit
def loop_perrow(buf, new):
    def body(c):
        i, b = c
        idx = i + jnp.arange(R, dtype=jnp.int32)      # distinct per-row slots
        return i + 1, perrow_write(b, new, idx)
    return jax.lax.while_loop(lambda c: c[0] < ITERS, body, (jnp.int32(0), buf))


@jax.jit
def loop_none(buf, new):
    def body(c):
        i, b = c
        return i + 1, b + 0 * new[:, :, 0:1, :].sum()
    return jax.lax.while_loop(lambda c: c[0] < ITERS, body, (jnp.int32(0), buf))


for name, fn in (('scalar', loop_scalar), ('perrow', loop_perrow),
                 ('none', loop_none)):
    _, out = fn(k0, new0)
    np.asarray(out[0, 0, 0])     # axon sync
    t0 = time.perf_counter()
    _, out = fn(k0, new0)
    np.asarray(out[0, 0, 0])
    dt = time.perf_counter() - t0
    print(json.dumps({'arm': name, 'us_per_iter': round(dt / ITERS * 1e6, 1)}),
          flush=True)
