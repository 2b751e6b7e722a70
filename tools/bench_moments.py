"""Patch-moments (per-patch mean/var) formulations at flagship shapes."""

import sys, os, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
B = int(os.environ.get("PE_BATCH", "16"))
PT, P = 10, 20

key = jax.random.PRNGKey(0)
x2d = jax.random.normal(key, (B * 24, PT, 480, 480), jnp.bfloat16)


def timeit(name, fn, *args):
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a)[0] + fn(*a)[1]))
    t0 = time.perf_counter()
    float(np.asarray(jfn(*args)))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        float(np.asarray(jfn(*args)))
    print(f"{name:12s} {(time.perf_counter() - t0) / 5 * 1e3:8.2f} ms"
          f"  (compile {c:.0f}s)", flush=True)


def reduce_window(x):
    x32 = x.astype(jnp.float32)
    window = (1, PT, P, P)
    s1 = jax.lax.reduce_window(x32, 0.0, jax.lax.add, window, window, "VALID")
    s2 = jax.lax.reduce_window(x32 * x32, 0.0, jax.lax.add, window, window,
                               "VALID")
    return s1[:, 0], s2[:, 0]


def incidence(x):
    # per-axis window sums as matmuls: W-axis via [480, 24] incidence, then
    # H-axis likewise; pt summed by reshape-free reduction
    m = jnp.kron(jnp.eye(24, dtype=jnp.float32),
                 jnp.ones((P, 1), jnp.float32))          # [480, 24]
    mb = m.astype(jnp.bfloat16)

    def sums(v):  # [B', PT, 480, 480] -> [B', 24, 24]
        y = jax.lax.dot_general(v, mb, (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # [B', PT, 480(H), 24(w)] contract H
        y = jax.lax.dot_general(y, m, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # [B', PT, 24(w), 24(h)] -> sum pt, fix (h, w) order
        return y.sum(axis=1).transpose(0, 2, 1)

    return sums(x), sums(x * x)


if __name__ == "__main__":
    a1, b1 = jax.jit(reduce_window)(x2d[:24])
    a2, b2 = jax.jit(incidence)(x2d[:24])
    print("max|d_sum1|", float(jnp.max(jnp.abs(a1 - a2))),
          "max|d_sum2|", float(jnp.max(jnp.abs(b1 - b2))))
    timeit("reduce_win", reduce_window, x2d)
    timeit("incidence", incidence, x2d)
