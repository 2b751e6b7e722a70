"""Compare patch-embed formulations at flagship shapes on the real chip.

Candidates for the fast patch-embed (fwd + bwd):
  conv2d   - current: 2D conv, 10 input channels (channel-padded on MXU)
  dot      - dot_general with multi-axis contraction (XLA picks relayout)
  transmm  - explicit 7-d transpose -> one [N, 4000] @ [4000, 512] matmul
  conv1d   - fold (pt, p1) into 200 channels -> width-20 conv over W
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PE_BATCH", "16"))
STEPS = 5
PT, P, DIM = 10, 20, 512

key = jax.random.PRNGKey(0)
image = jax.random.normal(key, (B, 1, 240, 480, 480), jnp.bfloat16)
W = jax.random.normal(jax.random.PRNGKey(1), (PT * P * P, DIM),
                      jnp.bfloat16) * 0.02


def timeit(name, fn, *args):
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(np.asarray(jfn(*args)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(STEPS):
        float(np.asarray(jfn(*args)))
    dt = (time.perf_counter() - t0) / STEPS
    flops = 2 * B * 24 * 576 * PT * P * P * DIM
    print(f"{name:12s} {dt * 1e3:8.2f} ms  {flops / dt / 1e12:6.1f} TF/s"
          f"  (compile {compile_s:.0f}s)", flush=True)


def grad_timeit(name, fn, *args):
    def loss(img, w):
        return jnp.sum(fn(img, w).astype(jnp.float32) ** 2)
    jfn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t0 = time.perf_counter()
    g = jfn(*args)
    float(np.asarray(jnp.sum(g[1].astype(jnp.float32))))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(STEPS):
        g = jfn(*args)
        float(np.asarray(jnp.sum(g[1].astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:12s} {dt * 1e3:8.2f} ms (fwd+bwd)  (compile {compile_s:.0f}s)",
          flush=True)


def conv2d(img, w):
    b = img.shape[0]
    t = img.shape[2] // PT
    x2d = img.reshape(b, 1, t, PT, 480, 480)
    x2d = x2d.transpose(0, 2, 1, 3, 4, 5).reshape(b * t, PT, 480, 480)
    k2d = w.reshape(1, PT, P, P, DIM).transpose(2, 3, 0, 1, 4)
    k2d = k2d.reshape(P, P, PT, DIM)
    return jax.lax.conv_general_dilated(
        x2d, k2d, window_strides=(P, P), padding="VALID",
        dimension_numbers=("NCHW", "HWIO", "NHWC"))


def dot(img, w):
    b = img.shape[0]
    t = img.shape[2] // PT
    x = img.reshape(b, t, PT, 24, P, 24, P)
    wk = w.reshape(PT, P, P, DIM)
    return jax.lax.dot_general(
        x, wk, dimension_numbers=(((2, 4, 6), (0, 1, 2)), ((), ())),
        preferred_element_type=jnp.float32).astype(img.dtype)


def transmm(img, w):
    b = img.shape[0]
    t = img.shape[2] // PT
    x = img.reshape(b, t, PT, 24, P, 24, P)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6).reshape(b * t * 576, PT * P * P)
    y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.reshape(b, t, 24, 24, DIM).astype(img.dtype)


def conv1d(img, w):
    b = img.shape[0]
    t = img.shape[2] // PT
    # [b, t, PT, 24, P, 480] -> [b*t*24, PT*P, 480] channels=200
    x = img.reshape(b, t, PT, 24, P, 480)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b * t * 24, PT * P, 480)
    # kernel rows (pt, p1) as input channels, width p2
    k = w.reshape(PT, P, P, DIM).reshape(PT * P, P, DIM)
    k = k.transpose(1, 0, 2)  # [width P, in 200, out DIM]
    y = jax.lax.conv_general_dilated(
        x[:, :, None, :], k[None], window_strides=(1, P), padding="VALID",
        dimension_numbers=("NCHW", "HWIO", "NHWC"))
    return y.reshape(b, t, 24, 24, DIM)


if __name__ == "__main__":
    fns = {"conv2d": conv2d, "dot": dot, "transmm": transmm, "conv1d": conv1d}
    only = set(sys.argv[1:])
    ref = np.asarray(jax.jit(conv2d)(image[:1], W)).reshape(-1)
    for name, fn in fns.items():
        if only and name not in only:
            continue
        got = np.asarray(jax.jit(fn)(image[:1], W)).reshape(-1)
        err = np.max(np.abs(got.astype(np.float32) - ref.astype(np.float32)))
        print(f"{name}: max|diff vs conv2d| = {err:.4f}")
        timeit(name, fn, image, W)
        if name != "dot":  # dot's VJP materializes a 6.4x-padded 10.5 GB temp
            grad_timeit(name + "+bwd", fn, image, W)
