"""Dev: microbench overlap matrix + NMS on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.ops.iou3d import boxes_overlap_bev, nms_bev

rng = np.random.RandomState(0)


def rand_boxes(n):
    b = np.zeros((n, 7), np.float32)
    b[:, 0] = rng.uniform(0, 70, n)
    b[:, 1] = rng.uniform(-40, 40, n)
    b[:, 2] = rng.uniform(-2, 0, n)
    b[:, 3] = rng.uniform(1.5, 5, n)
    b[:, 4] = rng.uniform(1.5, 2.5, n)
    b[:, 5] = rng.uniform(1.2, 2, n)
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def timeit(name, fn, *args, iters=10):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(*args)
        if (i + 1) % 5 == 0:
            np.asarray(jax.tree.leaves(out)[0])
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.2f} ms", flush=True)


A = jnp.asarray(rand_boxes(512))
B = jnp.asarray(rand_boxes(512))
timeit("overlap 512x512", lambda a, b: boxes_overlap_bev(a, b).sum(), A, B)

A2 = jnp.asarray(rand_boxes(1024))
timeit("overlap 1024x1024", lambda a, b: boxes_overlap_bev(a, b).sum(), A2, A2)

N = 9216
boxes4 = jnp.asarray(np.stack([rand_boxes(N) for _ in range(4)]))
scores4 = jnp.asarray(rng.uniform(0, 1, (4, N)).astype(np.float32))


@jax.jit
def nms_eval(b, s):
    k, m = jax.vmap(lambda bb, ss: nms_bev(bb, ss, 0.85, 100))(b, s)
    return k.sum() + m.sum()


@jax.jit
def nms_train(b, s):
    k, m = jax.vmap(lambda bb, ss: nms_bev(bb, ss, 0.8, 512))(b, s)
    return k.sum() + m.sum()


timeit("nms B=4 9216->100 @0.85", nms_eval, boxes4, scores4)
timeit("nms B=4 9216->512 @0.8", nms_train, boxes4, scores4)
