"""Micro-benchmark helpers.

The axon tunnel adds ~23 ms of fixed overhead per host->device dispatch, so
kernel timing must (a) amortize with an on-device `fori_loop` chained through
a data dependency (so XLA cannot hoist the body), and (b) report the *slope*
between two iteration counts, which cancels the fixed dispatch cost.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _loop_fn(f, n_iters):
    def loop(x):
        def body(_, x):
            y = f(x)
            tweak = (y.reshape(-1)[0] * 1e-20).astype(x.dtype)
            return x + tweak
        return jax.lax.fori_loop(0, n_iters, body, x)
    return jax.jit(loop)

def _time(lf, x, n_timed):
    jax.block_until_ready(lf(x))          # compile + warm
    times = []
    for _ in range(n_timed):
        t0 = time.perf_counter()
        jax.block_until_ready(lf(x))
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_op(f, x, n_iters: int = 100, n_timed: int = 5):
    """Seconds per call of y = f(x), dispatch overhead cancelled.

    f's output must depend on x (the loop chains one output element back into
    x to create the carried dependency).

    The tunnel's ~27 ms round trip is a latency FLOOR, not an additive
    cost: device work below it is completely hidden (measured: a 64 x
    ~60 us loop and a single call both return in ~29 ms), so a slope
    between two loop counts that BOTH finish under the floor reads ~0
    ("0.0 us" rows, >1 TB/s phantom rates). Adaptively double the counts
    until the long loop's wall time clearly clears the short one's.
    """
    n1 = n_iters
    for _ in range(6):
        n2 = 3 * n1
        t1 = _time(_loop_fn(f, n1), x, n_timed)
        t2 = _time(_loop_fn(f, n2), x, n_timed)
        if t2 >= 1.5 * t1 and t2 > 0.060:   # both resolvable and > floor
            break
        n1 *= 4
    return max((t2 - t1) / (n2 - n1), 1e-9)
