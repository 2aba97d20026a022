"""Measure raw host<->device round-trip and dispatch latencies."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    x = jnp.float32(1.5)
    jax.block_until_ready(x)

    @jax.jit
    def trivial(a):
        return a + 1.0

    jax.block_until_ready(trivial(x))

    # pure fetch of an existing device scalar
    t0 = time.perf_counter()
    for _ in range(50):
        np.asarray(x)
    print(f"fetch scalar      : {(time.perf_counter()-t0)/50*1e3:7.2f} ms")

    big = jnp.zeros((4096 * 3,), jnp.float32)
    jax.block_until_ready(big)
    t0 = time.perf_counter()
    for _ in range(50):
        np.asarray(big)
    print(f"fetch 48KB        : {(time.perf_counter()-t0)/50*1e3:7.2f} ms")

    # dispatch of a cached trivial jit (async, then sync)
    t0 = time.perf_counter()
    for _ in range(50):
        y = trivial(x)
    jax.block_until_ready(y)
    print(f"dispatch async x50: {(time.perf_counter()-t0)/50*1e3:7.2f} ms/call")

    t0 = time.perf_counter()
    for _ in range(50):
        jax.block_until_ready(trivial(x))
    print(f"dispatch sync     : {(time.perf_counter()-t0)/50*1e3:7.2f} ms")

    # upload latencies
    h = np.zeros((4096,), np.int32)
    t0 = time.perf_counter()
    for _ in range(50):
        jax.block_until_ready(jnp.asarray(h))
    print(f"upload 16KB sync  : {(time.perf_counter()-t0)/50*1e3:7.2f} ms")

    # chained: upload -> program -> fetch (a miniature tracked frame)
    def roundtrip():
        d = jnp.asarray(h)
        r = trivial(x)
        return np.asarray(r)

    t0 = time.perf_counter()
    for _ in range(50):
        roundtrip()
    print(f"up+prog+fetch     : {(time.perf_counter()-t0)/50*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
