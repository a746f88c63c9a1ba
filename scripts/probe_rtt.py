"""Measure the axon TPU-tunnel host-fetch round-trip on an idle device.

The headline bench barriers each step with a scalar host fetch (the tunnel
ignores block_until_ready); if the fetch RTT is large it serializes into
every measured step and understates device throughput. This probe times the
fetch of (a) a 4-byte scalar and (b) a chained tiny computation, 50 reps
each, and prints medians — the constant to subtract when sanity-checking
bench.py's pipelined-fetch methodology.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

# line-buffer stdout: under `timeout` in a queue, unflushed output is lost
# on SIGTERM (the first queue-F run timed out and recorded nothing)
print = functools.partial(print, flush=True)

REPS = int(__import__("os").environ.get("RTT_REPS", "20"))


def med(ts):
    ts = sorted(ts)
    n = len(ts)
    return ts[n // 2] if n % 2 else 0.5 * (ts[n // 2 - 1] + ts[n // 2])


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    x = jax.device_put(jnp.float32(1.5), dev)
    print("warming fetch path...")
    float(np.asarray(x))  # warm the path
    print("warm fetch done")
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        float(np.asarray(x))
        ts.append(time.time() - t0)
    print(f"fetch resident scalar: median {med(ts)*1e3:.2f} ms  "
          f"min {min(ts)*1e3:.2f}  max {max(ts)*1e3:.2f}")

    f = jax.jit(lambda y: y * 2.0 + 1.0)
    y = f(x)
    float(np.asarray(y))
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        y = f(y)
        float(np.asarray(y))
        ts.append(time.time() - t0)
    print(f"launch tiny jit + fetch: median {med(ts)*1e3:.2f} ms  "
          f"min {min(ts)*1e3:.2f}  max {max(ts)*1e3:.2f}")

    # device_put round-trip (host->device->host)
    a = np.ones((1,), np.float32)
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        float(np.asarray(jax.device_put(a, dev)))
        ts.append(time.time() - t0)
    print(f"put + fetch roundtrip: median {med(ts)*1e3:.2f} ms  "
          f"min {min(ts)*1e3:.2f}  max {max(ts)*1e3:.2f}")


if __name__ == "__main__":
    main()
