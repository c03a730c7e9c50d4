"""Shared timing protocol for the headline benches (axon relay safe).

On the axon relay, block_until_ready is a no-op (execution defers to the
host fetch) and every fetch pays a round-trip whose latency varies from
~50 ms to seconds (reclaims). Subtracting a separately-probed RTT is
fragile — a slow probe makes the corrected time negative (observed: the
Waymo bench once reported 3.2e10 scans/s). Instead, time the SAME chained
computation at two trip counts and divide the difference:

    dt_per_iter = (T(n_big) - T(n_small)) / (n_big - n_small)

Per-call constants (claim, dispatch, fetch RTT) cancel in the difference;
taking the min over reps rejects transient relay stalls. Every call gets
an input perturbed by a unique (n, rep) epsilon so the relay's
byte-identical request dedup can never serve a cached result.
"""
import time


def measure_per_iter(run, n_small, n_big, reps=3):
    """Seconds per chained iteration.

    run(n, tag) must execute n chained iterations of the workload on an
    input perturbed by `tag` (unique per call) and block until a scalar
    result reaches the host.
    """
    assert n_big > n_small > 0
    run(n_small, 0)  # warm both trip counts (compile + first execute)
    run(n_big, 1)
    t_small = min(_timed(run, n_small, 10 + r) for r in range(reps))
    t_big = min(_timed(run, n_big, 20 + r) for r in range(reps))
    return max(t_big - t_small, 1e-9) / (n_big - n_small)


def _timed(run, n, tag):
    t0 = time.perf_counter()
    run(n, tag)
    return time.perf_counter() - t0
