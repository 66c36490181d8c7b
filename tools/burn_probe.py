"""No-Ray host-ceiling probe: per-core throughput of a pure-CPU kernel
at 1/4/8/16/32 concurrent processes (the r1 oversubscription measurement)."""
import multiprocessing as mp
import time


def burn(n):
    t0 = time.time()
    x = 0
    for i in range(14_000_000):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return time.time() - t0


if __name__ == "__main__":
    for k in (1, 4, 8, 16, 32):
        with mp.Pool(k) as p:
            t0 = time.time()
            times = p.map(burn, range(k))
            wall = time.time() - t0
        print(f"procs={k:2d} wall={wall:6.2f}s mean_task={sum(times)/k:6.2f}s "
              f"per_core_vs_1 below")
