"""Tunnel health check that never needs an external kill.

The dev tunnel's remote compile service wedges when a client process is
killed mid-RPC, and a wedged service parks every subsequent compile
forever — so health checks must self-terminate.  A daemon watchdog calls
os._exit after the deadline; exit code 0 = compile path healthy, 3 = wedged.

Usage: python tpu_health.py [deadline_seconds=90]
"""

import os
import sys
import threading
import time


def main():
    deadline = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0

    def watchdog():
        time.sleep(deadline)
        print("health: WEDGED (compile did not return)", flush=True)
        os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    f = jax.jit(lambda a: (a @ a)[0, 0])
    v = float(f(jnp.ones((8, 8))))
    print(f"health: OK jit={v} {time.perf_counter() - t0:.1f}s", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
