"""Persistent TPU job worker: keeps one warmed backend (the axon tunnel
warmup is ~8 min per process) and exec()s job files dropped into
/tmp/tpu_jobs, so a round of A/B experiments pays the warmup once.

Usage:  python benchmarks/tpu_worker.py   (leave running)
        write /tmp/tpu_jobs/<name>.py     -> executes, result in <name>.out
        write /tmp/tpu_jobs/STOP          -> exits

Each job runs in a fresh module namespace but shares the process (and thus
the jax backend, compilation cache, and any objects stashed in SHARED).
"""

from __future__ import annotations

import io
import os
import sys
import time
import traceback

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

t0 = time.time()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jnp.zeros(8).block_until_ready()
print(f"worker ready: {jax.devices()} warmup {time.time() - t0:.1f}s", flush=True)

SHARED: dict = {}

while True:
    stop = os.path.join(JOBS, "STOP")
    if os.path.exists(stop):
        os.remove(stop)
        print("worker stopping", flush=True)
        break
    jobs = sorted(
        f for f in os.listdir(JOBS)
        if f.endswith(".py") and not os.path.exists(os.path.join(JOBS, f + ".done"))
    )
    for name in jobs:
        path = os.path.join(JOBS, name)
        out_path = os.path.join(JOBS, name[:-3] + ".out")
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        t = time.time()
        try:
            src = open(path).read()
            ns = {"SHARED": SHARED, "jax": jax, "jnp": jnp}
            exec(compile(src, path, "exec"), ns)
            status = "ok"
        except Exception:
            traceback.print_exc(file=buf)
            status = "error"
        finally:
            sys.stdout = old
        with open(out_path, "w") as f:
            f.write(f"# status={status} wall={time.time() - t:.2f}s\n")
            f.write(buf.getvalue())
        open(path + ".done", "w").close()
        print(f"job {name}: {status} ({time.time() - t:.1f}s)", flush=True)
    time.sleep(0.5)
