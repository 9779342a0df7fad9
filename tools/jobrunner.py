"""Warm-process experiment runner.

The tunneled TPU backend costs 30-600 s to warm up per process and remote
compiles are uncached across processes, so A/B experiments must share one
live process. This runner keeps a warm JAX+TPU context and executes job
files dropped into tools/jobs/: each `<name>.py` is exec'd in a fresh
namespace (with `jax`, `jnp`, `np` prebound), stdout/stderr captured to
`<name>.out`, and the job file renamed to `<name>.done` (or `.fail`).

Usage:  python tools/jobrunner.py          # blocks; run under setsid/bg
        echo '...' > tools/jobs/exp1.py    # submit
        cat tools/jobs/exp1.out            # result
"""

import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jobs")
os.makedirs(JOBS, exist_ok=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t0 = time.time()
    dev = jax.devices()[0]
    # Tiny op to force backend warmup now, not at first job.
    np.asarray(jnp.zeros(8) + 1)
    print(f"ready: {dev} ({dev.platform}) in {time.time()-t0:.1f}s", flush=True)
    with open(os.path.join(JOBS, "READY"), "w") as f:
        f.write(f"{dev}\n")

    while True:
        jobs = sorted(f for f in os.listdir(JOBS) if f.endswith(".py"))
        if not jobs:
            if os.path.exists(os.path.join(JOBS, "STOP")):
                print("stopping", flush=True)
                return
            time.sleep(0.5)
            continue
        name = jobs[0]
        path = os.path.join(JOBS, name)
        outp = path[:-3] + ".out"
        print(f"running {name}", flush=True)
        buf = io.StringIO()
        old_out, old_err = sys.stdout, sys.stderr
        sys.stdout = sys.stderr = buf
        t0 = time.time()
        ok = True
        try:
            with open(path) as f:
                src = f.read()
            g = {"jax": jax, "jnp": jnp, "np": np, "__name__": "__job__"}
            exec(compile(src, path, "exec"), g)
        except BaseException:
            ok = False
            traceback.print_exc()
        finally:
            sys.stdout, sys.stderr = old_out, old_err
        dt = time.time() - t0
        with open(outp, "w") as f:
            f.write(buf.getvalue())
            f.write(f"\n[{'OK' if ok else 'FAIL'} in {dt:.1f}s]\n")
        try:
            os.rename(path, path[:-3] + (".done" if ok else ".fail"))
        except FileNotFoundError:
            pass  # job file removed mid-run; results are in the .out
        print(f"finished {name}: {'OK' if ok else 'FAIL'} in {dt:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
