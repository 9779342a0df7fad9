"""Persistent warm-TPU job runner.

The tunneled axon backend costs 30-600 s of per-process warmup and ~30 ms
per host sync, which makes one-shot measurement scripts useless. This
process warms JAX once, then polls /tmp/jobs/*.py and execs each file in a
shared namespace (jax/jnp/np/time preloaded), writing output to
/tmp/jobs/done/<name>.out. Start it detached:

    mkdir -p /tmp/jobs/done && setsid nohup python tools/tpu_runner.py \
        > /tmp/jobrunner.log 2>&1 < /dev/null &

then drop python snippets into /tmp/jobs/ and read the .out files.
Used for every TPU measurement in round 1 (see CLAUDE.md gotchas).
"""
import glob, io, os, sys, time, traceback, contextlib
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

ns = {"jax": jax, "jnp": jnp, "np": np, "time": time}
# warmup
t0 = time.time()
float(jax.jit(lambda x: (x + 1).sum())(jnp.ones((8, 128))))
print(f"warmup {time.time()-t0:.0f}s", flush=True)
open("/tmp/jobs/READY", "w").write("ok")

while True:
    jobs = sorted(glob.glob("/tmp/jobs/*.py"))
    for j in jobs:
        name = os.path.basename(j)
        src = open(j).read()
        os.rename(j, f"/tmp/jobs/done/{name}")
        buf = io.StringIO()
        t0 = time.time()
        try:
            with contextlib.redirect_stdout(buf):
                exec(compile(src, name, "exec"), ns)
            status = "OK"
        except Exception:
            buf.write(traceback.format_exc())
            status = "ERR"
        out = f"== {name} {status} {time.time()-t0:.1f}s ==\n" + buf.getvalue()
        open(f"/tmp/jobs/done/{name}.out", "w").write(out)
        print(out, flush=True)
    time.sleep(1)
