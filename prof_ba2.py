import glob, gzip, json, collections, time
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from mneslam_tpu.ops import ba as ba_lib
from mneslam_tpu.ops import lie

ht, wd, Nf, E = 40, 80, 32, 273
key = jax.random.PRNGKey(0)
poses_list = [lie.retr(lie.identity((Nf,)), 0.01*jax.random.normal(jax.random.fold_in(key,i), (Nf,6))) for i in range(6)]
disps = 0.5*jnp.ones((Nf, ht, wd))
tgt = jax.random.uniform(key, (E, ht, wd, 2), maxval=40)
ii = jnp.asarray(np.random.randint(0, Nf, E)); jj = jnp.asarray(np.random.randint(0, Nf, E))
prob = ba_lib.BAProblem(target=tgt, weight=jnp.ones_like(tgt), eta=1e-4*jnp.ones((Nf,ht,wd)),
                        ii=ii, jj=jj, mask=jnp.ones(E))
intr = jnp.asarray([10.,10.,40.,20.])
f = jax.jit(lambda p: ba_lib.bundle_adjust(p, disps, intr, prob, iters=2))
o = f(poses_list[0]); jax.block_until_ready(o)
t0 = time.perf_counter()
for p in poses_list: o = f(p)
jax.block_until_ready(o)
print(f"bundle_adjust honest: {(time.perf_counter()-t0)/6*1e3:.2f} ms")

with jax.profiler.trace("/tmp/batrace"):
    for p in poses_list: o = f(p)
    jax.block_until_ready(o)
files = glob.glob("/tmp/batrace/**/*.trace.json.gz", recursive=True)
data = json.load(gzip.open(files[-1]))
ev = [e for e in data["traceEvents"] if e.get("ph") == "X"]
procs = {e["pid"]: e["args"].get("name","") for e in data["traceEvents"] if e.get("ph")=="M" and e.get("name")=="process_name"}
threads = {(e["pid"], e.get("tid")): e["args"].get("name","") for e in data["traceEvents"] if e.get("ph")=="M" and e.get("name")=="thread_name"}
agg = collections.Counter()
for e in ev:
    key2 = threads.get((e["pid"], e.get("tid")), "")
    if key2 == "XLA Ops":
        agg[e["name"]] += e.get("dur", 0)
total = sum(agg.values())
print(f"device total {total/1e3/6:.2f} ms/call; top ops:")
for n, d in agg.most_common(18):
    print(f"  {d/1e3/6:7.3f} ms {n[:80]}")
