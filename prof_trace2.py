import glob, gzip, json, collections
files = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True)
data = json.load(gzip.open(files[-1]))
ev = data["traceEvents"]
# map pid/tid -> names
procs = {}
threads = {}
for e in ev:
    if e.get("ph") == "M":
        if e.get("name") == "process_name":
            procs[e["pid"]] = e["args"].get("name", "")
        if e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
print("processes:", procs)
by_track = collections.Counter()
op_by_track = collections.defaultdict(collections.Counter)
for e in ev:
    if e.get("ph") == "X":
        key = (procs.get(e["pid"], e["pid"]), threads.get((e["pid"], e.get("tid")), e.get("tid")))
        by_track[key] += e.get("dur", 0)
        op_by_track[key][e.get("name","")] += e.get("dur", 0)
for k, v in by_track.most_common(12):
    print(f"{v/1e3:10.2f} ms total  track={k}")
# dump top ops of the busiest device-looking track
for k in by_track:
    if "TPU" in str(k) or "tpu" in str(k) or "XLA" in str(k):
        print("== ops on", k)
        for n, d in op_by_track[k].most_common(15):
            print(f"  {d/1e3/5:8.3f} ms/call {n[:90]}")
