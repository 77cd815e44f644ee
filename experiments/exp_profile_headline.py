"""On-device jax.profiler trace of the SDXL headline step (VERDICT r4
next #1: the ~30% non-HBM residual is attributed to "dispatch/occupancy"
without evidence — capture a real trace and decompose it).

Runs bench.py's exact headline stage config, traces a few steady-state
steps, then parses the Perfetto trace.json.gz the profiler dumps:
per-TPU-track busy time vs wall span (inter-kernel gaps), and the top
ops by self time. Prints one JSON line; the raw trace stays under
/tmp/ot_profile for manual Perfetto inspection.

Usage: python experiments/exp_profile_headline.py [bs]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

OUT = "/tmp/ot_profile"


def _run_and_trace(bs: int):
    sys.path.insert(0, "/root/repo")
    # ride bench._bench_sdxl itself (identical graph -> compile-cache
    # hit; the first cut of this script re-built the step inline, missed
    # the cache and burned its whole window compiling): OT_PROFILE_DIR
    # makes the stage bracket 4 post-measurement steps with the profiler
    os.environ["OT_PROFILE_DIR"] = OUT
    import bench

    jax, jnp, optax = bench._jax_modules()
    res = bench._bench_sdxl(jax, jnp, optax,
                            base_quant=jnp.float8_e4m3fn, bs=bs)
    print(json.dumps({"measured_imgs_per_sec": round(
        res["imgs_per_sec"], 3)}), file=sys.stderr)


def _analyze():
    paths = glob.glob(os.path.join(
        OUT, "plugins/profile/*/*trace.json.gz"))
    if not paths:
        return {"error": f"no trace.json.gz under {OUT}"}
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # map process/thread ids to names to find the TPU device tracks
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {pid for pid, n in pnames.items()
                   if "TPU" in n or "/device" in n.lower()}
    per_track = defaultdict(lambda: {"busy": 0.0, "t0": None, "t1": None,
                                     "n": 0})
    op_self = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tid = (e["pid"], e.get("tid"))
        tr = per_track[tnames.get(tid, str(tid))]
        ts, dur = e.get("ts", 0.0), e.get("dur", 0.0)
        tr["busy"] += dur
        tr["n"] += 1
        tr["t0"] = ts if tr["t0"] is None else min(tr["t0"], ts)
        tr["t1"] = (ts + dur if tr["t1"] is None
                    else max(tr["t1"], ts + dur))
        op_self[e.get("name", "?")] += dur
    tracks = {}
    for name, tr in per_track.items():
        span = (tr["t1"] - tr["t0"]) if tr["t0"] is not None else 0.0
        tracks[name] = {
            "busy_ms": round(tr["busy"] / 1e3, 2),
            "span_ms": round(span / 1e3, 2),
            "gap_ms": round((span - tr["busy"]) / 1e3, 2),
            "occupancy": round(tr["busy"] / span, 3) if span else None,
            "events": tr["n"],
        }
    top = sorted(op_self.items(), key=lambda kv: -kv[1])[:25]
    return {
        "trace": path,
        "tracks": tracks,
        "top_ops_ms": {k[:80]: round(v / 1e3, 2) for k, v in top},
    }


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    _run_and_trace(bs)
    print(json.dumps(_analyze()))
