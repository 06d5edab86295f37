"""Parse a jax.profiler Chrome trace into per-kernel DEVICE times.

Round-4 verdict: share-normalized bench columns disagreed up to 7x between
back-to-back rows because adjacent host-side probes cannot capture the
share inside the metric's own window.  The profiler's "XLA Modules" /
"XLA Ops" rows carry device-side durations for each executable and each
kernel within it — share-free by construction (the devil's own timer), so
they are the reconciliation anchor for the SOL.md model and the bench's
``*_normalized_ms`` columns (the ``*_trace_ms`` column the verdict asked
for).  The reference's analogue is Nsight kernel times via ``-lineinfo``
(/root/reference/modules/cuda_efficient_features/CMakeLists.txt:31-33).

Usage:
    python tools/parse_trace.py [trace.json.gz] [-o TRACE_MS.json]

Reads traces/detect_and_dac_4k.trace.json.gz by default and writes
tools/TRACE_MS.json, which bench.py attaches to BENCH_DETAIL.json
(``trace_ms``) and merges into per-metric ``*_trace_ms`` columns via the
``metrics`` mapping below.  Re-capture with tools/capture_trace.py.
"""
import argparse
import gzip
import json
import os
import re
from collections import defaultdict

# legacy annotation names (round-4 capture) -> bench.py metric keys; new
# captures (tools/capture_trace.py) annotate with the bench key directly
ANN_ALIASES = {
    "detect_4k_10k": "detect_4k",
    "detect_and_compute_4k_40k_bad256": "detect_and_compute_4k_40k_bad_256",
}


def load_events(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        return json.load(f)["traceEvents"]


def parse(path):
    ev = load_events(path)
    tnames = {}
    for e in ev:
        if e.get("ph") == "M" and e["name"] == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"]["name"]

    def thread(e):
        return tnames.get((e["pid"], e.get("tid")))

    mods = [e for e in ev
            if e.get("ph") == "X" and thread(e) == "XLA Modules"]
    ops = [e for e in ev if e.get("ph") == "X" and thread(e) == "XLA Ops"]

    # module instances, grouped by name with the fingerprint hash dropped
    def mod_base(name):
        return re.sub(r"\(\d+\)$", "", name)

    # host TraceAnnotation spans, up-front: they disambiguate module
    # instances whose jit functions share a Python name (compute_jit runs
    # for both BAD and HS — pooling them made per_iter_ms a bimodal
    # mixture and divided each op total by the combined count) and later
    # provide the per-metric mapping
    ann_pat = re.compile(r"^[a-z0-9_]+$")
    host_spans = [e for e in ev
                  if e.get("ph") == "X"
                  and thread(e) not in ("XLA Modules", "XLA Ops",
                                        "Async XLA Ops")
                  and ann_pat.match(e.get("name", ""))
                  and e.get("dur", 0) > 1000]

    def ann_of(ts, dur):
        for a in host_spans:
            if ts >= a["ts"] and ts + dur <= a["ts"] + a["dur"]:
                return a["name"]
        return None

    grouped = defaultdict(list)       # (base, ann) -> [(ts, dur_us)]
    for e in mods:
        grouped[(mod_base(e["name"]), ann_of(e["ts"], e["dur"]))].append(
            (e["ts"], e["dur"]))
    anns_per_base = defaultdict(set)
    for (base, ann) in grouped:
        anns_per_base[base].add(ann)
    # an instance straddling its annotation boundary (warm-up iteration)
    # maps to ann None; fold it into the base's unique real annotation
    for base, anns in anns_per_base.items():
        real = anns - {None}
        if None in anns and len(real) == 1:
            grouped[(base, next(iter(real)))].extend(
                grouped.pop((base, None)))
            anns.discard(None)
    inst = defaultdict(list)          # display key -> [(ts, dur_us)]
    for (base, ann), rows in grouped.items():
        key = (base if len(anns_per_base[base]) == 1
               else f"{base}[{ann or 'unannotated'}]")
        inst[key].extend(rows)

    modules = {}
    for base, rows in inst.items():
        durs = sorted(d for _, d in rows)
        med = durs[len(durs) // 2]
        if med < 50:                  # skip trivial glue executables
            continue
        modules[base] = {"per_iter_ms": round(med / 1e3, 3),
                         "iters": len(rows)}

    # attribute ops to their enclosing module instance by time containment
    spans = []                        # (ts0, ts1, base)
    for base in modules:
        for ts, dur in inst[base]:
            spans.append((ts, ts + dur, base))
    spans.sort()

    def op_base(name):
        # strip the per-instance ".N" suffix so all pyramid levels of one
        # kernel aggregate under the kernel name; keep fusion names whole
        return re.sub(r"\.\d+$", "", name)

    per_mod_op = defaultdict(lambda: defaultdict(float))
    import bisect
    starts = [s[0] for s in spans]
    for e in ops:
        i = bisect.bisect_right(starts, e["ts"]) - 1
        if i < 0:
            continue
        ts0, ts1, base = spans[i]
        if e["ts"] + e["dur"] <= ts1 + 1:
            per_mod_op[base][op_base(e["name"])] += e["dur"]

    for base, m in modules.items():
        agg = per_mod_op.get(base, {})
        n = m["iters"]
        rows = sorted(agg.items(), key=lambda kv: -kv[1])
        top = {k: round(v / n / 1e3, 3) for k, v in rows[:12]}
        rest = sum(v for _, v in rows[12:])
        if rest:
            top["(other)"] = round(rest / n / 1e3, 3)
        m["ops_per_iter_ms"] = top

    out = {"source": os.path.basename(path), "modules": modules,
           "note": ("per_iter_ms = median device-side XLA-Module duration; "
                    "ops_per_iter_ms = per-kernel device time within one "
                    "iteration (share-free, unlike wall-clock bench rows)")}

    # map bench metric keys onto modules via the capture's TraceAnnotations
    # (host_spans above; device module timestamps share the timebase):
    # each annotation owns the module instances fully inside it.
    # TraceAnnotation names are snake_case metric keys; runtime-internal
    # host spans ($file.py:line, PjitFunction(...), np.asarray(...)) are
    # excluded by the identifier-only pattern
    out["metrics"] = {}
    for a in host_spans:
        key = ANN_ALIASES.get(a["name"], a["name"])
        durs = sorted(
            dur for base in inst for ts, dur in inst[base]
            if ts >= a["ts"] and ts + dur <= a["ts"] + a["dur"]
            and dur >= 50)
        if durs:
            out["metrics"][key] = round(durs[len(durs) // 2] / 1e3, 3)
    return out


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", nargs="?", default=os.path.join(
        here, "traces", "detect_and_dac_4k.trace.json.gz"))
    ap.add_argument("-o", "--out", default=os.path.join(
        here, "tools", "TRACE_MS.json"))
    args = ap.parse_args()
    out = parse(args.trace)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
