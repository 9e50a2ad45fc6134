"""Ground-truth per-op profile from an xplane trace (the r4 method, PERF.md).

Usage:
  python bench.py --trace-dir /tmp/trace            # on the TPU
  python tools/profile_xplane.py /tmp/trace [--top N] [--module SUBSTR]

Method (why this and not stage bisects): per-stage prefix timing and
standalone op benchmarks both mislead on TPU because XLA fuses differently in
context (PERF.md r3/r4 lessons).  The xplane device trace is authoritative:
take the top-level (non-nested) "XLA Ops" events inside ONE execution window
of the jit step's module, group by the `tf_op` scope stat (the jax name-scope
path), and report exclusive durations.
"""

import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def load_xplane(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    assert paths, f"no xplane.pb under {trace_dir}"
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space


def device_plane(space):
    tpu = [p for p in space.planes if "TPU" in p.name and "device" in p.name.lower()]
    if not tpu:
        tpu = [p for p in space.planes if "TPU" in p.name]
    assert tpu, f"no TPU plane; planes: {[p.name for p in space.planes]}"
    return tpu[0]


def _stat_lookup(plane):
    return {m.id: m.name for m in plane.stat_metadata.values()}


def events_by_line(plane):
    out = {}
    for line in plane.lines:
        out[line.name] = line
    return out


def op_table(trace_dir, module_substr=None):
    """Returns (module_name, window_ns, rows) where rows =
    [(tf_op_scope, hlo_op_name, total_ns, count)] top-level-exclusive within
    one module window."""
    space = load_xplane(trace_dir)
    plane = device_plane(space)
    statname = _stat_lookup(plane)
    emeta = {m.id: m for m in plane.event_metadata.values()}
    lines = events_by_line(plane)

    mods = lines.get("XLA Modules")
    assert mods is not None, f"lines: {list(lines)}"
    # pick the most-frequent module (the steady-state jit step), optionally
    # filtered by substring; use its LAST complete window
    counts = collections.Counter(
        emeta[e.metadata_id].name for e in mods.events)
    cands = [(n, c) for n, c in counts.items()
             if module_substr is None or module_substr in n]
    assert cands, f"no module matching {module_substr!r}; have {counts}"
    mod_name = max(cands, key=lambda nc: nc[1])[0]
    wins = [e for e in mods.events if emeta[e.metadata_id].name == mod_name]
    win = wins[-1]
    w0, w1 = win.offset_ps, win.offset_ps + win.duration_ps

    ops_line = lines.get("XLA Ops")
    assert ops_line is not None, f"lines: {list(lines)}"
    evs = [e for e in ops_line.events
           if e.offset_ps >= w0 and e.offset_ps + e.duration_ps <= w1]
    evs.sort(key=lambda e: (e.offset_ps, -e.duration_ps))

    # top-level = not contained in a previous event's interval
    rows = collections.defaultdict(lambda: [0, 0])
    cover_end = -1
    for e in evs:
        if e.offset_ps < cover_end:
            continue  # nested under the current covering op
        cover_end = max(cover_end, e.offset_ps + e.duration_ps)
        scope = ""
        for s in e.stats:
            if statname.get(s.metadata_id) == "tf_op":
                scope = s.str_value or statname.get(s.str_metadata_id, "")
        name = emeta[e.metadata_id].name
        key = (scope, name)
        rows[key][0] += e.duration_ps
        rows[key][1] += 1
    out = [(k[0], k[1], v[0], v[1]) for k, v in rows.items()]
    out.sort(key=lambda r: -r[2])
    return mod_name, win.duration_ps, out


def classify(hlo_name, scope):
    for tag in ("fusion", "convolution", "custom-call", "copy", "all-reduce",
                "dynamic-slice", "dynamic-update-slice", "scatter", "reduce",
                "transpose", "concatenate", "slice", "add", "maximum",
                "multiply", "select", "broadcast", "iota", "compare"):
        if hlo_name.startswith(tag) or hlo_name.split(".")[0] == tag:
            return tag
    return hlo_name.split(".")[0]


def parse_hlo_opnames(hlo_path):
    """instruction name -> (op_name metadata, result shape) from an optimized
    HLO text dump (jit(...).lower(...).compile().as_text())."""
    import re

    out = {}
    for line in open(hlo_path):
        m = re.match(r"\s+(?:ROOT )?%?([\w.-]+) = (\S+)", line)
        if not m:
            continue
        name, shape = m.group(1), m.group(2)
        om = re.search(r'op_name="([^"]+)"', line)
        out[name] = (om.group(1) if om else "", shape)
    return out


def attributed_table(trace_dir, hlo_path, module_substr="step"):
    """Trace rows joined with the HLO dump's op_name scopes.  The dump must be
    the SAME program as the trace (same code state) for names to line up."""
    names = parse_hlo_opnames(hlo_path)
    mod, win_ps, rows = op_table(trace_dir, module_substr)
    out = []
    for scope, name, ps, n in rows:
        key = name.split(" = ")[0].lstrip("%")
        op_name, shape = names.get(key, ("?", "?"))
        out.append((ps, n, key, shape, op_name))
    return mod, win_ps, out


def main():
    trace_dir = sys.argv[1]
    if "--hlo" in sys.argv:
        hlo_path = sys.argv[sys.argv.index("--hlo") + 1]
        top = 60
        if "--top" in sys.argv:
            top = int(sys.argv[sys.argv.index("--top") + 1])
        mod, win_ps, rows = attributed_table(trace_dir, hlo_path)
        print(f"module: {mod}  window {win_ps/1e9:.3f} ms")
        miss = sum(1 for r in rows if r[4] == "?")
        print(f"({miss}/{len(rows)} rows missing from the HLO dump — "
              f"re-dump if large)")
        import collections
        seg = collections.defaultdict(int)
        for ps, n, key, shape, op_name in rows:
            # group by the deepest jax scope path piece before the hlo op
            parts = [p for p in op_name.split("/") if p][1:-1] or ["(none)"]
            seg["/".join(parts[:3])] += ps
        print("\nby jax scope (3 levels):")
        for k, v in sorted(seg.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{v/1e9:9.3f}  {k}")
        print(f"\n{'ms':>9} {'n':>4}  {'hlo':<28} {'shape':<40} op_name")
        for ps, n, key, shape, op_name in rows[:top]:
            print(f"{ps/1e9:9.3f} {n:4d}  {key[:28]:<28} {shape[:40]:<40} "
                  f"{op_name[-70:]}")
        return
    top = 40
    module_substr = "step"
    for i, a in enumerate(sys.argv):
        if a == "--top":
            top = int(sys.argv[i + 1])
        if a == "--module":
            module_substr = sys.argv[i + 1]
    mod, win_ps, rows = op_table(trace_dir, module_substr)
    tot = sum(r[2] for r in rows)
    print(f"module: {mod}  window {win_ps/1e9:.3f} ms, "
          f"sum(top-level ops) {tot/1e9:.3f} ms")
    print(f"{'ms':>9} {'n':>4}  {'hlo':<34} scope")
    for scope, name, ps, n in rows[:top]:
        print(f"{ps/1e9:9.3f} {n:4d}  {name[:34]:<34} {scope[:80]}")

    print("\nby hlo class:")
    cls = collections.defaultdict(int)
    for scope, name, ps, n in rows:
        cls[classify(name, scope)] += ps
    for k, v in sorted(cls.items(), key=lambda kv: -kv[1]):
        print(f"{v/1e9:9.3f}  {k}")

    print("\nby top-level scope segment:")
    seg = collections.defaultdict(int)
    for scope, name, ps, n in rows:
        seg[scope.split("/")[0] if scope else "(none)"] += ps
    for k, v in sorted(seg.items(), key=lambda kv: -kv[1]):
        print(f"{v/1e9:9.3f}  {k}")


if __name__ == "__main__":
    main()
