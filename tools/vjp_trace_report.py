"""Summarize a captured xprof trace dir (framework_op_stats table).

Usage: python tools/vjp_trace_report.py /tmp/vjp_trace_manual [n]
"""

import glob
import json
import sys

try:
    from xprof.convert import raw_to_tool_data as rtd
except ImportError:
    from tensorboard_plugin_profile.convert import (  # noqa
        raw_to_tool_data as rtd,
    )

trace_dir = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
xplane = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
data, _ = rtd.xspace_to_tool_data(xplane, "framework_op_stats", {})
payload = json.loads(data) if isinstance(data, (str, bytes)) else data
table = payload[0]
cols = [c["id"] for c in table["cols"]]
recs = []
for r in table["rows"]:
    vals = [c.get("v") if c else None for c in r["c"]]
    recs.append(dict(zip(cols, vals)))
recs = [r for r in recs if r.get("host_or_device") == "Device"]
recs.sort(key=lambda r: -(r.get("total_self_time") or 0))
print(f"{'self_us':>9} {'total_us':>9} {'occ':>5}  {'bound':<8} op")
for r in recs[:n]:
    print(
        f"{r['total_self_time']:>9.1f} {r['total_time']:>9.1f} "
        f"{r['occurrences']:>5}  {str(r.get('bound_by') or ''):<8} "
        f"{str(r['type'])[:14]:<14} {str(r['operation'])[:80]}"
    )
