"""Attribute a captured device profile to SOURCE LINES by joining the
profiler's per-op times with the optimized HLO's metadata.

    python tools/attr_profile.py /tmp/srtpu_whitted_trace /tmp/whitted_opt.hlo
"""

import collections
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from software_rasterizer_tpu.utils.profiling import summarize_device_time


def parse_hlo_meta(path):
    """op name -> (source_file:line, op_name path)."""
    meta = {}
    pat = re.compile(
        r"%(\S+?) = .*?metadata=\{[^}]*?"
        r'(?:op_name="([^"]*)")?[^}]*?'
        r'source_file="([^"]*)"[^}]*?source_line=(\d+)'
    )
    opn = re.compile(r'op_name="([^"]*)"')
    src = re.compile(r'source_file="([^"]*)".*?source_line=(\d+)')
    with open(path) as f:
        for line in f:
            m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", line)
            if not m:
                continue
            name = m.group(1)
            om = opn.search(line)
            sm = src.search(line)
            if sm:
                meta[name] = (
                    f"{sm.group(1).rsplit('/', 1)[-1]}:{sm.group(2)}",
                    om.group(1) if om else "",
                )
            elif om:
                meta[name] = ("?", om.group(1))
    return meta


def main():
    trace_dir = sys.argv[1]
    hlo = sys.argv[2]
    rows = summarize_device_time(trace_dir, top=4000)
    meta = parse_hlo_meta(hlo)
    by_line = collections.Counter()
    ops_by_line = collections.defaultdict(collections.Counter)
    unattributed = 0.0
    # drop the whole-program row (it double-counts its children)
    rows = [r for r in rows if not r[0].startswith("jit_")]
    for name, secs, _ in rows:
        m = meta.get(name)
        if m is None:
            # fusion names in the profile sometimes lack the %-prefix
            # suffix match
            unattributed += secs
            by_line["<unattributed: " + name[:40] + ">"] += secs
            continue
        key = m[0] + "  [" + m[1].split("/")[-1][:40] + "]"
        by_line[key] += secs
        ops_by_line[key][name] += secs
    print(f"{'device-ms':>10}  source line [op]")
    for key, secs in by_line.most_common(40):
        print(f"{secs*1e3:10.2f}  {key}")
    print(f"total attributed+un: {sum(by_line.values())*1e3:.1f} ms")


if __name__ == "__main__":
    main()
