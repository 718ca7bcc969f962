#!/usr/bin/env python3
"""Attribute bench-session interference spikes to a mechanism.

Reads a Bench artifact carrying the r18 `gc_ms_n_heap0` block
({entry: [gc_ms_delta, gc_count_delta, heap_used_mb_at_start]}) plus
`storage_rdds_mb` ({entry: [n_persisted_rdds, mb]}), and prints, for the
most expensive entries (or an explicit name list), the fraction of the
entry's wall-clock that was JVM GC time, the heap level it started at,
and the persisted footprint it started under.

Usage: gc_attrib.py BENCH.json [name1,name2,...]
"""
import json
import sys


def main() -> None:
    j = json.load(open(sys.argv[1]))
    q = j["queries"]
    gh = j.get("gc_ms_n_heap0", {})
    st = j.get("storage_rdds_mb", {})
    if len(sys.argv) > 2:
        names = sys.argv[2].split(",")
    else:
        names = [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])[:25]]
    tot_gc = sum(v[0] for v in gh.values())
    print(f"total wall {j['value']:.1f}s  total gc {tot_gc/1000:.1f}s "
          f"({100*tot_gc/1000/j['value']:.1f}%)  entries {len(q)}")
    print(f"{'entry':42s} {'wall_s':>7s} {'gc_s':>6s} {'gc%':>5s} {'gcs':>4s} "
          f"{'heap0_mb':>8s} {'rdds':>4s} {'cache_mb':>8s}")
    for n in names:
        if n not in q:
            print(f"{n:42s} (absent)")
            continue
        wall = q[n]
        gms, gn, heap = gh.get(n, (0, 0, 0))
        rdds, mb = st.get(n, (0, 0))
        pct = 100 * (gms / 1000) / wall if wall > 0 else 0.0
        print(f"{n:42s} {wall:7.2f} {gms/1000:6.2f} {pct:5.1f} {gn:4d} "
              f"{heap:8d} {rdds:4d} {mb:8d}")


if __name__ == "__main__":
    main()
