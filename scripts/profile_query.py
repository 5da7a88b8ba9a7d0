#!/usr/bin/env python
"""Per-JOB profile of one or more declared queries (round-13 tooling).

The multi-second extras at gate SF are chains of blocking driver
actions (eager localCheckpoints, bounded collects) — wall time lives
BETWEEN jobs as much as in them. This runs each named query exactly
like bench.py (warm-up pass, then a timed noop-sink pass) with the
Spark event log on (session.py's SPARK_GRAFT_EVENT_LOG_DIR hook), then
prints every job of the timed pass: submit time relative to the query
start, gap since the previous job's end (pure driver time), duration,
stage count and names. That pins each second on a specific job or on
driver-side think time, which explain() alone cannot.

Usage: python scripts/profile_query.py dedup_ngram_jaccard [more...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_events(log_dir: str) -> list[dict]:
    events = []
    for root, _dirs, files in os.walk(log_dir):
        for name in files:
            if name.startswith("appstatus_"):
                continue
            p = os.path.join(root, name)
            with open(p) as fh:
                for line in fh:
                    try:
                        events.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    return events


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py <query> [query...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    log_dir = tempfile.mkdtemp(prefix="spark_events_")
    os.environ["SPARK_GRAFT_EVENT_LOG_DIR"] = log_dir

    from eea_crawler_spark.session import get_spark

    spark = get_spark("profile", data_dir=sf_dir)

    from eea_crawler_spark.plans import QUERIES
    from eea_crawler_spark.sources.tables import cache_tables

    cache_tables(spark, sf_dir, ("documents", "embeddings"))

    windows = {}
    for name in names:
        fn = QUERIES[name]
        # warm-up
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t1 = time.time()
        windows[name] = (t0 * 1000, t1 * 1000)
        print(f"== {name}: wall {t1 - t0:.3f}s", flush=True)
    spark.stop()

    events = _read_events(log_dir)
    jobs: dict[int, dict] = {}
    for ev in events:
        if ev.get("Event") == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "start": ev["Submission Time"],
                "stages": len(ev.get("Stage IDs", [])),
                "names": [
                    s.get("Stage Name", "")[:60]
                    for s in ev.get("Stage Infos", [])
                ],
            }
        elif ev.get("Event") == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]

    for name, (w0, w1) in windows.items():
        print(f"\n=== {name} (timed pass, wall {(w1 - w0) / 1000:.3f}s) ===")
        sel = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if "end" in j and j["start"] >= w0 - 50 and j["start"] <= w1 + 50
        ]
        prev_end = w0
        for jid, j in sel:
            gap = (j["start"] - prev_end) / 1000
            dur = (j["end"] - j["start"]) / 1000
            rel = (j["start"] - w0) / 1000
            print(
                f"  job {jid:3d} @+{rel:7.3f}s gap {gap:6.3f}s "
                f"dur {dur:6.3f}s stages {j['stages']:2d} "
                f"{'; '.join(dict.fromkeys(j['names']))[:110]}"
            )
            prev_end = j["end"]
        print(f"  tail gap {(w1 - prev_end) / 1000:6.3f}s")


if __name__ == "__main__":
    main()
