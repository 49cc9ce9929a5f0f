"""Time every ``queries()`` entry at a given sf dir (consume the result,
report seconds, slowest first). The perf audit behind the bench's fixed
7-query subset — catches stragglers before the per-round driver does.

Usage: python tools/query_timings.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as E

    times: dict[str, float] = {}
    for name, fn in E.queries().items():
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if hasattr(res, "count") and not isinstance(res, (int, float)):
                res.count()
        except Exception as e:  # noqa: BLE001 — audit must report, not die
            print(f"{name:32s} ERR {type(e).__name__}: {e}", flush=True)
            continue
        times[name] = round(time.time() - t0, 2)
        print(f"{name:32s} {times[name]:8.2f}s", flush=True)

    print(json.dumps(dict(sorted(times.items(), key=lambda kv: -kv[1])), indent=1))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
