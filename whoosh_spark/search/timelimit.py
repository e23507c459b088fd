"""Time-limited search (reference collectors.py:1006-1100
TimeLimitCollector): abort a search that exceeds a wall-clock budget.

The reference arms a threading.Timer that flips an abort flag the matcher
loop polls. The Spark-idiomatic equivalent cancels the query's JOB GROUP:
the collect runs in a worker thread under a dedicated group id; on timeout
the driver cancels the group, every stage of that query dies cluster-wide,
and TimeLimit raises. ``greedy=True`` returns whatever rows a PARTIAL
pre-timeout collect produced (the reference's greedy mode returns matches
collected so far) — here that is the deepest completed limit-doubling
prefix of the search, collected incrementally.
"""

from __future__ import annotations

import threading
import uuid


class TimeLimit(Exception):
    """Raised when a time-limited search exceeds its budget."""


def search_with_timelimit(searcher, q, timelimit: float, limit: int | None = 10,
                          greedy: bool = False, **kw) -> list:
    """Run ``searcher.search(q, limit=limit, **kw)`` with a wall-clock
    budget, returning collected rows. Raises TimeLimit when the budget is
    exceeded — unless ``greedy``, which then returns the rows of the last
    completed partial search (possibly [])."""
    spark = searcher.index.spark
    sc = spark.sparkContext
    group = f"timelimit-{uuid.uuid4().hex[:12]}"
    done = threading.Event()
    result: dict = {"rows": None, "error": None, "partial": []}

    def run():
        try:
            sc.setJobGroup(group, "time-limited search", interruptOnCancel=True)
            if greedy and limit is not None:
                # limit-doubling prefix searches: each completed rung is a
                # valid partial result to hand back on timeout
                k = max(1, limit // 4)
                while k < limit:
                    result["partial"] = searcher.search(q, limit=k, **kw).collect()
                    k *= 2
            result["rows"] = searcher.search(q, limit=limit, **kw).collect()
        except Exception as e:  # cancellation surfaces as a Py4J job error
            result["error"] = e
        finally:
            done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    finished = done.wait(timeout=timelimit)
    if not finished:
        sc.cancelJobGroup(group)
        done.wait(timeout=30)  # let the cancellation unwind
        if result["rows"] is not None:
            return result["rows"]  # finished in the cancellation window
        if greedy:
            return result["partial"]
        raise TimeLimit(f"search exceeded {timelimit}s")
    if result["error"] is not None:
        raise result["error"]
    return result["rows"]
