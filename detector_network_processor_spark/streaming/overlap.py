"""Overlapped independent terminal writes for foreachBatch increments
(guide §2.6 "overlap independent jobs").

An increment typically ends with two writes that do not depend on each
other (the closed-output write and the carried-state/index write). Run
serially, the second write's whole wall is paid after the first job's
straggler tail has already idled most executor slots. ``run_overlapped``
submits them from a small thread pool so the shorter job back-fills the
freed slots, and joins BOTH futures before returning.

Failure contract (r13, hardened per the r12 advice):

- fail FAST: futures are awaited with ``FIRST_EXCEPTION``; the moment one
  write fails, every sibling's job group is cancelled
  (``cancelJobGroup`` — each callable runs under its own thread-local
  job group) instead of letting a long sibling run to completion before
  the batch can fail;
- every exception still surfaces: after cancellation the remaining
  futures are drained and the FIRST failure is re-raised, so a batch
  never half-succeeds silently;
- replay caveat (explicit, per the r12 advice): concurrent writes mean
  one directory can commit while its sibling fails — exactly like a
  crash between the two sequential writes, but reachable from a plain
  job error too. This is safe ONLY under the replay contract (a re-run
  of the same batch_id overwrites BOTH directories); an operator that
  SKIPS a failed batch instead of replaying it would leave the committed
  directory orphaned (e.g. an index batch whose pairs were never
  emitted). Callers must replay, never skip.
"""

from __future__ import annotations

from concurrent.futures import FIRST_EXCEPTION, ThreadPoolExecutor, wait
from typing import Callable


def run_overlapped(spark, jobs: dict[str, Callable[[], None]]) -> None:
    """Run the independent ``jobs`` (name -> zero-arg write action)
    concurrently; fail fast on the first exception (siblings cancelled via
    their job groups), and re-raise it after all futures settle."""
    sc = spark.sparkContext

    def wrap(name: str, fn: Callable[[], None]):
        def run() -> None:
            # job groups are thread-local: this tags exactly the jobs this
            # write submits, so a sibling failure can cancel them mid-run
            sc.setJobGroup(f"dnp-overlap-{name}", name, interruptOnCancel=True)
            try:
                fn()
            finally:
                sc.setJobGroup(None, None)

        return run

    with ThreadPoolExecutor(max_workers=max(2, len(jobs))) as pool:
        futures = {pool.submit(wrap(n, fn)): n for n, fn in jobs.items()}
        done, not_done = wait(futures, return_when=FIRST_EXCEPTION)
        first_exc = None
        for fut in done:
            exc = fut.exception()
            if exc is not None and first_exc is None:
                first_exc = exc
        if first_exc is not None:
            for fut, name in futures.items():
                if not fut.done():
                    sc.cancelJobGroup(f"dnp-overlap-{name}")
        # drain everything (cancelled jobs fail quickly) so no write is
        # still in flight when the caller proceeds; keep the FIRST failure
        for fut in not_done:
            exc = fut.exception()  # blocks until settled
            if exc is not None and first_exc is None:  # pragma: no cover
                first_exc = exc
        if first_exc is not None:
            raise first_exc
