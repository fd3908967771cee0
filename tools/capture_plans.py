#!/usr/bin/env python
"""Capture ``explain("formatted")`` for registered queries into text files —
the per-round plan evidence (plans/r<N>/<query>_{before,after}.txt).

For queries whose operators cut lineage with eager ``localCheckpoint``
(near-dup, components, converged graph loops), the final plan alone is
truncated at ``Scan ExistingRDD``; this tool patches ``localCheckpoint``
(same interception point as plans/inspect.collect_checkpoint_fingerprints)
to ALSO capture each pre-checkpoint segment's formatted plan, appended
after the final plan so the file shows the full execution story.

Plans are built at the smallest fixture SF by default (plan SHAPE is
data-size-independent; checkpointed operators execute their jobs at
plan-build time, which at bigger SFs would be heavy untimed work).

Usage: python tools/capture_plans.py --out plans/r12 --suffix before [names...]
(default names: bench.py HEADLINE + EXTENDED).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame  # noqa: E402

from detector_network_processor_spark.plans import all_queries  # noqa: E402
from detector_network_processor_spark.session import get_spark, release_cached  # noqa: E402


def _formatted(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    args = sys.argv[1:]

    def opt(flag: str, default: str) -> str:
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    out_dir = Path(opt("--out", "plans/r12"))
    suffix = opt("--suffix", "before")
    sf_dir = opt("--sf-dir", "/root/testdata/sf0.001")

    specs = all_queries()
    if not args:
        import bench

        args = bench.HEADLINE + bench.EXTENDED
    unknown = [n for n in args if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dnp-capture-plans")

    targets: list[type] = [DataFrame]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _Classic

        targets.append(_Classic)
    except ImportError:  # pragma: no cover
        pass
    saved = [
        (cls, cls.__dict__["localCheckpoint"])
        for cls in targets
        if "localCheckpoint" in cls.__dict__
    ]

    for name in args:
        segments: list[str] = []

        def _make_patched(orig):
            def patched(self, *a, **kw):
                try:
                    segments.append(_formatted(self))
                except Exception:
                    pass
                return orig(self, *a, **kw)

            return patched

        for cls, orig in saved:
            cls.localCheckpoint = _make_patched(orig)
        try:
            df = specs[name].fn(spark, sf_dir)
            final = _formatted(df)
        finally:
            for cls, orig in saved:
                cls.localCheckpoint = orig
        parts = [f"== {name} @ {sf_dir} — final plan ==\n", final]
        for i, seg in enumerate(segments, 1):
            parts.append(
                f"\n== checkpointed segment {i}/{len(segments)} "
                f"(pre-checkpoint plan, executed at its localCheckpoint) ==\n"
            )
            parts.append(seg)
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text("".join(parts))
        print(f"wrote {path} ({len(segments)} checkpointed segments)")
        release_cached(spark)

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
