#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1).

Usage: python scripts/profile_query.py [--tag before] [--reps 3]
           [--no-plan] name [name ...]

For each registry query: build the DataFrame, write its
``explain("formatted")`` to ``plans/r13/<name>_<tag>.txt``, run the
bench's timed action (``.count()``) ``reps`` times with the bench's
inter-measurement hygiene, and print per-stage wall/cpu from the
AppStatusStore so the expensive stage is visible without a UI.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from datasplash_spark import queries as Q  # noqa: E402
from datasplash_spark.pipeline import PipelineOptions, make_session  # noqa: E402


def _stage_rows(spark):
    gw = spark.sparkContext._gateway
    store = spark._jsparkSession.sparkContext().statusStore()
    empty = gw.jvm.java.util.ArrayList()
    quant = gw.new_array(gw.jvm.double, 0)
    out = {}
    it = store.stageList(empty, False, False, quant, empty).iterator()
    while it.hasNext():
        sd = it.next()
        out[(sd.stageId(), sd.attemptId())] = (
            sd.executorRunTime(),
            sd.executorCpuTime(),
            sd.numCompleteTasks(),
            str(sd.name()),
        )
    return out


def _job_rows(spark):
    """Per-JOB rows from the AppStatusStore (guide §1.2/§5: on
    multi-action pipelines the bench wall is often JOB-COUNT latency,
    not stage work — list every scheduled job with its wall span so
    fusible/removable actions are visible)."""
    store = spark._jsparkSession.sparkContext().statusStore()
    out = {}
    it = store.jobsList(None).iterator()
    while it.hasNext():
        jd = it.next()
        sub = jd.submissionTime()
        end = jd.completionTime()
        t0 = sub.get().getTime() if sub.isDefined() else None
        t1 = end.get().getTime() if end.isDefined() else None
        out[jd.jobId()] = (
            t0,
            t1,
            str(jd.name() or "")[:100],
            jd.numTasks(),
        )
    return out


def _hygiene(spark):
    try:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
    except Exception as e:
        print(f"# cleanup warning: {e}", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default=None, help="plan file suffix (omit to skip)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--jobs", action="store_true",
                    help="print the per-job breakdown of the last rep")
    ap.add_argument("--plan-dir", default="r13",
                    help="plans/<dir> for --tag output")
    args = ap.parse_args()

    spark = make_session(PipelineOptions(
        app_name="profile-query",
        extra_conf={"spark.ui.retainedStages": "512",
                    "spark.ui.retainedJobs": "512"},
    ))
    # same warm-up core as bench.py: JVM codegen + parquet caches +
    # python worker pool, so rep timings sit in the bench's warm band
    warm = spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))
    warm.groupBy("l_returnflag").count().count()
    cpus = spark.sparkContext.defaultParallelism

    def _worker_warm(it):
        import importlib

        import numpy  # noqa: F401
        import pandas  # noqa: F401

        for m in (
            "calendar", "charset", "code", "doctext", "eml", "exif",
            "feeds", "flac", "gifbmp", "jpeg", "latex", "logtext",
            "markdown", "mp3ogg", "mp4", "multimodal", "notebook",
            "office", "pdf", "pdfcrypt", "rtf", "similarity",
            "subtitles", "tabular", "text", "tiff", "web", "wikitext",
        ):
            importlib.import_module(f"datasplash_spark.functions.{m}")
        importlib.import_module("datasplash_spark.objectmode")
        importlib.import_module("datasplash_spark.sources.archives")
        yield from it

    spark.range(0, cpus, 1, cpus).mapInPandas(_worker_warm, "id long").count()

    qs = Q.queries()
    for name in args.names:
        fn = qs[name]
        df = fn(spark, args.sf_dir)
        if args.tag:
            plan_dir = os.path.join(HERE, "plans", args.plan_dir)
            os.makedirs(plan_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        _hygiene(spark)
        walls = []
        for rep in range(args.reps):
            pre = _stage_rows(spark)
            pre_jobs = _job_rows(spark) if args.jobs else {}
            t0 = time.time()
            n = fn(spark, args.sf_dir).count()
            dt = time.time() - t0
            post = _stage_rows(spark)
            if args.jobs and rep == args.reps - 1:
                post_jobs = _job_rows(spark)
                new_jobs = {
                    k: v for k, v in post_jobs.items() if k not in pre_jobs
                }
                base = min(
                    (v[0] for v in new_jobs.values() if v[0]), default=0
                )
                print(f"   {len(new_jobs)} jobs:")
                for jid, (s0, s1, nm, nt) in sorted(new_jobs.items()):
                    off = (s0 - base) / 1e3 if s0 else -1
                    span = (s1 - s0) / 1e3 if s0 and s1 else -1
                    print(
                        f"   job {jid:4d} @+{off:6.2f}s {span:6.3f}s "
                        f"tasks={nt:4d}  {nm}"
                    )
            walls.append(dt)
            cpu = sum(v[1] - pre.get(k, (0, 0, 0, ""))[1]
                      for k, v in post.items()) / 1e9
            run = sum(v[0] - pre.get(k, (0, 0, 0, ""))[0]
                      for k, v in post.items()) / 1e3
            print(f"## {name} rep{rep}: wall={dt:.3f}s jvm_run={run:.2f}s "
                  f"jvm_cpu={cpu:.2f}s rows={n}")
            if rep == args.reps - 1:
                new = {k: v for k, v in post.items()
                       if k not in pre or v[0] != pre[k][0]}
                for (sid, att), (rt, ct, nt, nm) in sorted(
                        new.items(), key=lambda kv: -kv[1][0])[:12]:
                    d_rt = rt - pre.get((sid, att), (0, 0, 0, ""))[0]
                    d_ct = ct - pre.get((sid, att), (0, 0, 0, ""))[1]
                    print(f"   stage {sid}: run={d_rt/1e3:7.2f}s "
                          f"cpu={d_ct/1e9:7.2f}s tasks={nt:4d}  {nm[:90]}")
            _hygiene(spark)
        print(f"# {name}: min_wall={min(walls):.3f}s "
              f"walls={[round(w, 3) for w in walls]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
