"""In-Spark per-phase profile of the fused shade UDF at two widths.

Runs the sf0.1 hillshade once at local[8] and once at local[32] with
``DEMETON_PROF_DIR`` set, so every worker appends
(assemble_sec, shade_sec, encode_sec) per tile (engine.shade_unified).
Reading those against ``BENCH/KERNEL_CONCURRENCY.json`` (the same
kernel in bare OS processes) splits the 8→32 efficiency loss into:

  - hardware ceiling  — kernel-only per-tile inflation at 32 procs;
  - Spark cohabitation tax — how much SLOWER the same numpy/zlib code
    runs inside a Python worker that shares the box with the executor
    JVM (shuffle service, Arrow channels, task threads), phase by
    phase;
  - residual harness overhead — wall minus in-UDF time (scheduling,
    Arrow transfer, stage barriers).

Writes BENCH/PHASE_PROFILE.json and prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_width(n: int, images_path: str, spec) -> dict:
    """Spawned as a SUBPROCESS per width: in local mode the Python
    worker daemon inherits the JVM's environment, and the JVM launches
    once per driver process — DEMETON_PROF_DIR must be in the env
    BEFORE the first build_session or workers never see it."""
    from pyspark.sql import functions as F

    from demeton_spark import codec
    from demeton_spark.engine import run_hillshade
    from demeton_spark.session import build_session

    prof_dir = os.environ["DEMETON_PROF_DIR"]
    spark = build_session(master=f"local[{n}]")
    try:
        images = spark.read.parquet(images_path)
        t0 = time.time()
        shaded = run_hillshade(
            spark, images, spec.tile_size, script="elecolor|+igor",
            shade_partitions=spec.n_tiles_x * spec.n_tiles_y,
            png_level=codec.RGBA_PNG_LEVEL_FAST,
        )
        agg = shaded.agg(F.count("*").alias("tiles")).collect()[0]
        wall = time.time() - t0
    finally:
        spark.stop()
    rows = []
    for path in glob.glob(os.path.join(prof_dir, "udf_*.txt")):
        with open(path) as f:
            rows += [[float(x) for x in ln.split()] for ln in f if ln.strip()]
    assem = [r[0] for r in rows]
    shade = [r[1] for r in rows]
    png = [r[2] for r in rows]
    in_udf_total = sum(a + s + p for a, s, p in rows)
    return {
        "tiles": int(agg["tiles"]),
        "wall_sec": round(wall, 3),
        "n_profiled": len(rows),
        "per_tile_assemble_sec": round(statistics.median(assem), 4),
        "per_tile_shade_sec": round(statistics.median(shade), 4),
        "per_tile_encode_sec": round(statistics.median(png), 4),
        "in_udf_task_sec_total": round(in_udf_total, 1),
        # worker-occupancy: in-UDF seconds per wall second, vs n slots
        "udf_concurrency": round(in_udf_total / wall, 2),
    }


def main() -> None:
    import subprocess

    import bench
    from bench import probe_steal

    spec = bench.WORLD_BY_SF[0.1]
    if len(sys.argv) > 1 and sys.argv[1] == "--width":
        # child: one width, DEMETON_PROF_DIR already in env pre-JVM
        n = int(sys.argv[2])
        print(json.dumps(run_width(n, sys.argv[3], spec)))
        return

    steal_before = probe_steal()
    from demeton_spark.session import build_session

    spark = build_session(master="local[32]")
    images_path = bench.ensure_synth_table(spark, spec, 0.1)
    spark.stop()
    widths = {}
    for n in (8, 32):
        prof_dir = tempfile.mkdtemp(prefix=f"demeton_prof_{n}_")
        env = dict(os.environ, DEMETON_PROF_DIR=prof_dir)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--width", str(n),
             images_path],
            env=env, capture_output=True, text=True, timeout=900,
        )
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-2000:])
        widths[str(n)] = json.loads(proc.stdout.strip().splitlines()[-1])
        shutil.rmtree(prof_dir, ignore_errors=True)
    out = {
        "metric": "in-Spark per-phase shade profile at two widths",
        "steal_probe_before": steal_before,
        "widths": widths,
        "steal_probe_after": probe_steal(),
    }
    try:
        with open(os.path.join(REPO, "BENCH", "KERNEL_CONCURRENCY.json")) as f:
            kc = json.load(f)
        out["kernel_only"] = {
            n: {
                "per_tile_shade_sec": kc["levels"][n]["shade_sec"],
                "per_tile_encode_sec": kc["levels"][n]["png_sec"],
            }
            for n in ("8", "32")
        }
        for n in ("8", "32"):
            w, k = out["widths"][n], out["kernel_only"][n]
            out["widths"][n]["spark_tax_shade"] = round(
                w["per_tile_shade_sec"] / k["per_tile_shade_sec"], 2)
            out["widths"][n]["spark_tax_encode"] = round(
                w["per_tile_encode_sec"] / k["per_tile_encode_sec"], 2)
    except OSError:
        pass
    with open(os.path.join(REPO, "BENCH", "PHASE_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
