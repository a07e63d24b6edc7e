"""Structured Streaming operators (engine extras — SURVEY.md §2.11).

The reference is batch-only; its incremental behaviors (negative cache,
resumable import) map to the checkpoint manifest in ``engine.py``.  For
true stream processing the engine exposes watermarked tumbling-window
aggregation and gap-based session windows over an events stream, plus a
file-source factory so the same parquet layout works batch or
streaming.  All state handling is Spark-native (``window`` /
``session_window`` + watermark): no custom Python state in the hot
path.

At scale: the file source incrementally lists new files per
micro-batch; watermarks bound the state store; ``availableNow`` gives
exactly-once backfill over existing data with the same code path as the
live stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: schema of the events table (TESTDATA.md) for the streaming source —
#: streaming file sources cannot infer schemas
EVENTS_SCHEMA = (
    "event_id long, user_id long, event_type string, ts timestamp_ntz, "
    "value double"
)


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming scan of an events parquet directory."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(events_dir)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event type with late-data watermark.

    Works on both batch and streaming DataFrames (same plan; streaming
    adds state eviction at the watermark).
    """
    ts = F.col("ts").cast("timestamp")
    return (
        events.withColumn("ts", ts)
        .withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def geocell_event_counts(
    events: DataFrame,
    level: int = 8,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Windowed per-geocell event counts: the streaming face of the
    S2-style cell index (queries.geocell_assign) — each event row is
    cell-encoded by the same Catalyst-only Hilbert chain (stateless
    projections, so it runs unchanged under Structured Streaming) and
    aggregated per (tumbling window, cell).  This is the live-ingest
    shape of the north rule's "assign every row via the cell index":
    watermark bounds the state store, and the (window, cell) key is
    what a 10^12-row firehose shards its state on."""
    from .queries import _with_geocell

    ts = F.col("ts").cast("timestamp")
    pts = events.withColumn("ts", ts).select(
        "ts",
        "value",
        (F.lit(-179.5) + (F.col("event_id") % 359)).alias("lon"),
        (F.lit(-89.5) + (F.col("user_id") % 179)).alias("lat"),
    )
    cells = _with_geocell(pts, level, keep=["ts", "value"])
    return (
        cells.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), "cell_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "cell_id",
            "n_events",
            "sum_value",
        )
    )


def _pip_parity_col(lon, lat, verts):
    """Crossing-number parity as ONE stateless Catalyst expression (the
    same arithmetic as geometry.points_in_polygon, unrolled over the
    polygon's literal vertices) — no join, no aggregation, so it runs
    unchanged under Structured Streaming."""
    total = F.lit(0)
    j = len(verts) - 1
    for i in range(len(verts)):
        xi, yi = verts[i]
        xj, yj = verts[j]
        j = i
        if yj == yi:
            # horizontal edge: the straddle conjunct is identically
            # false, and emitting the term would plant a literal
            # divide-by-zero in the plan whose safety depended on
            # And's evaluation order under ANSI mode — skip it at
            # plan-build time instead (vertices are Python literals)
            continue
        crosses = ((F.lit(yi) > lat) != (F.lit(yj) > lat)) & (
            lon
            < (F.lit(xj) - F.lit(xi)) * (lat - F.lit(yi))
            / (F.lit(yj) - F.lit(yi))
            + F.lit(xi)
        )
        total = total + F.when(crosses, 1).otherwise(0)
    return total % 2 == 1


def polygon_event_counts(
    events: DataFrame,
    polys: list | None = None,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Windowed per-polygon event counts: streaming points-in-polygons.

    Each event row evaluates the crossing-number test against every
    (static, broadcast-literal) polygon as a stateless projection —
    vertices are plain Python floats unrolled into the expression, the
    streaming twin of ``queries.q_geo_points_in_polygons``'s edge-join
    parity.  The ONLY stateful operator is the final watermarked
    (window, polygon) count, so state is bounded by polygons × open
    windows regardless of stream volume.  Points derive in-world the
    way ``geo_point_elevation`` derives them.
    """
    if polys is None:
        from .zonal import zonal_demo_polygons

        polys = zonal_demo_polygons()
    from .queries import pelev_lonlat_cols

    ts = F.col("ts").cast("timestamp")
    lon, lat = pelev_lonlat_cols()
    pts = events.select(
        ts.alias("ts"), "value", lon.alias("lon"), lat.alias("lat")
    )
    hit_cols = [
        F.when(
            _pip_parity_col(F.col("lon"), F.col("lat"), verts), F.lit(pid)
        ).cast("int")
        for pid, verts in polys
    ]
    hits = pts.select(
        "ts", "value", F.explode(F.array(*hit_cols)).alias("poly_id")
    ).where(F.col("poly_id").isNotNull())
    return (
        hits.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), "poly_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "poly_id",
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per user (the streaming twin of the
    batch ``events_sessionize`` contract query)."""
    ts = F.col("ts").cast("timestamp")
    return (
        events.withColumn("ts", ts)
        .withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


USER_STATS_SCHEMA = (
    "user_id long, n_events long, sum_value double, max_value double"
)
_USER_STATE_SCHEMA = "n long, s double, m double"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum, max) over ``value``, emitting the updated
    aggregate every micro-batch.

    This is the escape hatch for stateful logic the built-in
    window/session operators can't express; state is one tiny tuple per
    user, managed by Spark's state store (checkpointed, exactly-once).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            if len(pdf):
                m = max(m, float(pdf["value"].max()))
        state.update((n, s, m))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "max_value": [m],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_USER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: input schema of the images table (BASELINE.json input_hint) for the
#: streaming file source
IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)

ASSEMBLED_STREAM_SCHEMA = (
    "tile_x int, tile_y int, heights binary, n_blocks int"
)
_TILE_STATE_SCHEMA = (
    "done boolean, bxs array<int>, bys array<int>, ids array<string>, "
    "fmts array<string>, ws array<int>, hs array<int>, blobs array<binary>"
)


def read_images_stream(
    spark: SparkSession, images_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming scan of an images parquet directory (incremental ingest
    of the input-hint table — the streaming twin of the reference's bulk
    ``import`` command, ImportSrtmTilesCommand.fs:103-130)."""
    reader = spark.readStream.schema(IMAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(images_dir)


def streaming_assemble_tiles(images: DataFrame, tile_size: int) -> DataFrame:
    """Custom stateful streaming operator: blocks stream in (in any
    order, across any number of micro-batches), each tile's blocks
    buffer in the state store, and the tile is emitted exactly once the
    moment every block position is covered.

    This is the streaming re-expression of the mosaic join (SURVEY.md
    §2.3 J2) — the batch engine's ``assemble_tiles`` needs all blocks
    of a tile in one task; here Spark's state store provides the
    cross-batch buffer, checkpointed and exactly-once.  The assembled
    heights are byte-identical to the batch path: the same
    ``(by, bx, image_id)`` overwrite order replays once the tile
    completes (§4.3 merge semantics).  Late duplicates arriving after
    completion are dropped (the reference's negative-cache/idempotent
    import semantics); per-tile state is a few compressed blocks,
    bounded by tile size, and clears to a tombstone on emit.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .engine import parse_caption, _decode_block
    from .tiles import DEM_HEIGHT_NONE

    def update(key, pdfs, state: GroupState):
        if state.exists:
            done, bxs, bys, ids, fmts, ws, hs, blobs = state.get
            bxs, bys, ids = list(bxs), list(bys), list(ids)
            fmts, ws, hs, blobs = list(fmts), list(ws), list(hs), list(blobs)
        else:
            done, bxs, bys, ids, fmts, ws, hs, blobs = (
                False, [], [], [], [], [], [], []
            )
        if done:  # tombstone: tile already emitted, drop late duplicates
            return
        for pdf in pdfs:
            bxs.extend(int(v) for v in pdf["bx"])
            bys.extend(int(v) for v in pdf["by"])
            ids.extend(str(v) for v in pdf["image_id"])
            fmts.extend(str(v) for v in pdf["fmt"])
            ws.extend(int(v) for v in pdf["w"])
            hs.extend(int(v) for v in pdf["h"])
            blobs.extend(bytes(v) for v in pdf["bytes"])
        if not ws:
            return
        expected = (tile_size // ws[0]) * (tile_size // hs[0])
        if len(set(zip(bxs, bys))) < expected:  # still incomplete: buffer
            state.update((False, bxs, bys, ids, fmts, ws, hs, blobs))
            return
        tile = np.full((tile_size, tile_size), DEM_HEIGHT_NONE, dtype=np.int16)
        order = sorted(range(len(ids)), key=lambda i: (bys[i], bxs[i], ids[i]))
        for i in order:
            block = _decode_block(fmts[i], blobs[i], ws[i])
            y0, x0 = bys[i] * hs[i], bxs[i] * ws[i]
            tile[y0 : y0 + hs[i], x0 : x0 + ws[i]] = block
        state.update((True, [], [], [], [], [], [], []))
        yield pd.DataFrame(
            {
                "tile_x": [int(key[0])],
                "tile_y": [int(key[1])],
                "heights": [tile.tobytes()],
                "n_blocks": [len(order)],
            }
        )

    assigned = parse_caption(images)
    return assigned.groupBy("tile_x", "tile_y").applyInPandasWithState(
        update,
        outputStructType=ASSEMBLED_STREAM_SCHEMA,
        stateStructType=_TILE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SHADED_STREAM_SCHEMA = (
    "tile_x int, tile_y int, tile_name string, png binary, "
    "shaded_px long, total_px long, n_blocks int"
)
_SHADE_STATE_SCHEMA = (
    "done boolean, parts array<string>, bxs array<int>, bys array<int>, "
    "ids array<string>, fmts array<string>, ws array<int>, hs array<int>, "
    "blobs array<binary>"
)


def streaming_hillshade(
    images: DataFrame,
    tile_size: int,
    world_bounds: tuple[int, int, int, int],
    script: str = "elecolor|+igor",
    clip_polygon=None,
    prefilter: str | None = None,
    png_level: int | None = None,
) -> DataFrame:
    """Streaming twin of the fused batch topology: incremental
    hillshade with cross-batch halo exchange, one stateful operator.

    A narrow ``mapInPandas`` turns each micro-batch of image rows into
    the same destination-keyed parts stream as the batch
    :func:`demeton_spark.engine.hillshade_parts` (raw blocks + 1-px
    strips cut from border blocks).  One ``applyInPandasWithState``
    keyed by destination tile buffers parts across micro-batches and
    shades the tile EXACTLY ONCE when both its own block grid and every
    halo strip an existing neighbor will ever send are present —
    ``world_bounds`` (min tile_x, min tile_y, max tile_x, max tile_y,
    inclusive) makes completeness decidable without timeouts, the
    streaming analogue of the reference's known tile list
    (ShadeCommand.fs:371-400).  Output pixels are byte-identical to the
    batch pipeline (tested); late duplicates after emission drop
    (idempotent-import semantics, §2.11).  ``clip_polygon`` and
    ``prefilter`` behave as in the batch run_hillshade: clipped-out
    destination tiles are filtered from the parts stream (state never
    accumulates for them) and prefilters widen the buffered strips to
    k px.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .engine import (
        _BLOCK_STRIP_SPEC,
        _decode_block,
        _place_strip,
        _tile_name,
        shade_padded_block,
    )
    from .pipeline import parse_script
    from .tiles import DEM_HEIGHT_NONE

    steps = parse_script(script)
    from .pipeline import SHADER_REGISTRY

    registry = dict(SHADER_REGISTRY)  # driver snapshot for executors
    from . import codec as _codec
    lvl = _codec.RGBA_PNG_LEVEL if png_level is None else png_level
    pre_steps = parse_script(prefilter) if prefilter else []
    halo = 1 + len(pre_steps)
    clip_poly = None
    if clip_polygon is not None:
        clip_poly = np.asarray(clip_polygon, dtype=np.float64)
        # validate before any work is scheduled: a self-intersecting clip
        # polygon would silently mis-clip under the crossing-number rule
        # (PolygonSelfIntersection.fs sweep semantics)
        from .geometry import polygon_self_intersects

        status = polygon_self_intersects(clip_poly)
        if status != "non_intersecting":
            raise ValueError(f"clip_polygon rejected: {status}")
    wx0, wy0, wx1, wy1 = world_bounds  # sender existence universe
    tx0, ty0, tx1, ty1 = world_bounds  # destination (kept-tile) universe
    if clip_poly is not None:
        import math as _math

        # destinations shrink to the polygon's bbox cover (state never
        # accumulates for clipped-out tiles) but SENDERS keep the full
        # world bounds: a tile just outside the clip cover still donates
        # halo strips to kept boundary tiles, exactly like the batch
        # path's destination-only filter — completeness must wait for
        # those strips or boundary pixels would shade nondeterministically
        tx0 = max(tx0, int(_math.floor(clip_poly[:, 0].min())))
        tx1 = min(tx1, int(_math.ceil(clip_poly[:, 0].max())) - 1)
        ty0 = max(ty0, int(_math.floor(clip_poly[:, 1].min())))
        ty1 = min(ty1, int(_math.ceil(clip_poly[:, 1].max())) - 1)

    def emit_parts(batches):
        cols = ("tile_x", "tile_y", "part", "bx", "by", "image_id",
                "w", "h", "fmt", "data")
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}

            def push(tx, ty, part, bx, by, iid, w, h, fmt, data):
                out["tile_x"].append(tx)
                out["tile_y"].append(ty)
                out["part"].append(part)
                out["bx"].append(bx)
                out["by"].append(by)
                out["image_id"].append(iid)
                out["w"].append(w)
                out["h"].append(h)
                out["fmt"].append(fmt)
                out["data"].append(data)

            for r in pdf.itertuples():
                w, h, bx, by = int(r.w), int(r.h), int(r.bx), int(r.by)
                if tx0 <= int(r.tile_x) <= tx1 and ty0 <= int(r.tile_y) <= ty1:
                    push(int(r.tile_x), int(r.tile_y), "B", bx, by,
                         str(r.image_id), w, h, str(r.fmt), bytes(r.bytes))
                nx, ny = tile_size // w, tile_size // h
                block = None
                for on_edge, (dx, dy), part, cut in _BLOCK_STRIP_SPEC:
                    if not on_edge(bx, by, nx, ny):
                        continue
                    dtx, dty = int(r.tile_x) + dx, int(r.tile_y) + dy
                    if not (tx0 <= dtx <= tx1 and ty0 <= dty <= ty1):
                        continue  # strips past the world/clip edge
                    if block is None:
                        block = _decode_block(str(r.fmt), bytes(r.bytes), w)
                    push(dtx, dty, part, bx, by, str(r.image_id), w, h,
                         "raw",
                         np.ascontiguousarray(cut(block, halo)).tobytes())
            yield pd.DataFrame(out)

    from .engine import parse_caption

    parts = parse_caption(images).mapInPandas(
        emit_parts,
        schema=("tile_x int, tile_y int, part string, bx int, by int, "
                "image_id string, w int, h int, fmt string, data binary"),
    )

    def expected_strips(tx: int, ty: int, nx: int, ny: int) -> set:
        """(part, bx, by) triples this tile will eventually receive,
        given which neighbors exist inside world_bounds."""
        exp = set()
        for on_edge, (dx, dy), part, _cut in _BLOCK_STRIP_SPEC:
            # sender is the neighbor at (tx-dx, ty-dy); existence is
            # judged against the WORLD bounds, not the clip cover
            sx, sy = tx - dx, ty - dy
            if not (wx0 <= sx <= wx1 and wy0 <= sy <= wy1):
                continue
            for by in range(ny):
                for bx in range(nx):
                    if on_edge(bx, by, nx, ny):
                        exp.add((part, bx, by))
        return exp

    def _shade_update(key, pdfs, state: GroupState):
        if state.exists:
            st = state.get
            done = st[0]
            parts_l = list(st[1]); bxs = list(st[2]); bys = list(st[3])
            ids = list(st[4]); fmts = list(st[5])
            ws = list(st[6]); hs = list(st[7]); blobs = list(st[8])
        else:
            done = False
            parts_l, bxs, bys, ids, fmts, ws, hs, blobs = ([] for _ in range(8))
        if done:
            return
        for pdf in pdfs:
            parts_l.extend(str(v) for v in pdf["part"])
            bxs.extend(int(v) for v in pdf["bx"])
            bys.extend(int(v) for v in pdf["by"])
            ids.extend(str(v) for v in pdf["image_id"])
            fmts.extend(str(v) for v in pdf["fmt"])
            ws.extend(int(v) for v in pdf["w"])
            hs.extend(int(v) for v in pdf["h"])
            blobs.extend(bytes(v) for v in pdf["data"])
        if not ws:
            return
        ts = tile_size
        nx, ny = ts // ws[0], ts // hs[0]
        have_blocks = {(bxs[i], bys[i]) for i in range(len(parts_l))
                       if parts_l[i] == "B"}
        have_strips = {(parts_l[i], bxs[i], bys[i])
                       for i in range(len(parts_l)) if parts_l[i] != "B"}
        tx, ty = int(key[0]), int(key[1])
        if (len(have_blocks) < nx * ny
                or not expected_strips(tx, ty, nx, ny) <= have_strips):
            state.update((False, parts_l, bxs, bys, ids, fmts, ws, hs, blobs))
            return
        k = halo
        padded = np.full((ts + 2 * k, ts + 2 * k), DEM_HEIGHT_NONE,
                         dtype=np.int16)
        order = sorted(range(len(parts_l)),
                       key=lambda i: (bys[i], bxs[i], ids[i]))
        n_blocks = 0
        for i in order:
            if parts_l[i] != "B":
                continue
            block = _decode_block(fmts[i], blobs[i], ws[i])
            y0, x0 = k + bys[i] * hs[i], k + bxs[i] * ws[i]
            padded[y0 : y0 + hs[i], x0 : x0 + ws[i]] = block
            n_blocks += 1
        for i in order:
            if parts_l[i] == "B":
                continue
            cells = np.frombuffer(blobs[i], dtype="<i2")
            _place_strip(padded, parts_l[i], cells, bxs[i], bys[i],
                         ws[i], hs[i], ts, k)
        if pre_steps:
            from .engine import apply_prefilters

            padded = apply_prefilters(padded, pre_steps)
        from . import codec

        rgba, shaded = shade_padded_block(padded, tx, ty, ts, steps,
                                          clip_poly=clip_poly,
                                          registry=registry)
        state.update((True, [], [], [], [], [], [], [], []))
        yield pd.DataFrame(
            {
                "tile_x": [tx],
                "tile_y": [ty],
                "tile_name": [_tile_name(0, tx, ty)],
                "png": [codec.encode_rgba_png(rgba, lvl)],
                "shaded_px": [shaded],
                "total_px": [ts * ts],
                "n_blocks": [n_blocks],
            }
        )

    return parts.groupBy("tile_x", "tile_y").applyInPandasWithState(
        _shade_update,
        outputStructType=SHADED_STREAM_SCHEMA,
        stateStructType=_SHADE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drain the stream with ``availableNow`` into an in-memory table and
    return it as a DataFrame (backfill/testing harness; production sinks
    swap ``format``)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def streaming_exact_dedup(images: DataFrame) -> DataFrame:
    """Streaming exact image dedup by the input-hint ``phash`` column:
    the first-seen row per phash passes through, every later duplicate
    drops — across micro-batch boundaries, exactly once, resumable.

    The streaming twin of ``image_phash_dedup``'s keep side (and the
    §2.11 idempotent-import semantics): per-phash state is a single
    tombstone boolean in the state store, so a 10^12-image incremental
    ingest pays O(distinct phashes) state and never re-admits a
    duplicate after restart.  Within one micro-batch the min image_id
    wins (deterministic), so when arrival order respects image_id the
    emitted set equals the batch keep list bit-for-bit.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def dedup(key, pdfs, state: GroupState):
        if state.exists:
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        state.update((True,))
        yield pdf.loc[[pdf["image_id"].idxmin()]]

    return images.groupBy("phash").applyInPandasWithState(
        dedup,
        outputStructType=IMAGES_SCHEMA,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
