"""The Spark dataflow: image rows → tile assignment → tile assembly →
halo exchange → vectorized shading → PNG tile sink.

This is the idiomatic-Spark re-expression of Demeton's ``shade``
lifecycle (/root/reference/Demeton/Commands/ShadeCommand.fs:555-614),
with the reference's sequential per-tile fold replaced by one task per
tile and its implicit 1-px over-fetch replaced by an explicit halo
exchange (SURVEY.md §2.3 J3):

Production path (ONE full-data shuffle — see SCALE.md):

  1. ``parse_caption``      — pure Column expressions recover the
                              block's tile + block coords from the
                              caption (equi-join key construction, J1).
  2. ``emit_block_strips``  — narrow map over the Catalyst-filtered
                              border blocks cuts the k-px halo slabs
                              each neighbor needs (k = 1 + prefilter
                              steps).
  3. ``hillshade_parts``    — union of raw (still-compressed) blocks
                              and strips, keyed by DESTINATION tile.
  4. ``shade_unified``      — one groupBy(tile).applyInPandas task per
                              tile: stitch (J2, deterministic overwrite
                              order §4.3), pad to (ts+2k)² with
                              DEM_HEIGHT_NONE at world edges
                              (extract-fill, Dem/Funcs.fs:395-416),
                              optional blur/sharpen prefilters, Horn
                              p/q, shading-script evaluation,
                              point-in-polygon clip, Y-flip, RGBA PNG
                              encode (Hillshading.fs:81-157 vectorized).
  5. ``run_hillshade``      — end-to-end with optional resumable
                              checkpointing (anti-join against a
                              per-tile manifest — Srtm/Fetch.fs
                              negative-cache semantics), bbox pruning
                              for clip polygons, 1-tile-per-task
                              shuffle granularity, and pixel-count
                              metrics.

The two-stage topology (``assemble_parts``/``assemble_parts_salted`` →
``shade_parts``) remains for pathological per-tile skew, where salted
partial mosaics need their own exchange; ``assemble_tiles``/
``exchange_halo``/``shade_tiles`` are the unfused building blocks used
by the pyramid/water/streaming paths and tests.

Scale notes: the single wide operation carries source-compressed
blocks plus ~0.1%-sized strips; assembled tiles never re-shuffle.
Skewed (land-heavy) tiles are handled by AQE skew splitting, the
1-tile-per-task granularity, and the salted path for extremes.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codec, kernels, pipeline
from .synth import WorldSpec
from .tiles import (
    DEM_HEIGHT_NONE,
    cells_per_degree,
    tile_name as _tile_name,
)

# ---------------------------------------------------------------------------
# 1. caption → tile assignment (pure Column expressions, J1)
# ---------------------------------------------------------------------------

_CAPTION_PATTERN = r"tile ([NS]\d{2}[EW]\d{3}) block \((\d+),(\d+)\)"


def invalid_caption_rows(images: DataFrame) -> DataFrame:
    """Rows whose caption carries no parseable geo anchor (quarantine).

    At ingest scale a single bad row must not fail the job; route these
    to a dead-letter sink and count them, don't crash (§2.11 negative-
    cache spirit).
    """
    return images.where(~F.col("caption").rlike(_CAPTION_PATTERN))


def parse_caption(images: DataFrame) -> DataFrame:
    """Recover ``(tile_x, tile_y, bx, by)`` from the caption column.

    Inverse of parseHgtTileName (Dem/Funcs.fs:157-188) as Catalyst
    expressions — stays inside whole-stage codegen, no Python.
    Rows with unparseable captions are dropped here; collect them with
    :func:`invalid_caption_rows` first if you need a quarantine sink.
    """
    images = images.where(F.col("caption").rlike(_CAPTION_PATTERN))
    name = F.regexp_extract("caption", _CAPTION_PATTERN, 1)
    lat_sign = F.when(F.substring(name, 1, 1) == "N", 1).otherwise(-1)
    lon_sign = F.when(F.substring(name, 4, 1) == "E", 1).otherwise(-1)
    return (
        images.withColumn("tile_name", name)
        .withColumn("tile_y", (lat_sign * F.substring(name, 2, 2).cast("int")).cast("int"))
        .withColumn("tile_x", (lon_sign * F.substring(name, 5, 3).cast("int")).cast("int"))
        .withColumn(
            "bx", F.regexp_extract("caption", _CAPTION_PATTERN, 2).cast("int")
        )
        .withColumn(
            "by", F.regexp_extract("caption", _CAPTION_PATTERN, 3).cast("int")
        )
    )


# ---------------------------------------------------------------------------
# 2. tile assembly (J2 mosaic)
# ---------------------------------------------------------------------------

ASSEMBLED_SCHEMA = (
    "tile_x int, tile_y int, heights binary, n_blocks int, missing_px long"
)


def _decode_block(fmt: str, payload: bytes, block_size: int) -> np.ndarray:
    if fmt == "png16":
        return codec.decode_heights_png(bytes(payload))
    if fmt == "hgt":
        return codec.decode_hgt(bytes(payload), block_size)
    raise ValueError(f"unknown block format {fmt!r}")


def assemble_tiles(assigned: DataFrame, tile_size: int) -> DataFrame:
    """Stitch image blocks into one int16 raster per tile.

    Later blocks overwrite earlier ones in deterministic ``(by, bx,
    image_id)`` order — Spark group order is nondeterministic, the sort
    re-establishes the reference's merge semantics (Dem/Funcs.fs:357-388,
    §4.3 "merge overwrite order").
    """

    def stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        tile_x = int(pdf["tile_x"].iloc[0])
        tile_y = int(pdf["tile_y"].iloc[0])
        tile = np.full((tile_size, tile_size), DEM_HEIGHT_NONE, dtype=np.int16)
        pdf = pdf.sort_values(["by", "bx", "image_id"])
        for fmt, payload, w, h, bx, by in zip(
            pdf["fmt"], pdf["bytes"], pdf["w"], pdf["h"], pdf["bx"], pdf["by"]
        ):
            block = _decode_block(fmt, payload, int(w))
            y0, x0 = int(by) * int(h), int(bx) * int(w)
            tile[y0 : y0 + int(h), x0 : x0 + int(w)] = block
        missing = int(np.count_nonzero(tile == DEM_HEIGHT_NONE))
        return pd.DataFrame(
            {
                "tile_x": [tile_x],
                "tile_y": [tile_y],
                "heights": [tile.tobytes()],
                "n_blocks": [len(pdf)],
                "missing_px": [missing],
            }
        )

    return assigned.groupBy("tile_x", "tile_y").applyInPandas(
        stitch, schema=ASSEMBLED_SCHEMA
    )


# ---------------------------------------------------------------------------
# 3. halo exchange (J3 — the explicit stencil join)
# ---------------------------------------------------------------------------

HALO_PART_SCHEMA = "tile_x int, tile_y int, part string, data binary"
PADDED_SCHEMA = "tile_x int, tile_y int, padded binary"

#: strip emitted from a tile → (dest offset, part name at destination,
#: k-slab slice of the sender's TILE).  Part names say where the data
#: lands in the receiver's padded array; k = halo width.
_STRIP_SPEC = [
    ((0, 1), "S", lambda t, k: t[-k:, :]),   # my north edge = N nbr's south pad
    ((0, -1), "N", lambda t, k: t[:k, :]),   # my south edge = S nbr's north pad
    ((1, 0), "W", lambda t, k: t[:, -k:]),   # my east edge = E nbr's west pad
    ((-1, 0), "E", lambda t, k: t[:, :k]),   # my west edge = W nbr's east pad
    ((1, 1), "SW", lambda t, k: t[-k:, -k:]),
    ((-1, 1), "SE", lambda t, k: t[-k:, :k]),
    ((1, -1), "NW", lambda t, k: t[:k, -k:]),
    ((-1, -1), "NE", lambda t, k: t[:k, :k]),
]


def exchange_halo(tiles: DataFrame, tile_size: int) -> DataFrame:
    """Pad every tile to (ts+2)² using its 8 neighbors' edge strips.

    One narrow map emits the strips (~4·ts cells per tile, ≈0.1% of the
    tile), one shuffle groups strips with their destination tile.
    Missing neighbors (world edge) pad with DEM_HEIGHT_NONE, matching
    ``extract``'s out-of-bounds fill (Dem/Funcs.fs:395-416).
    """

    def emit_parts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one traversal emits the center AND its 8 strips — a union of two
        # branches over the same upstream would recompute tile assembly
        # twice (Spark does not CSE across union arms)
        for pdf in batches:
            out: dict[str, list] = {"tile_x": [], "tile_y": [], "part": [], "data": []}
            for tx, ty, buf in zip(pdf["tile_x"], pdf["tile_y"], pdf["heights"]):
                out["tile_x"].append(int(tx))
                out["tile_y"].append(int(ty))
                out["part"].append("C")
                out["data"].append(buf)
                tile = np.frombuffer(buf, dtype="<i2").reshape(tile_size, tile_size)
                for (dx, dy), part, cut in _STRIP_SPEC:
                    out["tile_x"].append(int(tx) + dx)
                    out["tile_y"].append(int(ty) + dy)
                    out["part"].append(part)
                    out["data"].append(
                        np.ascontiguousarray(cut(tile, 1)).tobytes()
                    )
            yield pd.DataFrame(out)

    parts_df = tiles.mapInPandas(emit_parts, schema=HALO_PART_SCHEMA)

    def pad(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = dict(zip(pdf["part"], pdf["data"]))
        if "C" not in parts:  # strips sent into empty space (no such tile)
            return pd.DataFrame(columns=["tile_x", "tile_y", "padded"])
        ts = tile_size
        padded = np.full((ts + 2, ts + 2), DEM_HEIGHT_NONE, dtype=np.int16)
        padded[1:-1, 1:-1] = np.frombuffer(parts["C"], dtype="<i2").reshape(ts, ts)

        def strip(name: str, shape: tuple[int, int]) -> np.ndarray | None:
            if name not in parts:
                return None
            return np.frombuffer(parts[name], dtype="<i2").reshape(shape)

        s = strip("S", (1, ts))
        if s is not None:
            padded[0, 1:-1] = s[0]
        n = strip("N", (1, ts))
        if n is not None:
            padded[-1, 1:-1] = n[0]
        w = strip("W", (ts, 1))
        if w is not None:
            padded[1:-1, 0] = w[:, 0]
        e = strip("E", (ts, 1))
        if e is not None:
            padded[1:-1, -1] = e[:, 0]
        for corner, (yy, xx) in [
            ("SW", (0, 0)),
            ("SE", (0, ts + 1)),
            ("NW", (ts + 1, 0)),
            ("NE", (ts + 1, ts + 1)),
        ]:
            c = strip(corner, (1, 1))
            if c is not None:
                padded[yy, xx] = c[0, 0]
        return pd.DataFrame(
            {
                "tile_x": [int(pdf["tile_x"].iloc[0])],
                "tile_y": [int(pdf["tile_y"].iloc[0])],
                "padded": [padded.tobytes()],
            }
        )

    return parts_df.groupBy("tile_x", "tile_y").applyInPandas(
        pad, schema=PADDED_SCHEMA
    )


# ---------------------------------------------------------------------------
# fused two-shuffle pipeline (the production path)
# ---------------------------------------------------------------------------

HALO_PART_LINEAGE_SCHEMA = HALO_PART_SCHEMA + ", n_blocks int"


def _emit_center_and_strips(
    tile: np.ndarray, tile_x: int, tile_y: int, n_blocks: int,
    halo: int = 1,
) -> pd.DataFrame:
    out: dict[str, list] = {"tile_x": [tile_x], "tile_y": [tile_y],
                            "part": ["C"], "data": [tile.tobytes()],
                            "n_blocks": [n_blocks]}
    for (dx, dy), part, cut in _STRIP_SPEC:
        out["tile_x"].append(tile_x + dx)
        out["tile_y"].append(tile_y + dy)
        out["part"].append(part)
        out["data"].append(np.ascontiguousarray(cut(tile, halo)).tobytes())
        out["n_blocks"].append(0)
    return pd.DataFrame(out)


def assemble_parts(assigned: DataFrame, tile_size: int) -> DataFrame:
    """Fused stage A: blocks → stitched tile, emitted as its center row
    plus the 8 edge strips keyed by the neighbors that need them.

    One shuffle (blocks → tile) and one Python pass replace the separate
    assemble + strip-emission stages: tile-sized blobs cross the Arrow
    boundary once instead of twice.  The center row carries ``n_blocks``
    (input-row lineage surfaced into the shaded output).
    """

    def stitch_and_split(pdf: pd.DataFrame) -> pd.DataFrame:
        tile_x = int(pdf["tile_x"].iloc[0])
        tile_y = int(pdf["tile_y"].iloc[0])
        tile = np.full((tile_size, tile_size), DEM_HEIGHT_NONE, dtype=np.int16)
        pdf = pdf.sort_values(["by", "bx", "image_id"])
        for fmt, payload, w, h, bx, by in zip(
            pdf["fmt"], pdf["bytes"], pdf["w"], pdf["h"], pdf["bx"], pdf["by"]
        ):
            block = _decode_block(fmt, payload, int(w))
            y0, x0 = int(by) * int(h), int(bx) * int(w)
            tile[y0 : y0 + int(h), x0 : x0 + int(w)] = block
        return _emit_center_and_strips(tile, tile_x, tile_y, len(pdf))

    return assigned.groupBy("tile_x", "tile_y").applyInPandas(
        stitch_and_split, schema=HALO_PART_LINEAGE_SCHEMA
    )


def assemble_parts_salted(
    assigned: DataFrame, tile_size: int, salt_buckets: int,
    halo: int = 1,
) -> DataFrame:
    """Salted two-phase assembly for skewed tiles (SURVEY.md §7.4 risk 3;
    the north-rule "salted repartitioning handles land/ocean tile skew").

    Heavy tiles (duplicate-dense "land" tiles — the synthetic skew knob
    makes some tiles 8× denser) turn the single groupBy(tile) task into a
    straggler.  Salting by BLOCK POSITION splits one hot tile across
    ``salt_buckets`` tasks:

      stage 1: groupBy(tile, salt) with salt = (by·bpts + bx) % buckets —
               all duplicates of one block position share a salt, so the
               deterministic (by, bx, image_id) overwrite order is
               preserved within the only group that writes that position;
      stage 2: groupBy(tile) merges the partial mosaics — positions are
               disjoint across salts by construction, so the merge is
               order-free row copying, and the partial payload per task
               is ~1/buckets of the tile.

    Identical output to :func:`assemble_parts` (tested), at the cost of
    one extra narrow shuffle of tile-sized partials — worth it only for
    genuinely skewed inputs; AQE skew-split handles mild skew upstream.
    """
    bpts = None  # inferred per group from block size

    salted = assigned.withColumn(
        "salt",
        F.pmod(
            F.col("by") * F.lit(10_000) + F.col("bx"), F.lit(salt_buckets)
        ).cast("int"),
    )

    partial_schema = (
        "tile_x int, tile_y int, salt int, partial binary, n_blocks int"
    )

    def partial_stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        tile = np.full((tile_size, tile_size), DEM_HEIGHT_NONE, dtype=np.int16)
        pdf = pdf.sort_values(["by", "bx", "image_id"])
        for fmt, payload, w, h, bx, by in zip(
            pdf["fmt"], pdf["bytes"], pdf["w"], pdf["h"], pdf["bx"], pdf["by"]
        ):
            block = _decode_block(fmt, payload, int(w))
            y0, x0 = int(by) * int(h), int(bx) * int(w)
            tile[y0 : y0 + int(h), x0 : x0 + int(w)] = block
        return pd.DataFrame(
            {
                "tile_x": [int(pdf["tile_x"].iloc[0])],
                "tile_y": [int(pdf["tile_y"].iloc[0])],
                "salt": [int(pdf["salt"].iloc[0])],
                "partial": [tile.tobytes()],
                "n_blocks": [len(pdf)],
            }
        )

    partials = salted.groupBy("tile_x", "tile_y", "salt").applyInPandas(
        partial_stitch, schema=partial_schema
    )

    def merge_partials(pdf: pd.DataFrame) -> pd.DataFrame:
        tile = np.full((tile_size, tile_size), DEM_HEIGHT_NONE, dtype=np.int16)
        n_blocks = 0
        for buf, nb in zip(pdf["partial"], pdf["n_blocks"]):
            part = np.frombuffer(buf, dtype="<i2").reshape(tile_size, tile_size)
            # positions are disjoint across salts: copy where the partial
            # wrote anything — a position covered with an all-NONE block
            # is indistinguishable from uncovered, which is safe because
            # the base canvas is also NONE (identical result either way)
            written = part != DEM_HEIGHT_NONE
            tile[written] = part[written]
            n_blocks += int(nb)
        return _emit_center_and_strips(
            tile, int(pdf["tile_x"].iloc[0]), int(pdf["tile_y"].iloc[0]),
            n_blocks, halo,
        )

    return partials.groupBy("tile_x", "tile_y").applyInPandas(
        merge_partials, schema=HALO_PART_LINEAGE_SCHEMA
    )


def shade_parts(
    parts: DataFrame, tile_size: int, script: str,
    clip_poly: np.ndarray | None = None,
    halo: int = 1,
    prefilter: str | None = None,
    png_level: int | None = None,
) -> DataFrame:
    """Fused stage B: halo-pad + optional prefilters + Horn + shaders +
    PNG encode in one applyInPandas (one shuffle keyed by destination
    tile).  ``halo`` must be 1 + number of prefilter steps."""
    steps = pipeline.parse_script(script)
    registry = dict(pipeline.SHADER_REGISTRY)  # snapshot: custom shaders
    # registered on the driver ride the closure to executor processes
    lvl = codec.RGBA_PNG_LEVEL if png_level is None else png_level
    pre_steps = pipeline.parse_script(prefilter) if prefilter else []
    if halo != 1 + len(pre_steps):
        raise ValueError(
            f"halo {halo} must be 1 + number of prefilter steps "
            f"({len(pre_steps)})"
        )

    def pad_and_shade(pdf: pd.DataFrame) -> pd.DataFrame:
        parts_map = dict(zip(pdf["part"], pdf["data"]))
        if "C" not in parts_map:
            return pd.DataFrame(
                columns=["tile_x", "tile_y", "tile_name", "width", "height",
                         "png", "shaded_px", "total_px", "n_blocks"]
            )
        ts = tile_size
        tile_x = int(pdf["tile_x"].iloc[0])
        tile_y = int(pdf["tile_y"].iloc[0])
        # lineage: input-row count travels on the center part row
        n_blocks = (
            int(pdf.loc[pdf["part"] == "C", "n_blocks"].iloc[0])
            if "n_blocks" in pdf.columns
            else 0
        )
        padded = _pad_from_parts(parts_map, ts, halo=halo)
        if pre_steps:
            padded = apply_prefilters(padded, pre_steps)
        rgba, shaded = shade_padded_block(
            padded, tile_x, tile_y, ts, steps, clip_poly=clip_poly,
            registry=registry,
        )
        return pd.DataFrame(
            {
                "tile_x": [tile_x],
                "tile_y": [tile_y],
                "tile_name": [_tile_name(0, tile_x, tile_y)],
                "width": [ts],
                "height": [ts],
                "png": [codec.encode_rgba_png(rgba, lvl)],
                "shaded_px": [shaded],
                "total_px": [ts * ts],
                "n_blocks": [n_blocks],
            }
        )

    return parts.groupBy("tile_x", "tile_y").applyInPandas(
        pad_and_shade, schema=SHADED_SCHEMA
    )


def _pad_from_parts(
    parts_map: dict, ts: int, fill: int = DEM_HEIGHT_NONE, halo: int = 1
) -> np.ndarray:
    """Assemble the (ts+2k)² halo-padded block from center + k-slab
    strip parts.

    ``fill`` is the missing-neighbor value: DEM_HEIGHT_NONE for plain
    height tiles, 0 for XTH-packed tiles (offset 0 decodes to missing
    and carries no water bit)."""
    k = halo
    padded = np.full((ts + 2 * k, ts + 2 * k), fill, dtype=np.int16)
    padded[k:-k, k:-k] = np.frombuffer(
        parts_map["C"], dtype="<i2"
    ).reshape(ts, ts)
    mid = slice(k, ts + k)
    hi = slice(ts + k, ts + 2 * k)
    lo = slice(0, k)
    edges = [
        ("S", (k, ts), (lo, mid)),
        ("N", (k, ts), (hi, mid)),
        ("W", (ts, k), (mid, lo)),
        ("E", (ts, k), (mid, hi)),
        ("SW", (k, k), (lo, lo)),
        ("SE", (k, k), (lo, hi)),
        ("NW", (k, k), (hi, lo)),
        ("NE", (k, k), (hi, hi)),
    ]
    for name, shape, (ys, xs) in edges:
        if name in parts_map:
            padded[ys, xs] = np.frombuffer(
                parts_map[name], dtype="<i2"
            ).reshape(shape)
    return padded


# ---------------------------------------------------------------------------
# single-shuffle fused pipeline (the production path)
# ---------------------------------------------------------------------------
#
# assemble_parts → shade_parts moves every assembled tile (uncompressed
# int16, ~26 MB at 3600²) through a second exchange + two extra Arrow
# crossings.  The fused topology below cuts the halo strips from the
# EDGE BLOCKS before any shuffle (narrow map over ~the border fraction
# of input rows), unions them with the raw block stream, and lets ONE
# groupBy(destination tile) bring together everything a tile needs:
# its own blocks (still source-compressed) plus its neighbors' 1-px
# edge contributions.  Assembly, halo padding, shading and PNG encode
# then run in a single task — one full-data shuffle end-to-end, and
# the bytes that cross it stay compressed.

UNIFIED_PART_SCHEMA = (
    "tile_x int, tile_y int, part string, bx int, by int, image_id string, "
    "w int, h int, fmt string, data binary"
)

#: (edge predicate, dest offset, part name, cut of the decoded block
#: given halo width k) — block-level version of _STRIP_SPEC: a block on
#: its tile's border contributes the k-px slab the neighbor needs for
#: halo padding (k=1 for plain Horn; k=2 when a prefilter consumes a
#: ring first — Roadmap.md low/high-pass filters).
_BLOCK_STRIP_SPEC = [
    (lambda bx, by, nx, ny: by == ny - 1, (0, 1), "S",
     lambda b, k: b[-k:, :]),
    (lambda bx, by, nx, ny: by == 0, (0, -1), "N", lambda b, k: b[:k, :]),
    (lambda bx, by, nx, ny: bx == nx - 1, (1, 0), "W",
     lambda b, k: b[:, -k:]),
    (lambda bx, by, nx, ny: bx == 0, (-1, 0), "E", lambda b, k: b[:, :k]),
    (lambda bx, by, nx, ny: bx == nx - 1 and by == ny - 1, (1, 1), "SW",
     lambda b, k: b[-k:, -k:]),
    (lambda bx, by, nx, ny: bx == 0 and by == ny - 1, (-1, 1), "SE",
     lambda b, k: b[-k:, :k]),
    (lambda bx, by, nx, ny: bx == nx - 1 and by == 0, (1, -1), "NW",
     lambda b, k: b[:k, -k:]),
    (lambda bx, by, nx, ny: bx == 0 and by == 0, (-1, -1), "NE",
     lambda b, k: b[:k, :k]),
]


def emit_block_strips(
    assigned: DataFrame, tile_size: int, halo: int = 1
) -> DataFrame:
    """Narrow stage: border blocks → 1-px strip rows keyed by the
    neighbor tile that needs them (fmt='raw', int16 LE cells).

    The Catalyst filter keeps interior blocks out of the Python worker
    entirely; only the border fraction of the input is decoded twice.
    Strip rows keep the sender's ``(by, bx, image_id)`` so the receiver
    can replay the deterministic overwrite order (§4.3).
    """
    edge = assigned.where(
        (F.col("bx") == 0)
        | (F.col("by") == 0)
        | ((F.col("bx") + 1) * F.col("w") >= tile_size)
        | ((F.col("by") + 1) * F.col("h") >= tile_size)
    )

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("tile_x", "tile_y", "part", "bx", "by", "image_id",
                "w", "h", "fmt", "data")
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for tx, ty, iid, fmt, payload, w, h, bx, by in zip(
                pdf["tile_x"], pdf["tile_y"], pdf["image_id"], pdf["fmt"],
                pdf["bytes"], pdf["w"], pdf["h"], pdf["bx"], pdf["by"],
            ):
                w, h, bx, by = int(w), int(h), int(bx), int(by)
                if halo > min(w, h):
                    raise ValueError(
                        f"halo {halo} exceeds block size {w}x{h}"
                    )
                nx, ny = tile_size // w, tile_size // h
                block = None
                for on_edge, (dx, dy), part, strip_cut in _BLOCK_STRIP_SPEC:
                    if not on_edge(bx, by, nx, ny):
                        continue
                    if block is None:
                        block = _decode_block(fmt, payload, w)
                    out["tile_x"].append(int(tx) + dx)
                    out["tile_y"].append(int(ty) + dy)
                    out["part"].append(part)
                    out["bx"].append(bx)
                    out["by"].append(by)
                    out["image_id"].append(iid)
                    out["w"].append(w)
                    out["h"].append(h)
                    out["fmt"].append("raw")
                    out["data"].append(
                        np.ascontiguousarray(strip_cut(block, halo)).tobytes()
                    )
            yield pd.DataFrame(out)

    return edge.mapInPandas(cut, schema=UNIFIED_PART_SCHEMA)


def dedup_duplicate_blocks(assigned: DataFrame) -> DataFrame:
    """Pre-shuffle duplicate collapse: within each Arrow batch keep only
    the max-``image_id`` row per (tile_x, tile_y, bx, by).

    Purely local — no shuffle, no global aggregation — so the
    overwrite-order winner (max image_id, the same rule the
    post-shuffle winner-only decode applies) always survives, and the
    pipeline output stays byte-identical.  Enable via
    ``run_hillshade(local_dedup=True)`` when the source carries heavy
    duplicate-block skew: losing payloads then never cross the wire
    (the SCALE.md caveat), at the cost of one Arrow pass over the
    input — a win whenever the duplication ratio beats ~1.5×.
    """
    schema = assigned.schema

    def dedup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            idx = pdf.groupby(["tile_x", "tile_y", "bx", "by"])[
                "image_id"
            ].idxmax()
            yield pdf.loc[np.sort(idx.to_numpy())]

    return assigned.mapInPandas(dedup, schema=schema)


def hillshade_parts(
    assigned: DataFrame, tile_size: int, halo: int = 1
) -> DataFrame:
    """Blocks + their neighbors' strip contributions, keyed by the
    destination tile — the single-shuffle input of :func:`shade_unified`."""
    blocks = assigned.select(
        "tile_x", "tile_y", F.lit("B").alias("part"), "bx", "by",
        "image_id", "w", "h", "fmt", F.col("bytes").alias("data"),
    )
    return blocks.unionByName(emit_block_strips(assigned, tile_size, halo))


#: placement of a received strip slab into the (ts+2k)² padded array
def _place_strip(padded: np.ndarray, part: str, cells: np.ndarray,
                 bx: int, by: int, w: int, h: int, ts: int,
                 k: int = 1) -> None:
    x0, y0 = k + bx * w, k + by * h
    if part == "S":
        padded[0:k, x0 : x0 + w] = cells.reshape(k, w)
    elif part == "N":
        padded[ts + k : ts + 2 * k, x0 : x0 + w] = cells.reshape(k, w)
    elif part == "W":
        padded[y0 : y0 + h, 0:k] = cells.reshape(h, k)
    elif part == "E":
        padded[y0 : y0 + h, ts + k : ts + 2 * k] = cells.reshape(h, k)
    elif part == "SW":
        padded[0:k, 0:k] = cells.reshape(k, k)
    elif part == "SE":
        padded[0:k, ts + k : ts + 2 * k] = cells.reshape(k, k)
    elif part == "NW":
        padded[ts + k : ts + 2 * k, 0:k] = cells.reshape(k, k)
    elif part == "NE":
        padded[ts + k : ts + 2 * k, ts + k : ts + 2 * k] = cells.reshape(k, k)


def apply_prefilters(padded: np.ndarray, steps) -> np.ndarray:
    """Run prefilter steps (kernels.PREFILTERS) over an int16 padded
    block; each consumes one halo ring.  Output rounds back to int16
    (heights stay 1 m-quantized end-to-end, the storage discipline of
    §1.2), missing stays missing."""
    f = kernels.heights_to_float(padded, dtype=np.float32)
    for st in steps:
        fn = kernels.PREFILTERS[st.name]
        params = {k: float(v) for k, v in st.params.items()}
        f = fn(f, **params)
    return kernels.float_to_heights(f)


def shade_unified(
    parts: DataFrame, tile_size: int, script: str,
    fill: int = DEM_HEIGHT_NONE,
    clip_poly: np.ndarray | None = None,
    halo: int = 1,
    prefilter: str | None = None,
    png_level: int | None = None,
) -> DataFrame:
    """One grouped task per tile: stitch blocks, apply neighbor strips
    into the k-px halo, optional height prefilters, Horn + shaders, PNG
    encode.  ``parts`` comes from :func:`hillshade_parts` (same halo);
    groups with no center blocks (strips sent past the world edge)
    produce nothing.  ``prefilter`` is a step script over
    kernels.PREFILTERS (e.g. ``"blur"`` or ``"sharpen(amount=1.5)"``);
    each step consumes one halo ring, so halo must be 1 + n_steps."""
    steps = pipeline.parse_script(script)
    registry = dict(pipeline.SHADER_REGISTRY)  # snapshot: custom shaders
    # registered on the driver ride the closure to executor processes
    lvl = codec.RGBA_PNG_LEVEL if png_level is None else png_level
    pre_steps = pipeline.parse_script(prefilter) if prefilter else []
    if halo != 1 + len(pre_steps):
        raise ValueError(
            f"halo {halo} must be 1 + number of prefilter steps "
            f"({len(pre_steps)})"
        )

    def assemble_pad_shade(pdf: pd.DataFrame) -> pd.DataFrame:
        import os as _eos
        import time as _etime

        # in-UDF phase profiling (set DEMETON_PROF_DIR to a directory):
        # splits worker time into assemble/shade/encode so harness
        # overhead (Arrow, scheduling) is measurable as task_time minus
        # the sum of these — the attribution tool behind SCALE.md's
        # core-scaling analysis.  Off (falsy) on every normal run.
        prof = _eos.environ.get("DEMETON_PROF_DIR")
        t0 = _etime.perf_counter() if prof else 0.0
        is_block = pdf["part"] == "B"
        blocks = pdf[is_block]
        if blocks.empty:
            return pd.DataFrame(
                columns=["tile_x", "tile_y", "tile_name", "width", "height",
                         "png", "shaded_px", "total_px", "n_blocks"]
            )
        ts, k = tile_size, halo
        tile_x = int(pdf["tile_x"].iloc[0])
        tile_y = int(pdf["tile_y"].iloc[0])
        padded = np.full((ts + 2 * k, ts + 2 * k), fill, dtype=np.int16)
        n_blocks_in = int(is_block.sum())  # lineage: rows consumed
        # overwrite-order dedup: in (by, bx, image_id) order only the
        # LAST block per position is ever visible, so decode just the
        # winners — duplicate-heavy ("land") tiles cost one decode per
        # position no matter how many copies arrived (the skew defense
        # that makes salting unnecessary short of cluster-scale
        # hotspots; output byte-identical, tested)
        blocks = blocks.sort_values(["by", "bx", "image_id"]).drop_duplicates(
            ["bx", "by"], keep="last"
        )
        for fmt, payload, w, h, bx, by in zip(
            blocks["fmt"], blocks["data"], blocks["w"], blocks["h"],
            blocks["bx"], blocks["by"],
        ):
            block = _decode_block(fmt, payload, int(w))
            y0, x0 = k + int(by) * int(h), k + int(bx) * int(w)
            padded[y0 : y0 + int(h), x0 : x0 + int(w)] = block
        strips = pdf[~is_block]
        if not strips.empty:
            # same overwrite-order winner selection per strip position:
            # duplicate edge blocks resolve identically on both sides
            # of the tile boundary
            strips = strips.sort_values(
                ["by", "bx", "image_id"]
            ).drop_duplicates(["part", "bx", "by"], keep="last")
            for part, payload, w, h, bx, by in zip(
                strips["part"], strips["data"], strips["w"], strips["h"],
                strips["bx"], strips["by"],
            ):
                cells = np.frombuffer(payload, dtype="<i2")
                _place_strip(padded, part, cells, int(bx), int(by),
                             int(w), int(h), ts, k)
        if pre_steps:
            padded = apply_prefilters(padded, pre_steps)
        t1 = _etime.perf_counter() if prof else 0.0
        rgba, shaded = shade_padded_block(
            padded, tile_x, tile_y, ts, steps, clip_poly=clip_poly,
            registry=registry,
        )
        t2 = _etime.perf_counter() if prof else 0.0
        png = codec.encode_rgba_png(rgba, lvl)
        if prof:
            t3 = _etime.perf_counter()
            with open(
                f"{prof}/udf_{_eos.getpid()}.txt", "a"
            ) as fh:  # per-worker file: no cross-process lock needed
                fh.write(f"{t1 - t0:.4f} {t2 - t1:.4f} {t3 - t2:.4f}\n")
        return pd.DataFrame(
            {
                "tile_x": [tile_x],
                "tile_y": [tile_y],
                "tile_name": [_tile_name(0, tile_x, tile_y)],
                "width": [ts],
                "height": [ts],
                "png": [png],
                "shaded_px": [shaded],
                "total_px": [ts * ts],
                "n_blocks": [n_blocks_in],
            }
        )

    return parts.groupBy("tile_x", "tile_y").applyInPandas(
        assemble_pad_shade, schema=SHADED_SCHEMA
    )


# ---------------------------------------------------------------------------
# 4. shading (W1-W3 + §2.8 shaders, vectorized per tile)
# ---------------------------------------------------------------------------

SHADED_SCHEMA = (
    "tile_x int, tile_y int, tile_name string, width int, height int, "
    "png binary, shaded_px long, total_px long, n_blocks int"
)


#: row-band height for chunked shading: bounds the per-task float32
#: working set (~band·width·4B per temporary ≈ 0.9MB at 1800 wide) so the
#: kernel stays cache-resident and 32 concurrent Python workers don't
#: fight for memory bandwidth (measured: band=128 doubles 32-way
#: throughput vs band=256, 10× vs whole-tile).  Env-overridable for
#: cluster tuning (workers read the executor environment at import).
import os as _os

SHADE_BAND_ROWS = int(_os.environ.get("DEMETON_SHADE_BAND_ROWS", "128"))


def shade_padded_block(
    padded: np.ndarray,
    tile_x: int,
    tile_y: int,
    tile_size: int,
    steps,
    water: np.ndarray | None = None,
    clip_poly: np.ndarray | None = None,
    registry: dict | None = None,
) -> tuple[np.ndarray, int]:
    """Numpy core shared by the Spark path and the single-array oracle.

    ``padded`` is the (ts+2, ts+2) int16 block (row 0 = south).  Returns
    (RGBA image in bitmap orientation — row 0 = north, per the Y-flip at
    Hillshading.fs:150-153 — and the shaded-pixel count).  The tile is
    processed in row bands: identical results, bounded temporaries.
    ``water`` (center-sized bool mask) feeds the water shaders when the
    tile came from an XTH source (TileShadeCommand.fs:428-473).
    """
    h = padded.shape[0] - 2
    w = padded.shape[1] - 2
    cpd = cells_per_degree(tile_size, 0)
    min_cell_y = tile_y * tile_size
    out = np.empty((h, w, 4), dtype=np.uint8)
    shaded = 0
    for r0 in range(0, h, SHADE_BAND_ROWS):
        r1 = min(r0 + SHADE_BAND_ROWS, h)
        # float32 end-to-end in the band kernels: int16 heights are exact
        # in f32, slope/aspect precision stays ~1e-7 relative (sub-LSB
        # after the uint8 quantization), and the halved bandwidth is what
        # keeps 32 concurrent workers off the memory wall
        f = kernels.heights_to_float(padded[r0 : r1 + 2, :], dtype=np.float32)
        rows = np.arange(r0, r1, dtype=np.float64) + min_cell_y
        lat_deg = rows / cpd
        grid_w, grid_h = kernels.grid_size_meters(cpd, lat_deg)
        p, q = kernels.horn_pq(
            f,
            grid_w[:, None].astype(np.float32),
            grid_h[:, None].astype(np.float32),
        )
        slope, aspect = kernels.slope_and_aspect(p, q)
        ctx = pipeline.ShadeContext(
            heights=f[1:-1, 1:-1],
            slope=slope,
            aspect=aspect,
            water=None if water is None else water[r0:r1, :],
            heights_are_int16=True,  # straight from the int16 grid
        )
        rgba = pipeline.evaluate_steps(steps, ctx, registry=registry)
        if clip_poly is not None:
            # point-in-polygon raster clip (north-star: "point-in-polygon
            # tests clip rasters to requested geo bounds"): pixels whose
            # cell lon/lat falls outside the polygon go transparent.
            # Runs per band on the same cell-coordinate convention as the
            # geodesic grid above (cell c ↔ degree c/cpd).
            from .geometry import points_in_polygon

            lon = (np.arange(w, dtype=np.float64) + tile_x * tile_size) / cpd
            nrows = r1 - r0
            px = np.broadcast_to(lon, (nrows, w))
            py = np.broadcast_to(lat_deg[:, None], (nrows, w))
            inside = points_in_polygon(px, py, clip_poly[:, 0], clip_poly[:, 1])
            rgba = rgba.copy()
            rgba[..., 3] = np.where(inside, rgba[..., 3], 0)
        shaded += int(np.count_nonzero(rgba[..., 3] > 0))
        out[r0:r1] = rgba
    return out[::-1, :, :], shaded  # Y-flip to bitmap orientation


def shade_tiles(
    padded_tiles: DataFrame, tile_size: int,
    script: str = pipeline.DEFAULT_SCRIPT,
    png_level: int | None = None,
) -> DataFrame:
    """Run the shading pipeline over halo-padded tiles (one task per tile)."""
    steps = pipeline.parse_script(script)
    registry = dict(pipeline.SHADER_REGISTRY)  # snapshot: custom shaders
    # registered on the driver ride the closure to executor processes
    lvl = codec.RGBA_PNG_LEVEL if png_level is None else png_level

    def shade(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "tile_x", "tile_y", "tile_name", "width", "height",
                "png", "shaded_px", "total_px", "n_blocks",
            )}
            for tx, ty, buf in zip(pdf["tile_x"], pdf["tile_y"], pdf["padded"]):
                padded = np.frombuffer(buf, dtype="<i2").reshape(
                    tile_size + 2, tile_size + 2
                )
                rgba, shaded = shade_padded_block(
                    padded, int(tx), int(ty), tile_size, steps,
                    registry=registry,
                )
                from .tiles import tile_name as _tname

                rows["tile_x"].append(int(tx))
                rows["tile_y"].append(int(ty))
                rows["tile_name"].append(_tname(0, int(tx), int(ty)))
                rows["width"].append(tile_size)
                rows["height"].append(tile_size)
                rows["png"].append(codec.encode_rgba_png(rgba, lvl))
                rows["shaded_px"].append(shaded)
                rows["total_px"].append(tile_size * tile_size)
                rows["n_blocks"].append(0)  # unfused path: no lineage carry
            yield pd.DataFrame(rows)

    return padded_tiles.mapInPandas(shade, schema=SHADED_SCHEMA)


# ---------------------------------------------------------------------------
# tile-shade: XTH water-bit tiles → fixed pipeline (reference §3.2)
# ---------------------------------------------------------------------------

#: approximation of TileShadeCommand's hardcoded pipeline
#: (solid ∘ ((lambert ⊕darken slope ⊕darken igor) over water) —
#: /root/reference/Demeton/Commands/TileShadeCommand.fs:333-388)
TILE_SHADE_SCRIPT = (
    "solid(color=#ffffff)|+lambert|+slope(compose=darken)"
    "|+igor(compose=darken)|+water|+wateroutline"
)


def run_tile_shade(
    spark: SparkSession,
    xth_tiles: DataFrame,
    tile_size: int,
    script: str = TILE_SHADE_SCRIPT,
    png_level: int | None = None,
) -> DataFrame:
    """XTH-packed tiles (heights + water bit) → shaded PNG tiles.

    Input rows: ``(tile_x, tile_y, xth binary)`` — the packed uint16
    encoding of codec.encode_xth.  The packed values ride the same halo
    strip machinery as plain heights (missing-neighbor fill is 0, which
    decodes to missing-with-no-water); decode happens once per padded
    tile at shade time, and the water mask feeds the water/wateroutline
    shader steps.
    """
    steps = pipeline.parse_script(script)
    registry = dict(pipeline.SHADER_REGISTRY)  # snapshot: custom shaders
    # registered on the driver ride the closure to executor processes
    lvl = codec.RGBA_PNG_LEVEL if png_level is None else png_level

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ts = tile_size
        for pdf in batches:
            frames = []
            for tx, ty, buf in zip(pdf["tile_x"], pdf["tile_y"], pdf["xth"]):
                packed = np.frombuffer(buf, dtype="<i2").reshape(ts, ts)
                frames.append(
                    _emit_center_and_strips(packed, int(tx), int(ty), 1)
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {k: [] for k in ("tile_x", "tile_y", "part", "data", "n_blocks")}
            )

    parts = xth_tiles.mapInPandas(emit, schema=HALO_PART_LINEAGE_SCHEMA)

    def pad_and_shade(pdf: pd.DataFrame) -> pd.DataFrame:
        parts_map = dict(zip(pdf["part"], pdf["data"]))
        if "C" not in parts_map:
            return pd.DataFrame(
                columns=["tile_x", "tile_y", "tile_name", "width", "height",
                         "png", "shaded_px", "total_px", "n_blocks"]
            )
        ts = tile_size
        tile_x = int(pdf["tile_x"].iloc[0])
        tile_y = int(pdf["tile_y"].iloc[0])
        padded_packed = _pad_from_parts(parts_map, ts, fill=0)
        packed_u = padded_packed.view(np.uint16)
        water_pad = (packed_u >> 15).astype(bool)
        offs = (packed_u & 0x7FFF).astype(np.int32)
        heights = np.where(
            offs == 0, DEM_HEIGHT_NONE, offs + codec._XTH_MIN_HEIGHT
        ).astype(np.int16)
        rgba, shaded = shade_padded_block(
            heights, tile_x, tile_y, ts, steps, water=water_pad[1:-1, 1:-1],
            registry=registry,
        )
        return pd.DataFrame(
            {
                "tile_x": [tile_x],
                "tile_y": [tile_y],
                "tile_name": [_tile_name(0, tile_x, tile_y)],
                "width": [ts],
                "height": [ts],
                "png": [codec.encode_rgba_png(rgba, lvl)],
                "shaded_px": [shaded],
                "total_px": [ts * ts],
                "n_blocks": [1],
            }
        )

    return parts.groupBy("tile_x", "tile_y").applyInPandas(
        pad_and_shade, schema=SHADED_SCHEMA
    )


# ---------------------------------------------------------------------------
# 5. end-to-end job with resumable checkpoints + metrics
# ---------------------------------------------------------------------------

def run_hillshade(
    spark: SparkSession,
    images: DataFrame,
    tile_size: int,
    script: str = pipeline.DEFAULT_SCRIPT,
    output_dir: str | None = None,
    resume: bool = True,
    salt_buckets: int | None = None,
    clip_polygon=None,
    shade_partitions: int | None = None,
    prefilter: str | None = None,
    png_level: int | None = None,
    local_dedup: bool = False,
) -> DataFrame:
    """images table → shaded PNG tiles.

    With ``output_dir`` the job is resumable: completed tile keys are
    read back from the sink (the checkpoint manifest) and anti-joined
    out of the input — re-running after a failure only shades the
    missing tiles (ImportSrtmTilesCommand.fs:110-124 semantics).
    ``salt_buckets`` switches to two-phase salted assembly for inputs
    with heavy per-tile skew (see :func:`assemble_parts_salted`).
    ``clip_polygon`` — sequence of (lon, lat) vertices: tiles outside
    the polygon's bbox are pruned with a Catalyst predicate before the
    shuffle (floor/ceil−1 cover rule, Dem/Funcs.fs:284-298) and pixels
    outside the polygon render transparent (per-band vectorized
    point-in-polygon clip, SURVEY.md §2.3 J9).
    ``prefilter`` — height low/high-pass step script (``"blur"``,
    ``"sharpen(amount=…)"``; Roadmap.md filters) applied before the
    Horn gradient; widens the halo exchange by one ring per step.
    """
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
    halo = 1 + (len(pipeline.parse_script(prefilter)) if prefilter else 0)
    assigned = parse_caption(images)
    if local_dedup:
        # duplicate-heavy sources: collapse losing duplicate blocks
        # before anything is emitted or shuffled (byte-identical output)
        assigned = dedup_duplicate_blocks(assigned)
    if salt_buckets and salt_buckets > 1:
        # two-phase salted assembly for pathological per-tile skew keeps
        # the two-stage topology (partial mosaics need their own shuffle)
        parts = assemble_parts_salted(
            assigned, tile_size, salt_buckets, halo=halo
        )
        if clip_poly is not None:
            tx0 = int(math.floor(clip_poly[:, 0].min()))
            tx1 = int(math.ceil(clip_poly[:, 0].max())) - 1
            ty0 = int(math.floor(clip_poly[:, 1].min()))
            ty1 = int(math.ceil(clip_poly[:, 1].max())) - 1
            parts = parts.where(
                (F.col("tile_x") >= tx0) & (F.col("tile_x") <= tx1)
                & (F.col("tile_y") >= ty0) & (F.col("tile_y") <= ty1)
            )
        if output_dir is not None and resume:
            done = _read_manifest(spark, output_dir)
            if done is not None:
                parts = parts.join(
                    F.broadcast(done), on=["tile_x", "tile_y"], how="left_anti"
                )
        shaded = shade_parts(
            parts, tile_size, script, clip_poly=clip_poly,
            halo=halo, prefilter=prefilter, png_level=png_level,
        )
    else:
        parts = hillshade_parts(assigned, tile_size, halo)
        if clip_poly is not None:
            # prune DESTINATION tiles to the polygon's bbox cover
            # (floor/ceil−1 rule, Dem/Funcs.fs:284-298).  The filter sits
            # above the block/strip union: it pushes down to the scan on
            # the block arm (the full-data one), while strips donated by
            # just-outside tiles into kept boundary tiles survive — the
            # clipped result stays pixel-identical to clipping the
            # unpruned output.
            tx0 = int(math.floor(clip_poly[:, 0].min()))
            tx1 = int(math.ceil(clip_poly[:, 0].max())) - 1
            ty0 = int(math.floor(clip_poly[:, 1].min()))
            ty1 = int(math.ceil(clip_poly[:, 1].max())) - 1
            parts = parts.where(
                (F.col("tile_x") >= tx0) & (F.col("tile_x") <= tx1)
                & (F.col("tile_y") >= ty0) & (F.col("tile_y") <= ty1)
            )
        if output_dir is not None and resume:
            done = _read_manifest(spark, output_dir)
            if done is not None:
                # anti-join on the DESTINATION tile key, after strip
                # emission: completed tiles still contribute halo strips
                # to incomplete neighbors (dropping them earlier would
                # corrupt resumed edges)
                parts = parts.join(
                    F.broadcast(done), on=["tile_x", "tile_y"], how="left_anti"
                )
        # pre-partition the one full-data exchange on the tile key at
        # finer granularity than spark.sql.shuffle.partitions: the shade
        # stage is CPU-bound per TILE, so ~1 tile/task bounds straggler
        # cost to one tile (measured +15% at sf0.1/local[32]).  The
        # following groupBy reuses this hash partitioning — no second
        # exchange.  Callers with a known tile count should pass it.
        n_parts = shade_partitions or spark.sparkContext.defaultParallelism * 4
        parts = parts.repartition(n_parts, "tile_x", "tile_y")
        shaded = shade_unified(
            parts, tile_size, script, clip_poly=clip_poly,
            halo=halo, prefilter=prefilter, png_level=png_level,
        )
    if output_dir is not None:
        shaded.write.mode("append").parquet(output_dir)
        return spark.read.parquet(output_dir)
    return shaded


def _read_manifest(spark: SparkSession, output_dir: str) -> DataFrame | None:
    try:
        return spark.read.parquet(output_dir).select("tile_x", "tile_y").distinct()
    except Exception:
        return None


# ---------------------------------------------------------------------------
# single-array oracle (for the tiled == untiled parity property)
# ---------------------------------------------------------------------------

def shade_world_oracle(
    world: np.ndarray,
    spec: WorldSpec,
    script: str = pipeline.DEFAULT_SCRIPT,
    clip_poly: np.ndarray | None = None,
    prefilter: str | None = None,
) -> np.ndarray:
    """Shade the whole world as ONE merged array (the reference's
    merged-HeightsArray path) and return the bitmap-oriented RGBA image.
    Used to prove the halo exchange reproduces untiled results.
    ``clip_poly`` applies the same point-in-polygon raster clip as the
    distributed path; ``prefilter`` the same height low/high-pass chain.
    """
    steps = pipeline.parse_script(script)
    registry = dict(pipeline.SHADER_REGISTRY)  # same snapshot semantics
    # as the distributed path (oracle runs driver-side, so this is the
    # current registry either way)
    pre_steps = pipeline.parse_script(prefilter) if prefilter else []
    k = 1 + len(pre_steps)
    ts = spec.tile_size
    cpd = cells_per_degree(ts, 0)
    h, w = world.shape
    padded = np.full((h + 2 * k, w + 2 * k), DEM_HEIGHT_NONE, dtype=np.int16)
    padded[k : h + k, k : w + k] = world
    if pre_steps:
        padded = apply_prefilters(padded, pre_steps)
    f = kernels.heights_to_float(padded, dtype=np.float32)  # match engine dtype
    min_cell_y = spec.lat0 * ts
    lat_deg = (np.arange(h, dtype=np.float64) + min_cell_y) / cpd
    grid_w, grid_h = kernels.grid_size_meters(cpd, lat_deg)
    p, q = kernels.horn_pq(
        f, grid_w[:, None].astype(np.float32), grid_h[:, None].astype(np.float32)
    )
    slope, aspect = kernels.slope_and_aspect(p, q)
    ctx = pipeline.ShadeContext(
        heights=f[1:-1, 1:-1], slope=slope, aspect=aspect
    )
    rgba = pipeline.evaluate_steps(steps, ctx, registry=registry)
    if clip_poly is not None:
        from .geometry import points_in_polygon

        lon = (np.arange(w, dtype=np.float64) + spec.lon0 * ts) / cpd
        px = np.broadcast_to(lon, (h, w))
        py = np.broadcast_to(lat_deg[:, None], (h, w))
        inside = points_in_polygon(px, py, clip_poly[:, 0], clip_poly[:, 1])
        rgba = rgba.copy()
        rgba[..., 3] = np.where(inside, rgba[..., 3], 0)
    return rgba[::-1, :, :]
