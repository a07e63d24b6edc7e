"""Water-body analysis: connected components, stats, visibility
filtering, outline distance — per tile in numpy, unified across tile
boundaries with a label-equivalence join.

Reference semantics reproduced (capability, not code):
  - flood-fill component labeling with per-component area + coverage
    bbox (/root/reference/Demeton/WaterBodies/Coloring.fs:17-182;
    labels start at 2 there because 0/1 mean no-water/unprocessed — we
    keep 0 = land and number components from 1, the parity surface is
    the partition itself, not the label values)
  - visibility filter: drop components with area < 1250 or
    bbox-area/area ratio >= 10
    (/root/reference/Demeton/Shaders/WaterBodies/WaterBodiesShaders.fs:29-35)
  - outline distance rings 1..3 grown inward from the shore
    (/root/reference/Demeton/WaterBodies/Outlining.fs:37-154)

The Spark path labels each tile independently (one applyInPandas task
per tile), then joins adjacent tiles' edge strips: water pixels that
touch across a tile boundary yield equivalence edges between
(tile, local_label) nodes, and :func:`demeton_spark.graph.
connected_components` collapses them into global components.  This is
the same halo topology as the shading stencil — strips are ~2·ts cells
per tile, so the wide stage stays narrow-payload at 10^12-pixel scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tiles import DEM_HEIGHT_NONE

# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------


def water_mask_from_heights(
    heights: np.ndarray, sea_level: int = 0
) -> np.ndarray:
    """Synthetic water detector: below sea level and not missing."""
    return (heights <= sea_level) & (heights != DEM_HEIGHT_NONE)


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: list[int] = []

    def make(self) -> int:
        self.parent.append(len(self.parent))
        return len(self.parent) - 1

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


def label_components(mask: np.ndarray) -> np.ndarray:
    """4-connected component labeling: 0 = background, components 1..n
    numbered in first-pixel row-major order (deterministic).

    Run-based two-pass union-find: each row is reduced to water runs
    (vectorized), runs are unioned with overlapping runs of the previous
    row, labels resolve in a final vectorized pass.  O(runs α(runs)) —
    per-tile work, no Python per-pixel loop.
    """
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    uf = _UnionFind()
    prev_runs: list[tuple[int, int, int]] = []  # (start, end_excl, run_id)
    run_of_row: list[list[tuple[int, int, int]]] = []
    for y in range(h):
        row = mask[y]
        if not row.any():
            prev_runs = []
            run_of_row.append([])
            continue
        diffs = np.diff(row.astype(np.int8))
        starts = np.flatnonzero(diffs == 1) + 1
        ends = np.flatnonzero(diffs == -1) + 1
        if row[0]:
            starts = np.concatenate(([0], starts))
        if row[-1]:
            ends = np.concatenate((ends, [w]))
        cur_runs: list[tuple[int, int, int]] = []
        pi = 0
        for s, e in zip(starts, ends):
            rid = uf.make()
            # union with previous-row runs overlapping [s, e)
            while pi < len(prev_runs) and prev_runs[pi][1] <= s:
                pi += 1
            pj = pi
            while pj < len(prev_runs) and prev_runs[pj][0] < e:
                uf.union(rid, prev_runs[pj][2])
                pj += 1
            cur_runs.append((int(s), int(e), rid))
        prev_runs = cur_runs
        run_of_row.append(cur_runs)
    # resolve roots → compact labels in first-appearance order
    root_to_label: dict[int, int] = {}
    next_label = 1
    for y, runs in enumerate(run_of_row):
        for s, e, rid in runs:
            root = uf.find(rid)
            lab = root_to_label.get(root)
            if lab is None:
                lab = next_label
                root_to_label[root] = lab
                next_label += 1
            labels[y, s:e] = lab
    return labels


def component_stats(labels: np.ndarray) -> pd.DataFrame:
    """Per-component area + bbox: columns (label, area, min_x, min_y,
    max_x, max_y), sorted by label."""
    ys, xs = np.nonzero(labels)
    if len(ys) == 0:
        return pd.DataFrame(
            columns=["label", "area", "min_x", "min_y", "max_x", "max_y"]
        ).astype(np.int64)
    labs = labels[ys, xs]
    order = np.argsort(labs, kind="stable")
    labs, ys, xs = labs[order], ys[order], xs[order]
    uniq, starts = np.unique(labs, return_index=True)
    area = np.diff(np.concatenate((starts, [len(labs)])))
    out = {
        "label": uniq.astype(np.int64),
        "area": area.astype(np.int64),
        "min_x": np.minimum.reduceat(xs, starts).astype(np.int64),
        "min_y": np.minimum.reduceat(ys, starts).astype(np.int64),
        "max_x": np.maximum.reduceat(xs, starts).astype(np.int64),
        "max_y": np.maximum.reduceat(ys, starts).astype(np.int64),
        # scan-first pixel: nonzero() is row-major and the stable sort
        # keeps that order within each label, so segment head = first
        "first_x": xs[starts].astype(np.int64),
        "first_y": ys[starts].astype(np.int64),
    }
    return pd.DataFrame(out)


def visible_water_bodies(
    stats: pd.DataFrame, min_area: int = 1250, max_bbox_ratio: float = 10.0
) -> pd.DataFrame:
    """Reference visibility rule (WaterBodiesShaders.fs:29-35): a body is
    shown iff area >= min_area and bbox_area / area < max_bbox_ratio."""
    bbox_area = (stats["max_x"] - stats["min_x"] + 1) * (
        stats["max_y"] - stats["min_y"] + 1
    )
    keep = (stats["area"] >= min_area) & (bbox_area / stats["area"] < max_bbox_ratio)
    return stats[keep].reset_index(drop=True)


def outline_distance(mask: np.ndarray, max_dist: int = 3) -> np.ndarray:
    """Distance (1..max_dist) from the shore, grown inward over water;
    0 = land or deeper than max_dist (Outlining.fs:37-154 BFS rings,
    vectorized as iterative neighbor-min passes)."""
    dist = np.zeros(mask.shape, dtype=np.int32)
    land = ~mask
    # ring 1: water adjacent (4-connected) to land or to the array edge
    nbr_land = np.zeros(mask.shape, dtype=bool)
    nbr_land[1:, :] |= land[:-1, :]
    nbr_land[:-1, :] |= land[1:, :]
    nbr_land[:, 1:] |= land[:, :-1]
    nbr_land[:, :-1] |= land[:, 1:]
    nbr_land[0, :] = nbr_land[-1, :] = nbr_land[:, 0] = nbr_land[:, -1] = True
    frontier = mask & nbr_land
    dist[frontier] = 1
    for d in range(2, max_dist + 1):
        grown = np.zeros(mask.shape, dtype=bool)
        grown[1:, :] |= frontier[:-1, :]
        grown[:-1, :] |= frontier[1:, :]
        grown[:, 1:] |= frontier[:, :-1]
        grown[:, :-1] |= frontier[:, 1:]
        frontier = grown & mask & (dist == 0)
        if not frontier.any():
            break
        dist[frontier] = d
    return dist


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

TILE_COMPONENT_SCHEMA = (
    "tile_x int, tile_y int, label int, area long, "
    "min_cx long, min_cy long, max_cx long, max_cy long, min_key long"
)

#: lexicographic (cell_y, cell_x) key of a global cell — the portable
#: component identity (min over members), independent of tile layout
#: and label numbering; offsets keep it positive for any Earth cell
_CELL_KEY_OFF = 1 << 25
_CELL_KEY_MUL = 1 << 26


def cell_key(cy: int, cx: int):
    return (cy + _CELL_KEY_OFF) * _CELL_KEY_MUL + (cx + _CELL_KEY_OFF)
_EDGE_STRIP_SCHEMA = (
    "ex long, ey long, side string, pos long, node long"
)

#: local label packing: node id = ((tile_x+180)*360 + (tile_y+90)) << 20 | label
_NODE_SHIFT = 20


def _node_id(tile_x: int, tile_y: int, labels: np.ndarray) -> np.ndarray:
    key = (tile_x + 180) * 360 + (tile_y + 90)
    return (np.int64(key) << _NODE_SHIFT) | labels.astype(np.int64)


def tile_water_components(
    tiles: DataFrame, tile_size: int, sea_level: int = 0
) -> DataFrame:
    """Per-tile component stats in GLOBAL cell coordinates, node-keyed for
    cross-tile union.  Input rows: (tile_x, tile_y, heights binary)."""

    def per_tile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for tx, ty, buf in zip(pdf["tile_x"], pdf["tile_y"], pdf["heights"]):
                tile = np.frombuffer(buf, dtype="<i2").reshape(tile_size, tile_size)
                labels = label_components(water_mask_from_heights(tile, sea_level))
                st = component_stats(labels)
                if not len(st):
                    continue
                st = st.assign(
                    tile_x=int(tx),
                    tile_y=int(ty),
                    min_cx=st["min_x"] + int(tx) * tile_size,
                    max_cx=st["max_x"] + int(tx) * tile_size,
                    min_cy=st["min_y"] + int(ty) * tile_size,
                    max_cy=st["max_y"] + int(ty) * tile_size,
                    min_key=cell_key(
                        st["first_y"] + int(ty) * tile_size,
                        st["first_x"] + int(tx) * tile_size,
                    ),
                )
                st["label"] = st["label"].astype(np.int32)
                frames.append(
                    st[["tile_x", "tile_y", "label", "area",
                        "min_cx", "min_cy", "max_cx", "max_cy", "min_key"]]
                )
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame(
                    {k: [] for k in (
                        "tile_x", "tile_y", "label", "area",
                        "min_cx", "min_cy", "max_cx", "max_cy", "min_key")}
                )
            )

    return tiles.mapInPandas(per_tile, schema=TILE_COMPONENT_SCHEMA)


def _edge_strips(tiles: DataFrame, tile_size: int, sea_level: int) -> DataFrame:
    """Emit per-tile boundary water pixels keyed by the SHARED edge:
    ``(ex, ey, side)`` identifies the border between two tiles, ``pos``
    the pixel along it, ``node`` the globally-unique (tile, label) id.
    A groupBy on the edge key joins both tiles' strips without a full
    tile shuffle."""

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ts = tile_size
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("ex", "ey", "side", "pos", "node")}
            for tx, ty, buf in zip(pdf["tile_x"], pdf["tile_y"], pdf["heights"]):
                tile = np.frombuffer(buf, dtype="<i2").reshape(ts, ts)
                labels = label_components(water_mask_from_heights(tile, sea_level))
                nodes = _node_id(int(tx), int(ty), labels)
                edges = [
                    # (edge key, side tag, boundary row/col)
                    ((int(tx), int(ty)), "S", labels[0, :], nodes[0, :]),
                    ((int(tx), int(ty) + 1), "S", labels[-1, :], nodes[-1, :]),
                    ((int(tx), int(ty)), "W", labels[:, 0], nodes[:, 0]),
                    ((int(tx) + 1, int(ty)), "W", labels[:, -1], nodes[:, -1]),
                ]
                for (ex, ey), side, lab_line, node_line in edges:
                    idx = np.flatnonzero(lab_line)
                    out["ex"].extend([ex] * len(idx))
                    out["ey"].extend([ey] * len(idx))
                    out["side"].extend([side] * len(idx))
                    out["pos"].extend(idx.tolist())
                    out["node"].extend(node_line[idx].tolist())
            yield pd.DataFrame(out)

    return tiles.mapInPandas(emit, schema=_EDGE_STRIP_SCHEMA)


def global_water_components(
    tiles: DataFrame, tile_size: int, sea_level: int = 0
) -> DataFrame:
    """Cross-tile water components: per-tile labeling + boundary-join
    label union + component-stat rollup.

    Returns (component_id, area, min_cx, min_cy, max_cx, max_cy) in
    global cell coordinates; component_id is the lexicographic
    (cell_y, cell_x) key of the component's first cell in global scan
    order (``cell_key``) — deterministic AND independent of the tile
    layout and per-tile label numbering, so any re-tiling of the same
    raster yields identical ids.
    """
    from .graph import connected_components

    per_tile = tile_water_components(tiles, tile_size, sea_level)
    nodes = per_tile.select(
        _node_id_col("tile_x", "tile_y", "label").alias("node")
    )
    strips = _edge_strips(tiles, tile_size, sea_level)
    # two strips of one shared edge meet on (edge key, pos); equal pos =
    # pixel adjacency across the boundary (4-connectivity)
    a, b = strips.alias("a"), strips.alias("b")
    eq_edges = (
        a.join(b, on=["ex", "ey", "side", "pos"])
        .where(F.col("a.node") < F.col("b.node"))
        .select(F.col("a.node").alias("na"), F.col("b.node").alias("nb"))
        .distinct()
    )
    labels = connected_components(nodes, eq_edges, "node", ("na", "nb"))
    return (
        per_tile.withColumn(
            "node", _node_id_col("tile_x", "tile_y", "label")
        )
        .join(labels.select("node", F.col("label").alias("comp_label")), on="node")
        .groupBy("comp_label")
        .agg(
            F.min("min_key").alias("component_id"),
            F.sum("area").alias("area"),
            F.min("min_cx").alias("min_cx"),
            F.min("min_cy").alias("min_cy"),
            F.max("max_cx").alias("max_cx"),
            F.max("max_cy").alias("max_cy"),
        )
        .drop("comp_label")
    )


def _node_id_col(tx: str, ty: str, label: str):
    key = (F.col(tx) + 180) * 360 + (F.col(ty) + 90)
    return F.shiftleft(key.cast("bigint"), _NODE_SHIFT).bitwiseOR(
        F.col(label).cast("bigint")
    )


WORLDCOVER_WATER_CLASS = 80  # WorldCover/Funcs.fs:12-21

XTH_TILE_SCHEMA = "tile_x int, tile_y int, xth binary"


def build_xth_tiles(
    dem_tiles: DataFrame,
    water_class_tiles: DataFrame,
    tile_size: int,
    water_size: int,
    water_class: int = WORLDCOVER_WATER_CLASS,
) -> DataFrame:
    """The ``dem-with-water-bodies`` ETL: DEM tiles ⋈ water-class tiles →
    XTH tiles with the water flag packed into the height MSB.

    Reference lifecycle (/root/reference/Demeton/Commands/
    DemWithWaterBodiesCommand.fs:192-262): per tile, the WorldCover
    class raster becomes a water monochrome (class ``water_class`` → 1,
    WorldCover/Funcs.fs:12-21), majority-downsamples onto the DEM grid
    (WaterBodies/Funcs.fs:9-64), and packs with the heights
    (Xth.encodeWaterBodiesInfoIntoDem).  Tiles absent from the water
    table get an all-land water mask (the reference's ``.none`` negative
    cache becomes the left join's null side).

    ``dem_tiles``: (tile_x, tile_y, heights binary int16 ts²);
    ``water_class_tiles``: (tile_x, tile_y, classes binary uint8
    water_size²).
    """
    joined = dem_tiles.join(
        water_class_tiles.withColumnRenamed("classes", "wc"),
        on=["tile_x", "tile_y"],
        how="left",
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codec
        from .kernels import resample_majority_binary

        ts = tile_size
        for pdf in batches:
            out: dict[str, list] = {"tile_x": [], "tile_y": [], "xth": []}
            for r in pdf.itertuples():
                heights = np.frombuffer(r.heights, dtype="<i2").reshape(ts, ts)
                if r.wc is None:
                    mask = np.zeros((ts, ts), dtype=bool)
                else:
                    classes = np.frombuffer(r.wc, dtype=np.uint8).reshape(
                        water_size, water_size
                    )
                    mono = (classes == water_class).astype(np.int16)
                    mask = resample_majority_binary(mono, ts, ts).astype(bool)
                out["tile_x"].append(int(r.tile_x))
                out["tile_y"].append(int(r.tile_y))
                out["xth"].append(codec.encode_xth(heights, mask))
            yield pd.DataFrame(out)

    return joined.mapInPandas(pack, schema=XTH_TILE_SCHEMA)


def visible_components(components: DataFrame,
                       min_area: int = 1250,
                       max_bbox_ratio: float = 10.0) -> DataFrame:
    """DataFrame form of the visibility rule (P5) over global components."""
    bbox_area = (F.col("max_cx") - F.col("min_cx") + 1) * (
        F.col("max_cy") - F.col("min_cy") + 1
    )
    return components.where(
        (F.col("area") >= min_area)
        & (bbox_area / F.col("area") < max_bbox_ratio)
    )
