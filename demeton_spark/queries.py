"""Driver-contract query catalog: every relational/spatial operator from
SURVEY.md §2 surfaced as a named query with a DuckDB-checkable oracle.

Each entry pairs an idiomatic-Spark DataFrame builder (``(spark, sf_dir)
-> DataFrame``) with an equivalent ANSI-SQL string for DuckDB.  Column
names and types are aligned on both sides (the driver hashes values
after sorting columns by name): aggregates go through exact decimal
arithmetic before a final cast to double, counts are bigint, and
floating expressions are rounded where accumulation order could differ.

Operator coverage map (SURVEY.md §2):
  J1  tile cover / assignment      → tile_assign_events, bbox_cover
  J9  point-in-polygon clip        → polygon_clip
  J6  broadcast tile-metadata join → tile_metadata_join
  J7  pyramid parent↔children join → pyramid_parents
  A5  value histogram              → value_histogram
  A6  MBR aggregate                → tile_mbr
  sorts/limits                     → top_revenue_orders
  hash agg / joins                 → pricing_summary, region_rollup
  SQL windows (engine extras)      → events_top_event, events_sessionize
  dedup family                     → doc_exact_dedup, doc_minhash,
                                     doc_near_dup_pairs, doc_near_dup_recall,
                                     doc_dedup_clusters, doc_simhash,
                                     doc_ngram_near_dup, emb_near_dup_pairs
  text analysis                    → doc_token_stats, doc_lang_quality,
                                     doc_fingerprint
  similarity search                → knn_bruteforce, knn_ivf_bucketed,
                                     kmeans_centroids, knn_ivf_kmeans,
                                     embedding_label_stats
  H3/S2 cell index (north_rule)    → geocell_assign, geocell_rollup
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tiles import tile_name_sql

SRTM_TS = 3600  # level-0 cells per degree

# Tutorial bbox (reference docs/Tutorial.md:28) used for the cover query
BBOX = (13.49437, 46.159668, 14.236633, 46.543914)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# deterministic lon/lat derivation shared by Spark + DuckDB
# (events carry no geo columns; derive off-boundary coords from ids)
# ---------------------------------------------------------------------------

_PTS_SQL = (
    "select event_id, user_id, event_type, value, "
    "-179.5 + (event_id % 359) as lon, -89.5 + (user_id % 179) as lat "
    "from events"
)


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        (F.lit(-179.5) + (F.col("event_id") % 359)).alias("lon"),
        (F.lit(-89.5) + (F.col("user_id") % 179)).alias("lat"),
    )


# --- J1: point → tile assignment -------------------------------------------

def q_tile_assign_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _pts(spark, sf_dir)
    tx = F.floor(F.col("lon")).cast("int")
    ty = F.floor(F.col("lat")).cast("int")
    lat_sign = F.when(ty >= 0, F.lit("N")).otherwise(F.lit("S"))
    lon_sign = F.when(tx >= 0, F.lit("E")).otherwise(F.lit("W"))
    name = F.concat(
        lat_sign,
        F.lpad(F.abs(ty).cast("string"), 2, "0"),
        lon_sign,
        F.lpad(F.abs(tx).cast("string"), 3, "0"),
    )
    return (
        pts.select(tx.alias("tile_x"), ty.alias("tile_y"), name.alias("tile_name"))
        .groupBy("tile_x", "tile_y", "tile_name")
        .agg(F.count("*").alias("n_events"))
    )


SQL_TILE_ASSIGN_EVENTS = f"""
with pts as ({_PTS_SQL})
select cast(floor(lon) as int) as tile_x,
       cast(floor(lat) as int) as tile_y,
       {tile_name_sql('cast(floor(lon) as int)', 'cast(floor(lat) as int)')} as tile_name,
       cast(count(*) as bigint) as n_events
from pts
group by 1, 2, 3
"""


# --- J1: bbox → covering tiles (the ceil-1 rule) ----------------------------

def q_bbox_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    min_lon, min_lat, max_lon, max_lat = BBOX
    levels = spark.range(0, 3).select(F.col("id").cast("int").alias("level"))
    size = F.pow(F.lit(2.0), F.col("level"))
    min_tx = F.floor(F.lit(min_lon) / size).cast("int")
    max_tx = (F.ceil(F.lit(max_lon) / size) - 1).cast("int")
    min_ty = F.floor(F.lit(min_lat) / size).cast("int")
    max_ty = (F.ceil(F.lit(max_lat) / size) - 1).cast("int")
    df = (
        levels.withColumn("tile_x", F.explode(F.sequence(min_tx, max_tx)))
        .withColumn("tile_y", F.explode(F.sequence(min_ty, max_ty)))
    )
    from .tiles import tile_name_col

    return df.select(
        "level",
        "tile_x",
        "tile_y",
        tile_name_col(F.col("level"), F.col("tile_x"), F.col("tile_y")).alias(
            "tile_name"
        ),
    )


SQL_BBOX_COVER = f"""
with levels as (select unnest(generate_series(0, 2)) as level),
cover as (
  select cast(level as int) as level,
         cast(tx.tile_x as int) as tile_x,
         cast(ty.tile_y as int) as tile_y
  from levels,
  lateral (select unnest(generate_series(
      cast(floor({BBOX[0]} / power(2, level)) as bigint),
      cast(ceil({BBOX[2]} / power(2, level)) as bigint) - 1)) as tile_x) tx,
  lateral (select unnest(generate_series(
      cast(floor({BBOX[1]} / power(2, level)) as bigint),
      cast(ceil({BBOX[3]} / power(2, level)) as bigint) - 1)) as tile_y) ty
)
select level, tile_x, tile_y,
  case when level = 0 then {tile_name_sql('tile_x', 'tile_y')}
  else concat('l', cast(level as varchar),
              case when tile_x >= 0 then 'e' else 'w' end,
              lpad(cast(abs(tile_x) as varchar), 2, '0'),
              case when tile_y >= 0 then 'n' else 's' end,
              lpad(cast(abs(tile_y) as varchar), 2, '0'))
  end as tile_name
from cover
"""


# --- J7: pyramid parent keys -------------------------------------------------

def q_pyramid_parents(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = q_tile_assign_events(spark, sf_dir).select("tile_x", "tile_y").distinct()
    out = None
    for level in (1, 2, 3):
        factor = float(1 << level)
        lvl = base.select(
            F.lit(level).cast("int").alias("level"),
            F.floor(F.col("tile_x") / factor).cast("int").alias("tile_x"),
            F.floor(F.col("tile_y") / factor).cast("int").alias("tile_y"),
        ).groupBy("level", "tile_x", "tile_y").agg(
            F.count("*").alias("n_children")
        )
        out = lvl if out is None else out.unionByName(lvl)
    return out


SQL_PYRAMID_PARENTS = f"""
with pts as ({_PTS_SQL}),
t0 as (select distinct cast(floor(lon) as int) as tile_x,
                       cast(floor(lat) as int) as tile_y from pts),
lv as (select unnest([1, 2, 3]) as level)
select cast(level as int) as level,
       cast(floor(tile_x / power(2, level)) as int) as tile_x,
       cast(floor(tile_y / power(2, level)) as int) as tile_y,
       cast(count(*) as bigint) as n_children
from lv, t0
group by 1, 2, 3
"""


# --- A6: MBR aggregate over global cell coords ------------------------------

def q_tile_mbr(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _pts(spark, sf_dir)
    cell_x = F.floor(F.col("lon") * SRTM_TS).cast("bigint")
    cell_y = F.floor(F.col("lat") * SRTM_TS).cast("bigint")
    return (
        pts.select(
            F.floor(F.col("lon")).cast("int").alias("tile_x"),
            F.floor(F.col("lat")).cast("int").alias("tile_y"),
            cell_x.alias("cell_x"),
            cell_y.alias("cell_y"),
        )
        .groupBy("tile_x", "tile_y")
        .agg(
            F.min("cell_x").alias("min_cell_x"),
            F.min("cell_y").alias("min_cell_y"),
            F.max("cell_x").alias("max_cell_x"),
            F.max("cell_y").alias("max_cell_y"),
        )
    )


SQL_TILE_MBR = f"""
with pts as ({_PTS_SQL})
select cast(floor(lon) as int) as tile_x,
       cast(floor(lat) as int) as tile_y,
       cast(min(floor(lon * {SRTM_TS})) as bigint) as min_cell_x,
       cast(min(floor(lat * {SRTM_TS})) as bigint) as min_cell_y,
       cast(max(floor(lon * {SRTM_TS})) as bigint) as max_cell_x,
       cast(max(floor(lat * {SRTM_TS})) as bigint) as max_cell_y
from pts
group by 1, 2
"""


# --- J9: point-in-polygon clip (convex polygon via half-plane tests) ---------

#: test polygon: a triangle over Europe (deterministic, off-grid vertices)
_TRI = ((-10.5, 35.25), (30.25, 40.5), (5.5, 70.75))


def _pip_triangle(lon, lat):
    """Point-in-triangle via three edge cross-product sign tests (the
    SQL-expressible convex case of geometry.points_in_polygon; the
    general vectorized crossing-number kernel is the numpy path,
    reference Geometry/Funcs.fs:9-33 orientation tests)."""
    import operator

    sides = []
    pts = list(_TRI)
    for (x1, y1), (x2, y2) in zip(pts, pts[1:] + pts[:1]):
        cross = (F.lit(x2) - F.lit(x1)) * (lat - F.lit(y1)) - (
            F.lit(y2) - F.lit(y1)
        ) * (lon - F.lit(x1))
        sides.append(cross >= 0)
    import functools

    return functools.reduce(operator.and_, sides)


def q_polygon_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip event points to a polygon, roll up per tile (J9 + J1)."""
    pts = _pts(spark, sf_dir)
    inside = pts.where(_pip_triangle(F.col("lon"), F.col("lat")))
    return (
        inside.select(
            F.floor(F.col("lon")).cast("int").alias("tile_x"),
            F.floor(F.col("lat")).cast("int").alias("tile_y"),
        )
        .groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("n_inside"))
    )


def _sql_pip_triangle() -> str:
    pts = list(_TRI)
    terms = []
    for (x1, y1), (x2, y2) in zip(pts, pts[1:] + pts[:1]):
        terms.append(
            f"(({x2} - {x1}) * (lat - {y1}) - ({y2} - {y1}) * (lon - {x1})) >= 0"
        )
    return " and ".join(terms)


SQL_POLYGON_CLIP = f"""
with pts as ({_PTS_SQL})
select cast(floor(lon) as int) as tile_x,
       cast(floor(lat) as int) as tile_y,
       cast(count(*) as bigint) as n_inside
from pts
where {_sql_pip_triangle()}
group by 1, 2
"""


# --- A5: value histogram ------------------------------------------------------

def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 10.0).cast("int")
    return ev.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


SQL_VALUE_HISTOGRAM = """
select cast(floor(value / 10.0) as int) as bucket,
       cast(count(*) as bigint) as n
from events group by 1
"""


# --- J6: broadcast tile-metadata join ----------------------------------------

def q_tile_metadata_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = q_tile_assign_events(spark, sf_dir)
    dim = (
        spark.range(-180, 180)
        .select(F.col("id").cast("int").alias("tile_x"))
        .crossJoin(
            spark.range(-90, 90).select(F.col("id").cast("int").alias("tile_y"))
        )
        .select(
            "tile_x",
            "tile_y",
            F.col("tile_x").cast("double").alias("min_lon"),
            F.col("tile_y").cast("double").alias("min_lat"),
            (F.col("tile_x") * SRTM_TS).cast("bigint").alias("min_cell_x"),
            (F.col("tile_y") * SRTM_TS).cast("bigint").alias("min_cell_y"),
        )
    )
    return assigned.join(F.broadcast(dim), on=["tile_x", "tile_y"], how="inner").select(
        "tile_x", "tile_y", "tile_name", "n_events",
        "min_lon", "min_lat", "min_cell_x", "min_cell_y",
    )


SQL_TILE_METADATA_JOIN = f"""
with pts as ({_PTS_SQL}),
assigned as (
  select cast(floor(lon) as int) as tile_x,
         cast(floor(lat) as int) as tile_y,
         {tile_name_sql('cast(floor(lon) as int)', 'cast(floor(lat) as int)')} as tile_name,
         cast(count(*) as bigint) as n_events
  from pts group by 1, 2, 3
),
dim as (
  select cast(x.tile_x as int) as tile_x, cast(y.tile_y as int) as tile_y,
         cast(x.tile_x as double) as min_lon, cast(y.tile_y as double) as min_lat,
         cast(x.tile_x * {SRTM_TS} as bigint) as min_cell_x,
         cast(y.tile_y * {SRTM_TS} as bigint) as min_cell_y
  from (select unnest(generate_series(-180, 179)) as tile_x) x,
       (select unnest(generate_series(-90, 89)) as tile_y) y
)
select a.tile_x, a.tile_y, a.tile_name, a.n_events,
       d.min_lon, d.min_lat, d.min_cell_x, d.min_cell_y
from assigned a join dim d on a.tile_x = d.tile_x and a.tile_y = d.tile_y
"""


# --- TPC-H-style relational ---------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
select l_returnflag, l_linestatus,
  cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty,
  cast(sum(cast(l_extendedprice as decimal(18,2))) as double) as sum_base_price,
  cast(sum(cast(l_extendedprice as decimal(18,2)) *
           (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))) as double)
    as sum_disc_price,
  cast(count(*) as bigint) as count_order
from lineitem
where l_shipdate <= timestamp '1998-09-01'
group by l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_TOP_REVENUE_ORDERS = """
select o_orderkey, o_orderpriority,
  cast(sum(cast(l_extendedprice as decimal(18,2)) *
           (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))) as double)
    as revenue
from customer
join orders on c_custkey = o_custkey
join lineitem on o_orderkey = l_orderkey
where c_mktsegment = 'BUILDING'
group by o_orderkey, o_orderpriority
order by revenue desc, o_orderkey asc
limit 10
"""


def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .join(cust, nation.n_nationkey == cust.c_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


SQL_REGION_ROLLUP = """
select r_name, n_name,
  cast(count(*) as bigint) as n_orders,
  cast(sum(cast(o_totalprice as decimal(18,2))) as double) as total_price
from region
join nation on r_regionkey = n_regionkey
join customer on n_nationkey = c_nationkey
join orders on c_custkey = o_custkey
group by r_name, n_name
"""


# --- SQL windows over events (engine extras, SURVEY.md §2.5) ------------------

def q_events_top_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("event_type").alias("first_event_type"),
        )
    )


SQL_EVENTS_TOP_EVENT = """
select user_id, event_id as first_event_id, event_type as first_event_type
from (
  select user_id, event_id, event_type,
         row_number() over (partition by user_id order by ts asc, event_id asc) as rn
  from events
) t where rn = 1
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (watermark/session-window analogue)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        # ts is TIMESTAMP_NTZ in the parquet; session tz is pinned to UTC
        # (session.py) so this cast matches DuckDB's naive epoch_us()
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_us"), F.asc("event_id"))
    gap = F.col("ts_us") - F.lag("ts_us", 1).over(w)
    new_session = F.when(gap.isNull() | (gap > 3_600_000_000), 1).otherwise(0)
    sessions = ev.withColumn("new_s", new_session).withColumn(
        "session_id", F.sum("new_s").over(w)
    )
    return sessions.groupBy("user_id").agg(
        F.max("session_id").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


SQL_EVENTS_SESSIONIZE = """
with ev as (
  select user_id, event_id, epoch_us(ts) as ts_us from events
),
flagged as (
  select user_id, event_id, ts_us,
    case when lag(ts_us) over w is null
           or ts_us - lag(ts_us) over w > 3600000000 then 1 else 0 end as new_s
  from ev
  window w as (partition by user_id order by ts_us asc, event_id asc)
),
sess as (
  select user_id,
         sum(new_s) over (partition by user_id order by ts_us asc, event_id asc
                          rows unbounded preceding) as session_id
  from flagged
)
select user_id, cast(max(session_id) as bigint) as n_sessions,
       cast(count(*) as bigint) as n_events
from sess group by user_id
"""


# --- dedup + text analysis over documents -------------------------------------

def _words(col: str = "text"):
    return F.filter(F.split(F.col(col), " "), lambda x: x != "")


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc"),
        )
    )


SQL_DOC_EXACT_DEDUP = """
select md5(text) as text_hash,
       cast(count(*) as bigint) as n_copies,
       cast(min(doc_id) as bigint) as canonical_doc
from documents
group by 1
"""

_STOPWORDS = ("the", "a", "and", "of", "to")


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = _words()
    n_tokens = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    stop = F.size(F.filter(words, lambda x: x.isin(*_STOPWORDS)))
    subtokens = F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0))
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_distinct.cast("bigint").alias("n_distinct_tokens"),
        subtokens.cast("bigint").alias("n_subtokens"),
        F.round(stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
    )


SQL_DOC_TOKEN_STATS = f"""
with w as (
  select doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') as words
  from documents
)
select cast(doc_id as bigint) as doc_id,
  cast(length(text) as bigint) as n_chars,
  cast(len(words) as bigint) as n_tokens,
  cast(len(list_distinct(words)) as bigint) as n_distinct_tokens,
  cast(len(regexp_extract_all(text, '[a-z0-9]+')) as bigint) as n_subtokens,
  round(cast(len(list_filter(words, x -> x in {_STOPWORDS!r})) as double)
        / len(words), 6) as stopword_ratio
from w
"""


def q_doc_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language id + quality score (lexical diversity bands)."""
    stats = q_doc_token_stats(spark, sf_dir)
    quality = F.round(
        F.col("n_distinct_tokens").cast("double") / F.col("n_tokens"), 6
    )
    lang_guess = F.when(F.col("stopword_ratio") >= 0.05, F.lit("en")).otherwise(
        F.lit("unknown")
    )
    return stats.select(
        "doc_id",
        quality.alias("quality"),
        lang_guess.alias("lang_guess"),
        (F.col("n_chars") >= 100).cast("boolean").alias("long_enough"),
    )


SQL_DOC_LANG_QUALITY = f"""
with w as (
  select doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') as words
  from documents
),
stats as (
  select doc_id,
    length(text) as n_chars,
    len(words) as n_tokens,
    len(list_distinct(words)) as n_distinct_tokens,
    round(cast(len(list_filter(words, x -> x in {_STOPWORDS!r})) as double)
          / len(words), 6) as stopword_ratio
  from w
)
select cast(doc_id as bigint) as doc_id,
  round(cast(n_distinct_tokens as double) / n_tokens, 6) as quality,
  case when stopword_ratio >= 0.05 then 'en' else 'unknown' end as lang_guess,
  n_chars >= 100 as long_enough
from stats
"""


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction plus
    the mass of the single most frequent word / bigram per doc — the
    quality filters that catch boilerplate and degenerate repetition
    in web corpora (top-n-gram fraction thresholds).

    Distributed shape: two hash-agg passes over exploded tokens (each
    with map-side partial counts — the per-(doc, gram) key space is
    what crosses the wire, not the text), joined back to the per-doc
    base on doc_id.  One-word docs have no bigrams: NULL fraction in
    both engines (double x/0 → NULL with ANSI off, matching DuckDB).
    """
    docs = _t(spark, sf_dir, "documents")
    words = _words()
    base = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        words.alias("words"),
    ).select(
        "doc_id",
        "words",
        F.size("words").alias("n_words"),
        F.size(F.array_distinct("words")).alias("n_distinct"),
    )
    tok = base.select("doc_id", F.explode("words").alias("word"))
    top_word = (
        tok.groupBy("doc_id", "word")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_word_n"))
    )
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice(F.col("words"), 1, F.size("words") - 1),
                lambda x, i: F.concat(
                    x, F.lit(" "), F.element_at(F.col("words"), i + 2)
                ),
            )
        ).alias("bigram"),
    )
    top_bigram = (
        bigrams.groupBy("doc_id", "bigram")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bigram_n"))
    )
    return (
        base.join(top_word, "doc_id", "left")
        .join(top_bigram, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.round(
                F.lit(1.0)
                - F.col("n_distinct").cast("double") / F.col("n_words"),
                6,
            ).alias("dup_word_frac"),
            F.round(
                F.col("top_word_n").cast("double") / F.col("n_words"), 6
            ).alias("top_word_frac"),
            F.round(
                F.col("top_bigram_n").cast("double")
                / (F.col("n_words") - 1).cast("double"),
                6,
            ).alias("top_bigram_frac"),
        )
    )


SQL_DOC_REPETITION = """
with w as (
  select cast(doc_id as bigint) as doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') as words
  from documents
),
base as (
  select doc_id, words, len(words) as n_words,
         len(list_distinct(words)) as n_distinct
  from w
),
tok as (
  select doc_id, unnest(words) as word,
         generate_subscripts(words, 1) as pos
  from w
),
top_word as (
  select doc_id, max(n) as top_word_n
  from (select doc_id, word, count(*) as n from tok group by 1, 2)
  group by doc_id
),
big as (
  select a.doc_id, a.word || ' ' || b.word as bigram
  from tok a join tok b on b.doc_id = a.doc_id and b.pos = a.pos + 1
),
top_bigram as (
  select doc_id, max(n) as top_bigram_n
  from (select doc_id, bigram, count(*) as n from big group by 1, 2)
  group by doc_id
)
select base.doc_id,
  cast(n_words as bigint) as n_words,
  round(1.0 - cast(n_distinct as double) / n_words, 6) as dup_word_frac,
  round(cast(top_word_n as double) / n_words, 6) as top_word_frac,
  round(cast(top_bigram_n as double) / nullif(n_words - 1, 0), 6)
    as top_bigram_frac
from base
left join top_word using (doc_id)
left join top_bigram using (doc_id)
"""

_MINHASH_K = 4


def _word_hash(word_col, salt: int):
    """Shared md5-based word hash: first 8 hex chars of md5('{w}#{salt}')."""
    return F.conv(
        F.substring(F.md5(F.concat(word_col, F.lit(f"#{salt}"))), 1, 8), 16, 10
    ).cast("bigint")


def q_doc_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = F.array_distinct(_words())
    def hasher(salt: int):
        # single-parameter lambda: a 2-arg lambda would be interpreted by
        # pyspark as an (element, index) transform and hash the wrong salt
        return lambda w: _word_hash(w, salt)

    cols = [F.col("doc_id").cast("bigint").alias("doc_id")]
    for k in range(_MINHASH_K):
        cols.append(F.array_min(F.transform(words, hasher(k))).alias(f"mh{k}"))
    return docs.select(*cols)


def _sql_word_hash(expr: str, salt: int) -> str:
    return f"cast(('0x' || substr(md5({expr} || '#{salt}'), 1, 8)) as bigint)"


SQL_DOC_MINHASH = f"""
with w as (
  select doc_id,
         list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) as words
  from documents
)
select cast(doc_id as bigint) as doc_id,
  {", ".join(
    f"list_aggregate(list_transform(words, x -> {_sql_word_hash('x', k)}), 'min') as mh{k}"
    for k in range(_MINHASH_K)
  )}
from w
"""


# --- multi-band MinHash LSH --------------------------------------------------
#
# b×r banding (8 bands × 2 rows = 16 permutations): a candidate pair only
# needs the two minhashes of ONE band to agree, so candidate probability is
# 1-(1-s²)^8 — ≥0.995 at Jaccard 0.7, ≈0.90 at 0.5 — versus s⁴ for the
# round-1 single-band scheme (0.24 at s=0.7).  Permutations are affine maps
# (a_k·h+b_k) mod P over ONE md5 base hash per word: codegen-friendly
# integer arithmetic instead of k salted md5 passes, identical on the
# DuckDB oracle side.  P = 2^31-1 keeps (h mod P)·a_k + b_k < 2^62 (no
# int64 overflow in either engine).

_MH_P = 2147483647  # 2^31 - 1 (Mersenne prime)
_MH_BANDS = 8
_MH_ROWS = 2
_MINHASH_PERMS = _MH_BANDS * _MH_ROWS


def _mh_params() -> list[tuple[int, int]]:
    """Deterministic (a_k, b_k) affine-permutation constants via a fixed
    LCG walk (no runtime randomness; embedded verbatim in the SQL twins)."""
    out, x = [], 0x5DEECE66D
    for _ in range(_MINHASH_PERMS):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = x % (_MH_P - 1) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % _MH_P
        out.append((a, b))
    return out


_MH_AB = _mh_params()


def _minhash_signatures(exploded: DataFrame, set_name: str) -> DataFrame:
    """(doc_id, h) rows → per-doc sorted hashed set + 16 affine minhashes.

    explode → codegen projection → hash-aggregate: the one md5 per
    element runs inside whole-stage codegen; the 16 permutations are
    min-aggregates over cheap integer maps.
    """
    hashed = exploded.withColumn("hp", F.col("h") % F.lit(_MH_P))
    return hashed.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("h")).alias(set_name),
        *[
            F.min((F.col("hp") * F.lit(a) + F.lit(b)) % F.lit(_MH_P)).alias(
                f"mh{k}"
            )
            for k, (a, b) in enumerate(_MH_AB)
        ],
    )


def _doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc multi-band MinHash signature + hashed word-set.

    The word set is hashed once to a sorted distinct int array
    (``hwords``) so exact-Jaccard verification intersects ints, never
    strings."""
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    exploded = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(F.array_distinct(_words())).alias("word"),
    ).select("doc_id", _word_hash(F.col("word"), 0).alias("h"))
    return _minhash_signatures(exploded, "hwords")


def _lsh_band_rows(sig: DataFrame) -> DataFrame:
    """Explode a signature into (doc_id, band, k1, k2) band-key rows."""
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.col(f"mh{_MH_ROWS * i}").alias("k1"),
                F.col(f"mh{_MH_ROWS * i + 1}").alias("k2"),
            )
            for i in range(_MH_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.band", "b.k1", "b.k2"
    )


def _lsh_candidates(sig: DataFrame) -> DataFrame:
    """Band-bucket equi-join → distinct candidate pairs.

    Only (doc_id, band-key) rows cross the band shuffle — the hashed
    word sets do NOT ride the 8-way band explosion (at scale that would
    octuple shuffle volume); verification fetches them by two equi-joins
    in ``_verified_pairs``."""
    bands = _lsh_band_rows(sig)
    return (
        bands.alias("a")
        .join(bands.alias("b"), on=["band", "k1", "k2"], how="inner")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def _verified_pairs(sig: DataFrame, set_col: str) -> DataFrame:
    """Candidates + exact overlap stats (i, na, nb) from the hashed sets."""
    cand = _lsh_candidates(sig)
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col(set_col).alias("wa"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col(set_col).alias("wb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("wa", "wb")).alias("i"),
            F.size("wa").alias("na"),
            F.size("wb").alias("nb"),
        )
    )


def q_doc_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-band MinHash-LSH near-dup pairs verified by exact Jaccard.

    Pipeline: signature (16 affine minhashes over md5 word hashes) →
    8-band bucket equi-join → distinct candidates → exact-Jaccard verify
    via two signature joins.  The ≥0.5 threshold is the exact integer
    test ``2·i ≥ |union|`` (no float boundary ambiguity vs the oracle).
    Candidate recall at the threshold is 1-(1-s²)^8 ≈ 0.90, ≥0.995 at
    s=0.7 — measured per-bucket by ``doc_near_dup_recall``.  For
    duplicate-heavy corpora where even the verified output is quadratic,
    the linear-output form of this operator is ``doc_dedup_clusters``.
    """
    # barrier: sig feeds both band-explosion sides and both verify joins;
    # without it Catalyst re-runs the explode+agg per consumer.
    # localCheckpoint (not persist): eager, lineage-cut, and released by
    # GC when the frame goes unreachable — a long-lived session running
    # many queries does not accumulate CacheManager entries (ADVICE r2).
    sig = _doc_signatures(spark, sf_dir).localCheckpoint()
    pairs = _verified_pairs(sig, "hwords")
    u = F.col("na") + F.col("nb") - F.col("i")
    return pairs.where(F.lit(2) * F.col("i") >= u).select(
        "doc_a",
        "doc_b",
        F.round(F.col("i").cast("double") / u, 6).alias("jaccard"),
    )


def _sql_minhash_exprs(hs_expr: str) -> str:
    """DuckDB twins of the 16 affine minhash aggregates."""
    return ",\n  ".join(
        f"list_aggregate(list_transform({hs_expr}, "
        f"h -> ((h % {_MH_P}) * {a} + {b}) % {_MH_P}), 'min') as mh{k}"
        for k, (a, b) in enumerate(_MH_AB)
    )


_SQL_BANDS = "\n  union all ".join(
    f"select doc_id, {i} as band, mh{_MH_ROWS * i} as k1, "
    f"mh{_MH_ROWS * i + 1} as k2 from sig"
    for i in range(_MH_BANDS)
)

_SQL_DOC_SIGNATURES = f"""
w as (
  select cast(doc_id as bigint) as doc_id,
         list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) as words
  from documents
),
hw as (
  select doc_id, list_transform(words, x -> {_sql_word_hash('x', 0)}) as hs
  from w
),
sig as (
  select doc_id,
  list_sort(list_distinct(hs)) as hwords,
  {_sql_minhash_exprs('hs')}
  from hw
),
bands as (
  {_SQL_BANDS}
),
cand as (
  select distinct a.doc_id as doc_a, b.doc_id as doc_b
  from bands a join bands b using (band, k1, k2)
  where a.doc_id < b.doc_id
),
verified as (
  select c.doc_a, c.doc_b,
         len(list_intersect(sa.hwords, sb.hwords)) as i,
         len(sa.hwords) as na, len(sb.hwords) as nb
  from cand c
  join sig sa on sa.doc_id = c.doc_a
  join sig sb on sb.doc_id = c.doc_b
)"""

SQL_DOC_NEAR_DUP_PAIRS = f"""
with {_SQL_DOC_SIGNATURES}
select doc_a, doc_b,
       round(cast(i as double) / (na + nb - i), 6) as jaccard
from verified
where 2 * i >= na + nb - i
"""

_RECALL_SLICE = 200  # bounded all-pairs slice: 200 docs → ≤19900 exact pairs


def q_doc_near_dup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-generation recall of the b×r MinHash LSH versus exact
    all-pairs Jaccard, per similarity bucket, on a bounded doc_id slice.

    The quality gate for ``doc_near_dup_pairs``: exact pairs come from a
    brute-force cross join over ``doc_id < 200`` (bounded, so the
    all-pairs cost stays O(slice²) regardless of corpus size — the same
    shape as ``knn_ivf_recall``); LSH candidates from the identical band
    join the production query uses.  Buckets use exact integer
    cross-multiplication (10·i vs 7·u etc.) so Spark and the oracle can
    never disagree on a float boundary.  Expected recall: ≈0.90 in
    [0.5,0.7), ≥0.995 above 0.7.
    """
    sig = (
        _doc_signatures(spark, sf_dir)
        .where(F.col("doc_id") < _RECALL_SLICE)
        .localCheckpoint()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("hwords").alias("wa"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("hwords").alias("wb"))
    exact = (
        sa.crossJoin(sb)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("wa", "wb")).alias("i"),
            (F.size("wa") + F.size("wb")
             - F.size(F.array_intersect("wa", "wb"))).alias("u"),
        )
        .where(F.lit(2) * F.col("i") >= F.col("u"))
    )
    cand = _lsh_candidates(sig).withColumn("hit", F.lit(1))
    bucket = (
        F.when(F.lit(10) * F.col("i") >= F.lit(9) * F.col("u"), F.lit("j>=0.9"))
        .when(
            F.lit(10) * F.col("i") >= F.lit(7) * F.col("u"),
            F.lit("0.7<=j<0.9"),
        )
        .otherwise(F.lit("0.5<=j<0.7"))
    )
    return (
        exact.join(cand, on=["doc_a", "doc_b"], how="left")
        .select(
            bucket.alias("jaccard_bucket"),
            F.coalesce(F.col("hit"), F.lit(0)).alias("hit"),
        )
        .groupBy("jaccard_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_exact"),
            F.sum("hit").cast("bigint").alias("n_candidates"),
            F.round(F.sum("hit") / F.count("*"), 6).alias("recall"),
        )
    )


SQL_DOC_NEAR_DUP_RECALL = f"""
with {_SQL_DOC_SIGNATURES},
s as (
  select * from sig where doc_id < {_RECALL_SLICE}
),
exact as (
  select a.doc_id as doc_a, b.doc_id as doc_b,
         len(list_intersect(a.hwords, b.hwords)) as i,
         len(a.hwords) + len(b.hwords)
           - len(list_intersect(a.hwords, b.hwords)) as u
  from s a cross join s b
  where a.doc_id < b.doc_id
    and 2 * len(list_intersect(a.hwords, b.hwords))
        >= len(a.hwords) + len(b.hwords)
           - len(list_intersect(a.hwords, b.hwords))
),
hits as (
  select e.i, e.u,
         case when c.doc_a is not null then 1 else 0 end as hit
  from exact e
  left join cand c on c.doc_a = e.doc_a and c.doc_b = e.doc_b
)
select
  case when 10 * i >= 9 * u then 'j>=0.9'
       when 10 * i >= 7 * u then '0.7<=j<0.9'
       else '0.5<=j<0.7' end as jaccard_bucket,
  cast(count(*) as bigint) as n_exact,
  cast(sum(hit) as bigint) as n_candidates,
  round(cast(sum(hit) as double) / count(*), 6) as recall
from hits
group by 1
"""


#: materialized cluster assignments per (application, sf_dir) — the
#: local stand-in for the written clusters table a production pipeline
#: materializes once and every downstream consumer reads (VERDICT r2:
#: without it, doc_dedup_keep_best re-derives the whole LSH + CC
#: pipeline that doc_dedup_clusters just computed)
_CLUSTER_MEMO: dict[tuple[str, str], DataFrame] = {}


def _dedup_clusters_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _CLUSTER_MEMO.get(key)
    if df is None:
        from .graph import connected_components

        pairs = q_doc_near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
        docs = _t(spark, sf_dir, "documents").select(
            F.col("doc_id").cast("bigint").alias("doc")
        )
        labels = connected_components(docs, pairs, "doc", ("doc_a", "doc_b"))
        df = labels.select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
        ).localCheckpoint()
        _CLUSTER_MEMO[key] = df
        if len(_CLUSTER_MEMO) > 8:  # bound driver references across sessions
            _CLUSTER_MEMO.pop(next(iter(_CLUSTER_MEMO)))
    return df


def q_doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the near-dup graph (jaccard >= 0.5):
    every doc labeled with the min doc_id of its component.

    The linear-output companion of ``doc_near_dup_pairs``: on
    duplicate-heavy corpora the pair list is quadratic but the cluster
    assignment stays one row per doc.  Iterative min-label propagation
    with an alternating-star escape hatch (graph.connected_components
    "auto") — the Spark shape of the reference's flood-fill component
    labeling (/root/reference/Demeton/WaterBodies/Coloring.fs:17-182),
    applied to a similarity graph instead of a pixel grid.  The
    assignment is localCheckpoint-materialized once per (session,
    sf_dir) — the local stand-in for the clusters table a production
    dedup pipeline writes once and reads everywhere.
    """
    return _dedup_clusters_materialized(spark, sf_dir)


SQL_DOC_DEDUP_CLUSTERS = f"""
with recursive {_SQL_DOC_SIGNATURES},
pairs as (
  select doc_a, doc_b from verified where 2 * i >= na + nb - i
),
edges as (
  select doc_a as a, doc_b as b from pairs
  union all
  select doc_b as a, doc_a as b from pairs
),
reach(doc, root) as (
  select doc_id, doc_id from w
  union
  select e.b, r.root from reach r join edges e on e.a = r.doc
)
select doc as doc_id, cast(min(root) as bigint) as cluster_id
from reach group by doc
"""


def q_doc_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup family's user-facing finish: one row per near-dup
    cluster with the canonical document to KEEP — highest quality score
    (lexical diversity), doc_id as the deterministic tie-break — plus
    the cluster size.  Composes two oracle-checked queries
    (``doc_dedup_clusters`` × ``doc_lang_quality``) over the
    MATERIALIZED cluster assignment (see ``_dedup_clusters_materialized``),
    so it really is one extra hash-aggregate: at 10^12 docs the cluster
    table is written once and this query reads it.
    """
    clusters = q_doc_dedup_clusters(spark, sf_dir)
    quality = q_doc_lang_quality(spark, sf_dir).select("doc_id", "quality")
    joined = clusters.join(quality, "doc_id")
    best = F.struct(
        F.col("quality"), (-F.col("doc_id")).alias("neg_id")
    )
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.max_by("doc_id", best).alias("keep_id"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.max("quality"), 6).alias("best_quality"),
        )
    )


SQL_DOC_DEDUP_KEEP_BEST = f"""
with recursive {_SQL_DOC_SIGNATURES},
pairs as (
  select doc_a, doc_b from verified where 2 * i >= na + nb - i
),
edges as (
  select doc_a as a, doc_b as b from pairs
  union all
  select doc_b as a, doc_a as b from pairs
),
reach(doc, root) as (
  select doc_id, doc_id from w
  union
  select e.b, r.root from reach r join edges e on e.a = r.doc
),
clusters as (
  select doc as doc_id, cast(min(root) as bigint) as cluster_id
  from reach group by doc
),
quality as (
  select cast(doc_id as bigint) as doc_id,
    round(cast(len(list_distinct(list_filter(string_split(text, ' '),
                                             x -> x <> ''))) as double)
          / len(list_filter(string_split(text, ' '), x -> x <> '')), 6)
      as quality
  from documents
),
ranked as (
  select c.cluster_id, c.doc_id, q.quality,
         row_number() over (partition by c.cluster_id
                            order by q.quality desc, c.doc_id asc) as rn
  from clusters c join quality q using (doc_id)
)
select cluster_id,
       max(case when rn = 1 then doc_id end) as keep_id,
       cast(count(*) as bigint) as n_docs,
       round(max(quality), 6) as best_quality
from ranked
group by cluster_id
"""


def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint from md5-derived word hashes."""
    docs = _t(spark, sf_dir, "documents")
    words = _words()  # keep duplicates: simhash weights by frequency
    exploded = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(words).alias("word"),
    ).select("doc_id", _word_hash(F.col("word"), 0).alias("h"))
    bits = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(16)
    ]
    agg = exploded.groupBy("doc_id").agg(*bits)
    fingerprint = None
    for b in range(16):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return agg.select("doc_id", fingerprint.cast("bigint").alias("simhash"))


SQL_DOC_SIMHASH = f"""
with exploded as (
  select cast(doc_id as bigint) as doc_id,
         unnest(list_filter(string_split(text, ' '), y -> y <> '')) as word
  from documents
),
e as (
  select doc_id, {_sql_word_hash('word', 0)} as h from exploded
),
bits as (
  select doc_id,
  {", ".join(
    f"sum(case when (h >> {b}) & 1 = 1 then 1 else -1 end) as b{b}"
    for b in range(16)
  )}
  from e group by doc_id
)
select doc_id,
  cast({" + ".join(f"case when b{b} > 0 then {1 << b} else 0 end" for b in range(16))}
    as bigint) as simhash
from bits
"""


def q_doc_ngram_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram shingle near-dup: shingle → minhash → band → bucket-join.

    Order-sensitive companion of ``doc_near_dup_pairs`` (word-set Jaccard
    ignores ordering; 3-gram shingles catch reorderings as non-dups).
    Same hashed-set representation: shingles hash to ints once, the band
    self-join carries the arrays, verification intersects ints.
    """
    docs = _t(spark, sf_dir, "documents")
    shingles = F.expr(
        "case when size(ws) < 3 then array(concat_ws(' ', ws)) else "
        "transform(sequence(0, size(ws) - 3), "
        "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) end"
    )

    base = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), _words().alias("ws"))
        .select(F.col("doc_id"), shingles.alias("sh"))
    )
    exploded = base.select(
        "doc_id", F.explode(F.array_distinct("sh")).alias("s")
    ).select("doc_id", _word_hash(F.col("s"), 0).alias("h"))
    # same multi-band machinery as doc_near_dup_pairs, over shingle hashes
    sig = _minhash_signatures(exploded, "hsh").localCheckpoint()
    pairs = _verified_pairs(sig, "hsh")
    u = F.col("na") + F.col("nb") - F.col("i")
    return pairs.where(F.lit(2) * F.col("i") >= u).select(
        "doc_a",
        "doc_b",
        F.round(F.col("i").cast("double") / u, 6).alias("ngram_jaccard"),
    )


SQL_DOC_NGRAM_NEAR_DUP = f"""
with w as (
  select cast(doc_id as bigint) as doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') as ws
  from documents
),
sh as (
  select doc_id,
    case when len(ws) < 3 then [array_to_string(ws, ' ')] else
      list_transform(generate_series(1, len(ws) - 2),
                     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) end as sh
  from w
),
hw as (
  select doc_id,
         list_transform(list_distinct(sh), x -> {_sql_word_hash('x', 0)}) as hs
  from sh
),
sig as (
  select doc_id,
  list_sort(list_distinct(hs)) as hsh,
  {_sql_minhash_exprs('hs')}
  from hw
),
bands as (
  {_SQL_BANDS}
),
cand as (
  select distinct a.doc_id as doc_a, b.doc_id as doc_b
  from bands a join bands b using (band, k1, k2)
  where a.doc_id < b.doc_id
),
verified as (
  select c.doc_a, c.doc_b,
         len(list_intersect(sa.hsh, sb.hsh)) as i,
         len(sa.hsh) as na, len(sb.hsh) as nb
  from cand c
  join sig sa on sa.doc_id = c.doc_a
  join sig sb on sb.doc_id = c.doc_b
)
select doc_a, doc_b,
       round(cast(i as double) / (na + nb - i), 6) as ngram_jaccard
from verified
where 2 * i >= na + nb - i
"""


# --- benchmark decontamination ----------------------------------------------
#
# The training-pipeline op the near-dup family doesn't cover: flag any
# TRAINING document sharing a word-5-gram with any EVAL-BENCHMARK
# document (the standard n-gram-overlap decontamination rule, cf. the
# GPT-3/PaLM appendices).  The benchmark here is a deterministic slice
# of the documents table (doc_id % 41 = 7) so both engines derive it
# from the same parquet.  Scale posture: a REAL eval suite's gram set is
# dimension-sized (~10^7 grams → broadcastable), but this synthetic
# slice is ~1/41 of ALL corpus grams and grows linearly with the table,
# so the join carries NO forced broadcast hint — Spark's size-gated
# planner (autoBroadcastJoinThreshold + AQE runtime re-plan) broadcasts
# while the set is small and falls back to a shuffled hash join above
# the threshold (ADVICE r3).  The corpus side stays one linear explode
# + two doc_id-keyed hash-aggs, no corpus self-join anywhere.

_DECON_N = 5  # words per contamination gram
_DECON_SALT = 101  # distinct from minhash salts 0..15 and shingle salt 0
_DECON_BENCH_MOD, _DECON_BENCH_REM = 41, 7


def _decon_grams_col():
    idx = ", ".join(f"ws[i+{k}]" for k in range(_DECON_N))
    return F.expr(
        f"case when size(ws) < {_DECON_N} then array(concat_ws(' ', ws)) "
        f"else transform(sequence(0, size(ws) - {_DECON_N}), "
        f"i -> concat_ws(' ', {idx})) end"
    )


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs that share ≥1 word-5-gram with the benchmark
    slice; report per-doc gram counts, hit counts, distinct benchmark
    docs hit, and the overlap fraction."""
    docs = _t(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % _DECON_BENCH_MOD == _DECON_BENCH_REM
    g = (
        docs.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            _words().alias("ws"),
        )
        .select("doc_id", F.explode(F.array_distinct(_decon_grams_col())).alias("s"))
        .select("doc_id", _word_hash(F.col("s"), _DECON_SALT).alias("h"))
    )
    bench = (
        g.where(is_bench)
        .select(F.col("doc_id").alias("bench_doc"), "h")
        .distinct()
    )
    train = g.where(~is_bench)
    sizes = train.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        train.join(bench, "h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("h").alias("n_hit_grams"),
            F.countDistinct("bench_doc").alias("n_bench_docs"),
        )
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_grams",
        "n_hit_grams",
        "n_bench_docs",
        F.round(
            F.col("n_hit_grams").cast("double") / F.col("n_grams"), 6
        ).alias("overlap_frac"),
    )


def _sql_decon_grams() -> str:
    cat = " || ' ' || ".join(f"ws[i+{k}]" for k in range(_DECON_N))
    return (
        f"case when len(ws) < {_DECON_N} then [array_to_string(ws, ' ')] "
        f"else list_transform(generate_series(1, len(ws) - {_DECON_N - 1}), "
        f"i -> {cat}) end"
    )


SQL_DOC_DECONTAMINATE = f"""
with w as (
  select cast(doc_id as bigint) as doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') as ws
  from documents
),
g as (
  select doc_id, {_sql_word_hash('x', _DECON_SALT)} as h
  from (select doc_id, unnest(list_distinct({_sql_decon_grams()})) as x from w)
),
bench as (
  select distinct doc_id as bench_doc, h from g
  where doc_id % {_DECON_BENCH_MOD} = {_DECON_BENCH_REM}
),
train as (
  select * from g where doc_id % {_DECON_BENCH_MOD} <> {_DECON_BENCH_REM}
),
sizes as (select doc_id, count(*) as n_grams from train group by 1),
hits as (
  select t.doc_id,
         count(distinct t.h) as n_hit_grams,
         count(distinct b.bench_doc) as n_bench_docs
  from train t join bench b on t.h = b.h
  group by 1
)
select h.doc_id, s.n_grams, h.n_hit_grams, h.n_bench_docs,
       round(cast(h.n_hit_grams as double) / s.n_grams, 6) as overlap_frac
from hits h join sizes s on h.doc_id = s.doc_id
"""


# --- deterministic stratified sampling ---------------------------------------


def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix reweighting: keep a per-source fraction of documents
    through a deterministic hash gate (no RNG state — reproducible
    across runs, engines, and retries, and embarrassingly parallel:
    the gate is a pure projection, so sampling pushes down to the scan
    at any scale).  The per-source rate derives from the source id;
    in production it is the mixing-weight table.  A digitless source
    extracts '' → NULL → rate 0 + base 10 in BOTH engines (ADVICE r3:
    without the coalesce, Spark silently dropped such rows while the
    DuckDB twin's cast('') raised — divergent behavior off-fixture)."""
    docs = _t(spark, sf_dir, "documents")
    srcnum = F.coalesce(
        F.nullif(F.regexp_extract("source", r"(\d+)", 1), F.lit("")).cast(
            "int"
        ),
        F.lit(0),
    )
    rate = F.lit(10) + (srcnum * 7) % 80
    gate = _word_hash(F.col("doc_id").cast("string"), 7) % 100
    return docs.where(gate < rate).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        "lang",
        rate.cast("int").alias("pct"),
    )


_SQL_SRCNUM = r"coalesce(try_cast(regexp_extract(source, '(\d+)', 1) as int), 0)"

SQL_DOC_STRATIFIED_SAMPLE = rf"""
select cast(doc_id as bigint) as doc_id, source, lang,
       cast(10 + ({_SQL_SRCNUM} * 7) % 80 as int) as pct
from documents
where {_sql_word_hash("cast(doc_id as varchar)", 7)} % 100
      < 10 + ({_SQL_SRCNUM} * 7) % 80
"""


# --- exact grouped quantiles --------------------------------------------------


def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation quantiles of event value per type
    (the §2.4 aggregation family's order-statistics member).  Exact
    percentile (sort-based) rather than a sketch so the DuckDB twin
    (quantile_cont) matches to rounding; at 10^12 rows the same query
    swaps in approx_percentile with a disclosed error bound."""
    ev = _t(spark, sf_dir, "events")
    q = F.expr("percentile(value, array(0.25D, 0.5D, 0.75D))")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            q.alias("_q"),
        )
        .select(
            "event_type",
            "n",
            F.round(F.col("_q")[0], 6).alias("p25"),
            F.round(F.col("_q")[1], 6).alias("p50"),
            F.round(F.col("_q")[2], 6).alias("p75"),
        )
    )


SQL_EVENTS_VALUE_QUANTILES = """
select event_type,
       cast(count(*) as bigint) as n,
       round(quantile_cont(value, 0.25), 6) as p25,
       round(quantile_cont(value, 0.5), 6) as p50,
       round(quantile_cont(value, 0.75), 6) as p75
from events
group by event_type
"""


# --- curation filter pipeline ------------------------------------------------
#
# The user-facing finish of the text-curation family: one verdict row
# per document combining the quality, language, repetition,
# contamination, and exact-duplicate signals the individual queries
# compute — the C4/Gopher-style keep/drop decision a training pipeline
# actually applies.  Pure composition of oracle-checked parts: five
# doc_id-keyed joins, no new shuffles beyond the parts themselves.

_FPIPE_MIN_QUALITY = 0.35  # lexical-diversity floor (distinct/total)
_FPIPE_MAX_DUP_FRAC = 0.55  # Gopher duplicate-word-fraction ceiling
_FPIPE_MAX_TOP_WORD = 0.20  # single-word mass ceiling


def q_doc_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    quality = q_doc_lang_quality(spark, sf_dir)
    rep = q_doc_repetition(spark, sf_dir).select(
        "doc_id", "dup_word_frac", "top_word_frac"
    )
    contaminated = q_doc_decontaminate(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("_cont")
    )
    canon = (
        _t(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("_th"))
        .agg(F.min("doc_id").cast("bigint").alias("_keep"))
    )
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.md5("text").alias("_th"),
    )
    j = (
        docs.join(quality, "doc_id")
        .join(rep, "doc_id")
        .join(contaminated, "doc_id", "left")
        .join(canon, "_th")
    )
    fail_short = ~F.col("long_enough")
    fail_lang = F.col("lang_guess") != "en"
    fail_quality = F.col("quality") < _FPIPE_MIN_QUALITY
    fail_rep = (
        F.coalesce(F.col("dup_word_frac"), F.lit(0.0)) > _FPIPE_MAX_DUP_FRAC
    ) | (F.coalesce(F.col("top_word_frac"), F.lit(0.0)) > _FPIPE_MAX_TOP_WORD)
    fail_cont = F.coalesce(F.col("_cont"), F.lit(False))
    fail_dup = F.col("doc_id") != F.col("_keep")
    # the eval-benchmark slice itself must never reach training:
    # q_doc_decontaminate only flags TRAINING docs that overlap the
    # benchmark, so without this flag benchmark docs sail through with
    # keep=true and the composed verdict would train on the eval set
    # (ADVICE r3)
    fail_bench = (
        F.col("doc_id") % _DECON_BENCH_MOD == _DECON_BENCH_REM
    )
    keep = ~(
        fail_short | fail_lang | fail_quality | fail_rep | fail_cont
        | fail_dup | fail_bench
    )
    return j.select(
        "doc_id",
        keep.alias("keep"),
        fail_short.alias("fail_short"),
        fail_lang.alias("fail_lang"),
        fail_quality.alias("fail_quality"),
        fail_rep.alias("fail_repetition"),
        fail_cont.alias("fail_contaminated"),
        fail_dup.alias("fail_duplicate"),
        fail_bench.alias("fail_benchmark"),
    )


SQL_DOC_FILTER_PIPELINE = f"""
with q as ({{Q}}),
r as ({{R}}),
c as ({{C}}),
canon as (
  select md5(text) as th, cast(min(doc_id) as bigint) as keep_id
  from documents group by 1
),
d as (
  select cast(doc_id as bigint) as doc_id, md5(text) as th from documents
),
flags as (
  select d.doc_id,
    not q.long_enough as fail_short,
    q.lang_guess <> 'en' as fail_lang,
    q.quality < {_FPIPE_MIN_QUALITY} as fail_quality,
    coalesce(r.dup_word_frac, 0.0) > {_FPIPE_MAX_DUP_FRAC}
      or coalesce(r.top_word_frac, 0.0) > {_FPIPE_MAX_TOP_WORD}
      as fail_repetition,
    c.doc_id is not null as fail_contaminated,
    d.doc_id <> canon.keep_id as fail_duplicate,
    d.doc_id % {_DECON_BENCH_MOD} = {_DECON_BENCH_REM} as fail_benchmark
  from d
  join q on q.doc_id = d.doc_id
  join r on r.doc_id = d.doc_id
  left join c on c.doc_id = d.doc_id
  join canon on canon.th = d.th
)
select doc_id,
       not (fail_short or fail_lang or fail_quality or fail_repetition
            or fail_contaminated or fail_duplicate or fail_benchmark) as keep,
       fail_short, fail_lang, fail_quality, fail_repetition,
       fail_contaminated, fail_duplicate, fail_benchmark
from flags
"""

SQL_DOC_FILTER_PIPELINE = SQL_DOC_FILTER_PIPELINE.format(
    Q=SQL_DOC_LANG_QUALITY, R=SQL_DOC_REPETITION, C=SQL_DOC_DECONTAMINATE
)


_FP_K = 8  # k-gram length (chars)
_FP_W = 4  # winnowing guarantee window (grams)
_FP_B = 257
_FP_P = 1_000_000_007  # hashes < P; P doubles as the +inf sentinel


def _fp_gram_hash_sql(pos_expr: str) -> str:
    """DuckDB nested-Horner polynomial k-gram hash starting at
    ``pos_expr`` (1-based), 0-padded past the end of text; intermediates
    stay below P·B+255 < 2.6e11 (no int64 overflow)."""
    e = "cast(0 as bigint)"
    for j in range(_FP_K):
        c = (
            f"case when {pos_expr} + {j} <= length(text) then "
            f"ord(substr(text, cast({pos_expr} + {j} as int), 1)) "
            f"else 0 end"
        )
        e = f"((({e}) * {_FP_B} + {c}) % {_FP_P})"
    return e


def winnow_fingerprints(texts: list[str]):
    """Vectorized winnowing (Schleimer–Wilkerson–Aiken) over a batch.

    Concatenates all docs (each padded with k-1 zero codepoints) into
    one array, computes every polynomial k-gram hash with 8 shifted
    multiply-adds, takes the w-window rolling min with the P sentinel
    masking pad slots (≥ k-1 ≥ w-1 sentinels separate consecutive docs,
    so windows never bleed across documents), then segment-reduces per
    doc.  ~a dozen numpy passes over the bytes regardless of document
    count — no per-window md5, no O(pos) substring walks.

    Returns int64 arrays (fp_min, fp_max, n_fp, n_grams), one entry per
    doc: min/max/distinct-count of the selected fingerprint set plus
    the k-gram count.
    """
    import numpy as np

    pad = _FP_K - 1
    n_docs = len(texts)
    lens = np.fromiter(map(len, texts), dtype=np.int64, count=n_docs)
    n_grams = np.maximum(1, lens - pad)
    # width ≥ k so even an empty doc's single gram reads only its own
    # pad slots, never the next doc's first codepoint
    widths = np.maximum(lens, 1) + pad
    offs = np.concatenate(([0], np.cumsum(widths)))[:-1]
    total = int(widths.sum())
    # one batch-wide encode: the zero codepoints padding each doc double
    # as the inter-doc separator (no per-doc numpy round-trips)
    zeros = "\x00" * pad
    big = "".join((t if t else "\x00") + zeros for t in texts) + "\x00" * _FP_K
    # int64 upcast matters: a uint32 array times an int64 *scalar* stays
    # uint32 under legacy promotion and silently wraps
    cps = np.frombuffer(big.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    pw = np.empty(_FP_K, dtype=np.int64)
    pw[_FP_K - 1] = 1
    for j in range(_FP_K - 2, -1, -1):
        pw[j] = (pw[j + 1] * _FP_B) % _FP_P
    acc = np.zeros(total, dtype=np.int64)
    for j in range(_FP_K):
        acc += cps[j : j + total] * pw[j]
    rel = np.arange(total, dtype=np.int64) - np.repeat(offs, widths)
    ng_rep = np.repeat(n_grams, widths)
    valid = rel < ng_rep
    H = np.where(valid, acc % _FP_P, _FP_P)  # sentinel at pad slots
    Hp = np.concatenate([np.full(_FP_W - 1, _FP_P, np.int64), H])
    W = Hp[_FP_W - 1 :].copy()
    for j in range(1, _FP_W):
        np.minimum(W, Hp[_FP_W - 1 - j : len(Hp) - j], out=W)
    # winnowing windows end at gram min(w, n_grams)-1 .. n_grams-1
    ends_mask = valid & (rel >= np.minimum(_FP_W, ng_rep) - 1)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), widths)
    sel_doc = doc_idx[ends_mask]
    sel_w = W[ends_mask]
    counts = np.bincount(sel_doc, minlength=n_docs)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    fp_min = np.minimum.reduceat(sel_w, starts)
    fp_max = np.maximum.reduceat(sel_w, starts)
    uniq = np.unique(sel_doc * (1 << 31) + sel_w)  # sel_w < P < 2^31
    n_fp = np.bincount(uniq >> 31, minlength=n_docs)
    return fp_min, fp_max, n_fp.astype(np.int64), n_grams


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprint (Schleimer–Wilkerson–Aiken):
    polynomial k-gram hashes (k=8), window-min selection over w=4
    consecutive grams, aggregated to (min, max, count-distinct) of the
    selected fingerprint set plus the gram count.

    Replaces the round-1 md5-per-window sketch (VERDICT weak #2), and
    the winnowing guarantee (≥1 fingerprint per w consecutive grams,
    density ~2/(w+1)) makes the sketch a real shift-tolerant match key.
    The kernel is an Arrow-batched mapInPandas (``winnow_fingerprints``)
    rather than pure Catalyst: the expression form needs
    ``substring(text, p, 1)`` which costs O(p) per call (UTF8String
    walks codepoints), going quadratic per doc — the vectorized kernel
    is O(bytes), and the whole operator needs NO shuffle at all (the
    per-doc aggregate happens inside the batch).  The DuckDB twin
    computes the identical polynomial/window-min in SQL.
    """
    import pandas as pd

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text"
    )

    def run(batches):
        for pdf in batches:
            fp_min, fp_max, n_fp, n_grams = winnow_fingerprints(
                pdf["text"].fillna("").tolist()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "fp_min": fp_min,
                    "fp_max": fp_max,
                    "n_fp": n_fp,
                    "n_grams": n_grams,
                }
            )

    return docs.mapInPandas(
        run,
        schema="doc_id long, fp_min long, fp_max long, n_fp long, n_grams long",
    )


SQL_DOC_FINGERPRINT = f"""
with d as (
  select cast(doc_id as bigint) as doc_id, text,
         greatest(1, length(text) - {_FP_K - 1}) as n_grams
  from documents
),
ends as (
  select doc_id, text, n_grams,
         unnest(generate_series(least({_FP_W}, n_grams), n_grams)) as p
  from d
),
wm as (
  select doc_id, n_grams,
    least({", ".join(
        f"case when p - {j} >= 1 then "
        f"{_fp_gram_hash_sql(f'(p - {j})')} "
        f"else {_FP_P} end"
        for j in range(_FP_W)
    )}) as wmin
  from ends
)
select doc_id, min(wmin) as fp_min, max(wmin) as fp_max,
       cast(count(distinct wmin) as bigint) as n_fp,
       cast(min(n_grams) as bigint) as n_grams
from wm group by doc_id
"""


# --- similarity search over embeddings -----------------------------------------

def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 for probe vectors (vec_id < 5).

    Dot products in double via zip_with + aggregate (JVM-side higher-order
    functions — no Python in the loop); rounded before ranking so the
    DuckDB oracle agrees bit-for-bit.
    """
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    with_norm = emb.select(
        "vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("norm")
    )
    probes = with_norm.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        probes.crossJoin(with_norm.select("vec_id", "v", "norm"))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int"))
    )


SQL_KNN_BRUTEFORCE = """
with emb as (
  select cast(vec_id as bigint) as vec_id,
         list_transform(embedding, x -> cast(x as double)) as v
  from embeddings
),
normed as (
  select vec_id, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) as norm
  from emb
),
scored as (
  select q.vec_id as query_id, n.vec_id as neighbor_id,
    round(list_dot_product(q.v, n.v) / (q.norm * n.norm), 6) as cosine
  from normed q, normed n
  where q.vec_id < 5 and n.vec_id <> q.vec_id
),
ranked as (
  select query_id, neighbor_id, cosine,
         row_number() over (partition by query_id
                            order by cosine desc, neighbor_id asc) as rank
  from scored
)
select query_id, neighbor_id, cosine, cast(rank as int) as rank
from ranked where rank <= 3
"""


def _dot(a, b):
    """JVM-side dot product via zip_with + sequential fold (deterministic
    accumulation order — matches DuckDB's list_dot_product bit-for-bit)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _normed_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    bucket = None
    for i in range(8):
        bit = F.when(F.col("v")[i] > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return emb.select(
        "vec_id",
        "v",
        F.sqrt(_dot(F.col("v"), F.col("v"))).alias("norm"),
        bucket.cast("int").alias("bucket"),
    )


_SQL_NORMED_EMB = """
normed as (
  select cast(vec_id as bigint) as vec_id,
         list_transform(embedding, x -> cast(x as double)) as v,
         sqrt(list_dot_product(list_transform(embedding, x -> cast(x as double)),
                               list_transform(embedding, x -> cast(x as double)))) as norm,
         cast({bucket} as int) as bucket
  from embeddings
)""".format(
    bucket=" + ".join(
        f"(case when embedding[{i + 1}] > 0 then {1 << i} else 0 end)"
        for i in range(8)
    )
)


# --- multiband hyperplane LSH over embeddings -------------------------------
#
# 10 bands × 3 sign bits (dims 0..29 as the hyperplanes): a candidate
# pair only needs one band's 3 sign bits to agree, so candidate
# probability at cosine s is 1-(1-p³)^10 with p = 1-θ(s)/π — ≈0.91 at
# s=0.3, ≈0.94 at s=0.4, →1 for true duplicates — versus p⁸ ≈ 0.03 for
# the round-1 single 8-bit band.  Band length trades candidate volume
# for recall: short bands cost more candidate pairs on near-uniform
# data but stay output-sensitive on real clustered-duplicate corpora;
# `emb_near_dup_recall` measures the operating point per bucket.

_EMB_BANDS = 10
_EMB_BAND_BITS = 3


def _emb_band_rows(normed: DataFrame) -> DataFrame:
    bands = []
    for b in range(_EMB_BANDS):
        bk = None
        for j in range(_EMB_BAND_BITS):
            i = b * _EMB_BAND_BITS + j
            bit = F.when(F.col("v")[i] > 0, F.lit(1 << j)).otherwise(F.lit(0))
            bk = bit if bk is None else bk + bit
        bands.append(
            F.struct(F.lit(b).alias("band"), bk.cast("int").alias("bk"))
        )
    return normed.select(
        "vec_id", F.explode(F.array(*bands)).alias("s")
    ).select("vec_id", "s.band", "s.bk")


def _emb_candidates(normed: DataFrame) -> DataFrame:
    br = _emb_band_rows(normed)
    return (
        br.alias("a")
        .join(br.alias("b"), on=["band", "bk"], how="inner")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .distinct()
    )


def _emb_verified(normed: DataFrame) -> DataFrame:
    """Candidates + exact cosine from two equi-joins back to the
    normalized vectors (vectors don't ride the 10-way band explosion)."""
    cand = _emb_candidates(normed)
    sa = normed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("norm_a"),
    )
    sb = normed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("norm_b"),
    )
    return (
        cand.join(sa, "vec_a")
        .join(sb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (F.col("norm_a") * F.col("norm_b")),
                6,
            ).alias("cosine"),
        )
    )


def q_emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicates via multiband hyperplane LSH
    (10 bands × 3 sign bits), exact-cosine verified at ≥ 0.4 (the
    synthetic embeddings are near-orthogonal; the threshold sits just
    under the max observed similarity).  The band equi-join prunes the
    O(n²) cross product — the scale path for pairwise similarity over
    10^9 embeddings; `emb_near_dup_recall` is the quality gate."""
    normed = _normed_emb(spark, sf_dir).localCheckpoint()
    return _emb_verified(normed).where(F.col("cosine") >= 0.4)


def _sql_emb_band_expr(b: int) -> str:
    return " + ".join(
        f"(case when embedding[{b * _EMB_BAND_BITS + j + 1}] > 0 "
        f"then {1 << j} else 0 end)"
        for j in range(_EMB_BAND_BITS)
    )


_SQL_EMB_BANDS = "\n  union all ".join(
    f"select cast(vec_id as bigint) as vec_id, {b} as band, "
    f"cast({_sql_emb_band_expr(b)} as int) as bk from embeddings"
    for b in range(_EMB_BANDS)
)

_SQL_EMB_VERIFIED = f"""
bands as (
  {_SQL_EMB_BANDS}
),
cand as (
  select distinct a.vec_id as vec_a, b.vec_id as vec_b
  from bands a join bands b using (band, bk)
  where a.vec_id < b.vec_id
),
verified as (
  select c.vec_a, c.vec_b,
         round(list_dot_product(na.v, nb.v) / (na.norm * nb.norm), 6)
           as cosine
  from cand c
  join normed na on na.vec_id = c.vec_a
  join normed nb on nb.vec_id = c.vec_b
)"""

SQL_EMB_NEAR_DUP_PAIRS = f"""
with {_SQL_NORMED_EMB},
{_SQL_EMB_VERIFIED}
select vec_a, vec_b, cosine from verified where cosine >= 0.4
"""

_EMB_CLUSTER_MEMO: dict[tuple, DataFrame] = {}


def _emb_snapshot(sf_dir: str) -> tuple:
    """Data-change token for the cluster memo: (mtime_ns, size) of the
    embeddings parquet (recursed one level for directory layouts).
    ADVICE r3: keying only on (applicationId, sf_dir) returned stale
    clusters if the parquet was rewritten within a session."""
    import os as _os

    path = _os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = _os.stat(path)
        if _os.path.isdir(path):
            parts = []
            for name in sorted(_os.listdir(path)):
                ps = _os.stat(_os.path.join(path, name))
                parts.append((name, ps.st_mtime_ns, ps.st_size))
            return tuple(parts)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return ("missing",)


def q_emb_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive embedding-dedup clusters: connected components over
    the LSH-verified cosine pairs — the embedding twin of
    ``doc_dedup_clusters`` (semantic near-dups chain A~B~C into one
    cluster even when cos(A,C) falls below threshold).  Same linear
    cluster-table output, the alternating-star CC bound applies, and
    the assignment is localCheckpoint-materialized once per (session,
    sf_dir) — the local stand-in for the written cluster table every
    consumer reads at production scale."""
    key = (spark.sparkContext.applicationId, sf_dir, _emb_snapshot(sf_dir))
    df = _EMB_CLUSTER_MEMO.get(key)
    if df is None:
        from demeton_spark.graph import connected_components

        normed = _normed_emb(spark, sf_dir).localCheckpoint()
        pairs = _emb_verified(normed).where(F.col("cosine") >= 0.4)
        nodes = normed.select(F.col("vec_id").alias("node"))
        cc = connected_components(
            nodes, pairs.select("vec_a", "vec_b"), "node", ("vec_a", "vec_b")
        )
        df = cc.select(
            F.col("node").cast("bigint").alias("vec_id"),
            F.col("label").cast("bigint").alias("cluster_id"),
        ).localCheckpoint()
        _EMB_CLUSTER_MEMO[key] = df
        if len(_EMB_CLUSTER_MEMO) > 8:
            # drop the oldest entry's reference and collect NOW so the
            # ContextCleaner reclaims its localCheckpoint RDD blocks
            # promptly instead of whenever Python GC next runs
            _EMB_CLUSTER_MEMO.pop(next(iter(_EMB_CLUSTER_MEMO)))
            import gc as _gc

            _gc.collect()
    return df


SQL_EMB_DEDUP_CLUSTERS = f"""
with recursive {_SQL_NORMED_EMB},
{_SQL_EMB_VERIFIED},
pairs as (select vec_a, vec_b from verified where cosine >= 0.4),
edges as (
  select vec_a as a, vec_b as b from pairs
  union all
  select vec_b as a, vec_a as b from pairs
),
reach(node, root) as (
  select cast(vec_id as bigint), cast(vec_id as bigint) from embeddings
  union
  select e.b, r.root from reach r join edges e on e.a = r.node
)
select node as vec_id, cast(min(root) as bigint) as cluster_id
from reach group by node
"""


_EMB_RECALL_SLICE = 500


def q_emb_near_dup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-generation recall of the multiband hyperplane LSH vs
    exact all-pairs cosine on a bounded vec_id slice, per similarity
    bucket — the embedding twin of ``doc_near_dup_recall``.  Cosines
    are identical doubles on both engines (same sequential dot-product
    fold), so plain threshold comparisons are deterministic."""
    normed = (
        _normed_emb(spark, sf_dir)
        .where(F.col("vec_id") < _EMB_RECALL_SLICE)
        .localCheckpoint()
    )
    sa = normed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("norm_a"),
    )
    sb = normed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("norm_b"),
    )
    exact = (
        sa.crossJoin(sb)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (F.col("norm_a") * F.col("norm_b")),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.3)
    )
    cand = _emb_candidates(normed).withColumn("hit", F.lit(1))
    bucket = F.when(F.col("cosine") >= 0.4, F.lit("c>=0.4")).otherwise(
        F.lit("0.3<=c<0.4")
    )
    return (
        exact.join(cand, on=["vec_a", "vec_b"], how="left")
        .select(
            bucket.alias("cosine_bucket"),
            F.coalesce(F.col("hit"), F.lit(0)).alias("hit"),
        )
        .groupBy("cosine_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_exact"),
            F.sum("hit").cast("bigint").alias("n_candidates"),
            F.round(F.sum("hit") / F.count("*"), 6).alias("recall"),
        )
    )


SQL_EMB_NEAR_DUP_RECALL = f"""
with {_SQL_NORMED_EMB},
bands as (
  {_SQL_EMB_BANDS}
),
cand as (
  select distinct a.vec_id as vec_a, b.vec_id as vec_b
  from bands a join bands b using (band, bk)
  where a.vec_id < b.vec_id
),
exact as (
  select a.vec_id as vec_a, b.vec_id as vec_b,
         round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) as cosine
  from normed a cross join normed b
  where a.vec_id < b.vec_id
    and a.vec_id < {_EMB_RECALL_SLICE} and b.vec_id < {_EMB_RECALL_SLICE}
    and round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) >= 0.3
),
hits as (
  select e.cosine,
         case when c.vec_a is not null then 1 else 0 end as hit
  from exact e
  left join cand c on c.vec_a = e.vec_a and c.vec_b = e.vec_b
)
select case when cosine >= 0.4 then 'c>=0.4' else '0.3<=c<0.4' end
         as cosine_bucket,
       cast(count(*) as bigint) as n_exact,
       cast(sum(hit) as bigint) as n_candidates,
       round(cast(sum(hit) as double) / count(*), 6) as recall
from hits
group by 1
"""


def q_knn_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiband IVF ANN: the 10×3-bit hyperplane bands act as the
    coarse quantizer, and each probe (vec_id < 5) scans the UNION of
    its 10 inverted lists — multiprobe — then ranks candidates by exact
    cosine (top-3).  Round 1 used ONE 8-bit sign bucket as the list
    key; ``knn_ivf_recall`` exposed that as recall 0.0 on every probe
    (true neighbors almost never agree in all 8 leading sign bits).
    With the multiband lists each true neighbor only needs one 3-bit
    band to agree (probability 1-(1-p³)^10), while each probe still
    touches only same-bucket blocks — the output-sensitive 100-TB path.
    """
    from pyspark.sql import Window

    normed = _normed_emb(spark, sf_dir).localCheckpoint()
    bands = _emb_band_rows(normed)
    probe_bands = bands.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "band", "bk"
    )
    cand = (
        probe_bands.join(bands, on=["band", "bk"], how="inner")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qside = normed.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    nside = normed.select(
        F.col("vec_id").alias("neighbor_id"), "v", "norm"
    )
    scored = (
        cand.join(qside, "query_id")
        .join(nside, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("v"))
                / (F.col("qnorm") * F.col("norm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int"))
    )


SQL_KNN_IVF_BUCKETED = f"""
with {_SQL_NORMED_EMB},
bands as (
  {_SQL_EMB_BANDS}
),
cand as (
  select distinct p.vec_id as query_id, b.vec_id as neighbor_id
  from bands p join bands b using (band, bk)
  where p.vec_id < 5 and b.vec_id <> p.vec_id
),
scored as (
  select c.query_id, c.neighbor_id,
    round(list_dot_product(q.v, n.v) / (q.norm * n.norm), 6) as cosine
  from cand c
  join normed q on q.vec_id = c.query_id
  join normed n on n.vec_id = c.neighbor_id
),
ranked as (
  select query_id, neighbor_id, cosine,
         row_number() over (partition by query_id
                            order by cosine desc, neighbor_id asc) as rank
  from scored
)
select query_id, neighbor_id, cosine, cast(rank as int) as rank
from ranked where rank <= 3
"""


def q_embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("label").cast("int").alias("label"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("v"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        emb.select("label", F.round(norm, 6).alias("norm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
        )
    )


SQL_EMBEDDING_LABEL_STATS = """
with emb as (
  select cast(label as int) as label,
         round(sqrt(list_aggregate(
             list_transform(list_transform(embedding, x -> cast(x as double)),
                            x -> x * x), 'sum')), 6) as norm
  from embeddings
)
select label, cast(count(*) as bigint) as n_vectors,
       round(avg(norm), 4) as avg_norm
from emb group by label
"""


_SIMHASH_ND_BITS = 32  # the 16-bit doc_simhash fingerprint is too
# coarse for pair generation (a fifth of all pairs collide at ≤2 on
# this corpus — the pair list itself goes quadratic); 32 bits keeps
# the operator sub-quadratic while doc_simhash stays as published


def _simhash_nd_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit per-doc simhash (all bits of the md5 word hash voted) —
    the fingerprint shared by ``doc_simhash_near_dup`` and its recall
    gate."""
    docs = _t(spark, sf_dir, "documents")
    exploded = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(_words()).alias("word"),
    ).select("doc_id", _word_hash(F.col("word"), 0).alias("h"))
    bits = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(_SIMHASH_ND_BITS)
    ]
    agg = exploded.groupBy("doc_id").agg(*bits)
    fingerprint = None
    for b in range(_SIMHASH_ND_BITS):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return agg.select("doc_id", fingerprint.cast("bigint").alias("simhash"))


def q_doc_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 4-bit band bucket-join + Hamming verify.

    Completes the SimHash dedup family (fingerprint → candidate pairs):
    a 32-bit simhash (same md5 word hashes as ``doc_simhash``, all 32
    bits voted) splits into eight 4-bit bands; by pigeonhole any pair
    with Hamming distance ≤ 7 shares a band, so the band equi-join
    loses nothing at the ≤ 2 report threshold.  The join key packs
    (band index, band value) into one int — a plain shuffle equi-join
    that scales to 10^9 docs: band buckets shrink with fingerprint
    width, and the verified output is near-linear in true duplicates.
    """
    sig = _simhash_nd_sig(spark, sf_dir)
    band_keys = F.array(
        *[
            F.shiftright(F.col("simhash"), 4 * b)
            .bitwiseAND(F.lit(15))
            .cast("int")
            + F.lit(16 * b)
            for b in range(_SIMHASH_ND_BITS // 4)
        ]
    )
    banded = sig.select(
        "doc_id", "simhash", F.explode(band_keys).alias("bk")
    )
    return (
        banded.alias("a")
        .join(banded.alias("b"), on="bk", how="inner")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= 2)
        .distinct()  # a pair matching in several bands appears once
    )


SQL_DOC_SIMHASH_NEAR_DUP = f"""
with exploded as (
  select cast(doc_id as bigint) as doc_id,
         unnest(list_filter(string_split(text, ' '), y -> y <> '')) as word
  from documents
),
e as (
  select doc_id, {_sql_word_hash('word', 0)} as h from exploded
),
bits as (
  select doc_id,
  {", ".join(
    f"sum(case when (h >> {b}) & 1 = 1 then 1 else -1 end) as b{b}"
    for b in range(_SIMHASH_ND_BITS)
  )}
  from e group by doc_id
),
sig as (
  select doc_id,
    cast({" + ".join(
      f"case when b{b} > 0 then {1 << b} else 0 end"
      for b in range(_SIMHASH_ND_BITS)
    )} as bigint) as simhash
  from bits
),
banded as (
  select doc_id, simhash,
         cast(((simhash >> (4 * t.b)) & 15) + 16 * t.b as int) as bk
  from sig cross join (
    select unnest(generate_series(0, {_SIMHASH_ND_BITS // 4 - 1})) as b) t
)
select distinct a.doc_id as doc_a, b.doc_id as doc_b,
       cast(bit_count(xor(a.simhash, b.simhash)) as int) as hamming
from banded a join banded b using (bk)
where a.doc_id < b.doc_id
  and bit_count(xor(a.simhash, b.simhash)) <= 2
"""


def q_doc_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall gate for the simhash banding (VERDICT r2 #9).

    The 8×4-bit banding is pigeonhole-COMPLETE at hamming ≤ 7, so the
    candidate set must contain every exact pair at hamming ≤ 2 —
    this query MEASURES that instead of asserting it: exact simhash
    Hamming over a bounded all-pairs slice (doc_id < 200) vs the banded
    candidates, recall per hamming distance.  The bounded cross join is
    benign (≤ 19900 pairs) and exists only in this gate, not in the
    production operator.
    """
    sig = (
        _simhash_nd_sig(spark, sf_dir)
        .where(F.col("doc_id") < _RECALL_SLICE)
        .localCheckpoint()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    exact = (
        sa.crossJoin(sb)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= 2)
    )
    band_keys = F.array(
        *[
            F.shiftright(F.col("simhash"), 4 * b)
            .bitwiseAND(F.lit(15))
            .cast("int")
            + F.lit(16 * b)
            for b in range(_SIMHASH_ND_BITS // 4)
        ]
    )
    banded = sig.select("doc_id", F.explode(band_keys).alias("bk"))
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on="bk", how="inner")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    hits = exact.join(cand, ["doc_a", "doc_b"], "left")
    return hits.groupBy("hamming").agg(
        F.count("*").cast("bigint").alias("n_exact"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_candidates"),
        F.round(
            F.sum(F.coalesce("hit", F.lit(0))).cast("double") / F.count("*"), 6
        ).alias("recall"),
    )


SQL_DOC_SIMHASH_RECALL = f"""
with exploded as (
  select cast(doc_id as bigint) as doc_id,
         unnest(list_filter(string_split(text, ' '), y -> y <> '')) as word
  from documents where cast(doc_id as bigint) < {_RECALL_SLICE}
),
e as (
  select doc_id, {_sql_word_hash('word', 0)} as h from exploded
),
bits as (
  select doc_id,
  {", ".join(
    f"sum(case when (h >> {b}) & 1 = 1 then 1 else -1 end) as b{b}"
    for b in range(_SIMHASH_ND_BITS)
  )}
  from e group by doc_id
),
sig as (
  select doc_id,
    cast({" + ".join(
      f"case when b{b} > 0 then {1 << b} else 0 end"
      for b in range(_SIMHASH_ND_BITS)
    )} as bigint) as simhash
  from bits
),
exact as (
  select a.doc_id as doc_a, b.doc_id as doc_b,
         cast(bit_count(xor(a.simhash, b.simhash)) as int) as hamming
  from sig a join sig b on a.doc_id < b.doc_id
  where bit_count(xor(a.simhash, b.simhash)) <= 2
),
banded as (
  select doc_id,
         cast(((simhash >> (4 * t.b)) & 15) + 16 * t.b as int) as bk
  from sig cross join (
    select unnest(generate_series(0, {_SIMHASH_ND_BITS // 4 - 1})) as b) t
),
cand as (
  select distinct a.doc_id as doc_a, b.doc_id as doc_b
  from banded a join banded b using (bk)
  where a.doc_id < b.doc_id
)
select e.hamming,
       cast(count(*) as bigint) as n_exact,
       cast(sum(case when c.doc_a is not null then 1 else 0 end) as bigint)
         as n_candidates,
       round(sum(case when c.doc_a is not null then 1 else 0 end) * 1.0
             / count(*), 6) as recall
from exact e
left join cand c on c.doc_a = e.doc_a and c.doc_b = e.doc_b
group by e.hamming
"""


def _hamming_band_pairs(
    sig: DataFrame,
    id_col: str,
    hash_col: str,
    n_bands: int,
    band_bits: int,
    max_hamming: int,
) -> DataFrame:
    """Pigeonhole-complete Hamming near-dup pairs over an integer hash.

    Explodes ``n_bands`` band keys of ``band_bits`` each, bucket
    equi-joins on (band, key), verifies with XOR-popcount.  COMPLETE
    (not approximate) whenever ``max_hamming < n_bands``: a pair
    differing in h bits contaminates at most h bands, leaving a clean
    shared band.  The join is a plain shuffle equi-join on small int
    keys — sub-quadratic at 10^12 rows as long as band buckets stay
    bounded (widen the hash or band_bits if they don't).
    """
    assert max_hamming < n_bands
    band_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col(hash_col), band_bits * b)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("bk"),
            )
            for b in range(n_bands)
        ]
    )
    banded = sig.select(
        F.col(id_col), F.col(hash_col), F.explode(band_keys).alias("b")
    ).select(id_col, hash_col, "b.band", "b.bk")
    return (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bk"], how="inner")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias(f"{id_col}_a"),
            F.col(f"b.{id_col}").alias(f"{id_col}_b"),
            F.bit_count(
                F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))
            )
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def phash_bands_for_corpus(n_rows: int, max_hamming: int) -> tuple[int, int]:
    """Choose (n_bands, band_bits) for a 64-bit Hamming banding from the
    corpus size.

    Completeness needs ``max_hamming < n_bands`` (pigeonhole: a pair
    differing in h bits contaminates at most h bands).  COST scales with
    the band-bucket occupancy: with b-bit keys a corpus of n rows puts
    ~n/2^b rows in each of the 2^b buckets per band, and the bucket
    equi-join does ~n_bands · n²/2^b comparisons — so band_bits must
    GROW with the corpus.  16×4 keeps the explosion cheapest while
    buckets stay small (≤10^6 rows: ≤6·10^4 rows/bucket); 8×8 is the
    production default beyond (10^9 rows: ~4·10^6 rows/bucket, and the
    8× fewer exploded rows cut the shuffle in half).  Both settings are
    complete for ``max_hamming < 8``.
    """
    if max_hamming >= 8:
        raise ValueError("max_hamming must stay below the band count (8)")
    return (16, 4) if n_rows <= 1_000_000 else (8, 8)


def phash_near_dup_pairs(
    images: DataFrame,
    max_hamming: int = 2,
    corpus_rows: int | None = None,
) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance.

    The production operator over the Iceberg images table
    (BASELINE.json input_hint: ``phash:int64``).  Band layout is chosen
    from the corpus size (``phash_bands_for_corpus``): n_bands ×
    band_bits always covers the full signed int64 and keeps
    ``max_hamming < n_bands``, so any qualifying pair is guaranteed a
    clean shared band (complete, not approximate).  Arithmetic
    shiftright + mask extracts identical band keys for negative hashes
    in Spark and DuckDB alike.  Pass ``corpus_rows`` (e.g. from table
    metadata) to pick the scale-appropriate layout without a count
    job; default assumes the small-corpus 16×4 layout.
    Returns (image_id_a, image_id_b, hamming).
    """
    n_bands, band_bits = phash_bands_for_corpus(
        corpus_rows if corpus_rows is not None else 0, max_hamming
    )
    sig = images.select("image_id", "phash")
    out = _hamming_band_pairs(
        sig, "image_id", "phash", n_bands, band_bits, max_hamming
    )
    return out.select(
        F.col("image_id_a"), F.col("image_id_b"), F.col("hamming")
    )


def q_image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-banded phash near-dup pairs, DuckDB-oracle-checked.

    The oracle gate only registers the parquet tables, so this contract
    twin of ``phash_near_dup_pairs`` derives a deterministic 60-bit
    phash from ``documents``: docs share a 60-bit md5 group hash per
    ``doc_id % 50`` cohort, with 0/1/2 planted bit flips by
    ``doc_id % 3`` — exactly the near-dup structure a perceptual hash
    exhibits.  15 bands × 4 bits: complete at hamming ≤ 2 by
    pigeonhole.  The operator itself (banding + XOR-popcount verify) is
    shared code with the images-table version.
    """
    docs = _t(spark, sf_dir, "documents")
    base = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("pg#"), (F.col("doc_id") % 50).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    mask = F.expr(
        "case when doc_id % 3 = 1 "
        "then shiftleft(cast(1 as bigint), cast(doc_id % 60 as int)) "
        "when doc_id % 3 = 2 "
        "then shiftleft(cast(1 as bigint), cast(doc_id % 60 as int)) | "
        "shiftleft(cast(1 as bigint), cast((doc_id * 7 + 13) % 60 as int)) "
        "else cast(0 as bigint) end"
    )
    sig = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        base.bitwiseXOR(mask).alias("phash"),
    )
    out = _hamming_band_pairs(sig, "doc_id", "phash", 15, 4, 2)
    return out.select(
        F.col("doc_id_a").alias("doc_a"),
        F.col("doc_id_b").alias("doc_b"),
        "hamming",
    )


SQL_IMAGE_PHASH_NEAR_DUP = """
with sig as (
  select cast(doc_id as bigint) as doc_id,
    xor(
      cast(('0x' || substr(md5('pg#' || cast(doc_id % 50 as varchar)), 1, 15))
           as bigint),
      case when doc_id % 3 = 1
           then (cast(1 as bigint) << cast(doc_id % 60 as int))
           when doc_id % 3 = 2
           then (cast(1 as bigint) << cast(doc_id % 60 as int))
              | (cast(1 as bigint) << cast((doc_id * 7 + 13) % 60 as int))
           else cast(0 as bigint) end
    ) as phash
  from documents
),
banded as (
  select doc_id, phash, t.b as band,
         cast((phash >> (4 * t.b)) & 15 as int) as bk
  from sig cross join (select unnest(generate_series(0, 14)) as b) t
)
select distinct a.doc_id as doc_a, b.doc_id as doc_b,
       cast(bit_count(xor(a.phash, b.phash)) as int) as hamming
from banded a join banded b using (band, bk)
where a.doc_id < b.doc_id and bit_count(xor(a.phash, b.phash)) <= 2
"""


def q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact image dedup on the input-hint ``phash`` column.

    The images table (BASELINE.json input_hint) carries a perceptual
    hash per row; the synthetic generator's land-tile skew duplicates
    block images under fresh image_ids, so grouping by phash is the
    image-level twin of ``doc_exact_dedup``: keep the lexicographically
    first image_id, count the copies.  At 10^12 images this is one
    hash-aggregate shuffle on an int64 key — the cheapest possible
    dedup pass, and the reason the input schema carries phash at all.
    DuckDB-checked: the sf-scaled world is materialized to parquet
    (synth.ensure_contract_images) and BOTH engines aggregate the same
    rows; the generator (sha256-of-pixels phash, skew layout) stays
    pinned by the codec/synth round-trip tests.
    """
    import re

    from demeton_spark.synth import ensure_contract_images

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    imgs = spark.read.parquet(ensure_contract_images(spark, sf))
    return (
        imgs.groupBy("phash")
        .agg(
            F.min("image_id").alias("keep_id"),
            F.count("*").cast("int").alias("copies"),
        )
        .select("phash", "keep_id", "copies")
    )


def sql_image_phash_dedup(sf: float = 0.01) -> str:
    """Oracle builder: the contract string pins the driver's sf0.01
    fixture; tools/oracle_check regenerates per-sf via FIXTURE_ORACLES
    so the gate is portable across scale factors."""
    return f"""
select phash,
       min(image_id) as keep_id,
       cast(count(*) as int) as copies
from read_parquet('/root/repo/data/synth_images/sf{sf}/*.parquet')
group by phash
"""


SQL_IMAGE_PHASH_DEDUP = sql_image_phash_dedup()


def _contract_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from demeton_spark.synth import ensure_contract_images

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    return spark.read.parquet(ensure_contract_images(spark, sf))


def pair_dedup_clusters(imgs: DataFrame) -> DataFrame:
    """Joint image+caption transitive dedup over an input-hint pairs
    table (image_id, phash, caption): two modalities vote edges, one
    union-find resolves them.

    An edge exists when two rows share a phash (pixel duplicate) OR a
    caption (text duplicate); connected components over the union give
    multimodal clusters — image A ~ B by pixels and B ~ C by caption
    land in ONE cluster even though A and C share nothing directly.
    Edges are star-shaped (every member → its modality-group min), so
    the edge list is linear in rows, not quadratic in duplicates:
    at 10^12 pairs this is two hash-aggs + the O(log n) CC rounds.
    Output: one row per cluster with member/phash/caption cardinality.
    """
    from demeton_spark.graph import connected_components

    def star_edges(key: str) -> DataFrame:
        g = imgs.groupBy(key).agg(F.min("image_id").alias("b"))
        return (
            imgs.join(g, key)
            .where(F.col("image_id") != F.col("b"))
            .select(F.col("image_id").alias("a"), "b")
        )

    edges = star_edges("phash").union(star_edges("caption"))
    nodes = imgs.select(F.col("image_id").alias("node")).distinct()
    cc = connected_components(nodes, edges, "node", ("a", "b"))
    return (
        imgs.join(cc, imgs["image_id"] == cc["node"])
        .groupBy("label")
        .agg(
            F.count("*").alias("n_members"),
            F.countDistinct("phash").alias("n_phashes"),
            F.countDistinct("caption").alias("n_captions"),
        )
        .select(
            F.col("label").alias("cluster_id"),
            "n_members",
            "n_phashes",
            "n_captions",
        )
    )


def q_pair_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pair_dedup_clusters(
        _contract_images(spark, sf_dir).select("image_id", "phash", "caption")
    )


def q_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-hash perceptual fingerprint computed from DECODED
    pixels — the end-to-end proof that the from-scratch image codecs
    (PNG16 + HGT here; the table mixes both formats) feed the dedup
    path correctly.

    Per image: decode bytes → 20×20 int16 block → 5×5 grid of 4×4-cell
    SUMS (integer-exact; comparing sums ≡ comparing means) → 40-bit
    hash (20 horizontal + 20 vertical neighbor comparisons).  The
    DuckDB twin never touches the bytes: it re-derives every pixel from
    the caption-addressed terrain formula and computes the same hash in
    SQL — so a single flipped bit anywhere in PNG inflate/unfilter or
    HGT byte order breaks the oracle.  Scale: one Arrow decode pass,
    no shuffle at all until the consumer aggregates.
    """
    import pandas as pd

    from demeton_spark.codec import decode_heights_png, decode_hgt

    imgs = _contract_images(spark, sf_dir).select("image_id", "bytes", "fmt", "w")

    def compute(batches):
        import numpy as np

        for pdf in batches:
            ids, hashes = [], []
            for iid, blob, fmt, w in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"]
            ):
                if fmt == "hgt":
                    grid = decode_hgt(bytes(blob), int(w))
                else:
                    grid = decode_heights_png(bytes(blob))
                s = grid.astype(np.int64).reshape(5, 4, 5, 4).sum(axis=(1, 3))
                val = 0
                for idx, b in enumerate((s[:, :-1] > s[:, 1:]).ravel()):
                    val |= int(b) << idx
                for idx, b in enumerate((s[:-1, :] > s[1:, :]).ravel()):
                    val |= int(b) << (20 + idx)
                ids.append(iid)
                hashes.append(val)
            yield pd.DataFrame({"image_id": ids, "dhash": hashes})

    return imgs.mapInPandas(compute, "image_id string, dhash bigint")


def sql_image_dhash(sf: float = 0.01) -> str:
    from demeton_spark.synth import contract_spec_for_sf

    side = contract_spec_for_sf(sf).n_tiles_x
    return rf"""
with img as (
  select image_id, caption
  from read_parquet('/root/repo/data/synth_images/sf{sf}/*.parquet')
),
parsed as (
  select image_id,
    cast(regexp_extract(caption, 'N(\d+)E(\d+)', 1) as int) as ty,
    cast(regexp_extract(caption, 'N(\d+)E(\d+)', 2) as int) as tx,
    cast(regexp_extract(caption, 'block \((\d+),(\d+)\)', 1) as int) as bx,
    cast(regexp_extract(caption, 'block \((\d+),(\d+)\)', 2) as int) as by
  from img
),
px as (
  select p.image_id,
         ((p.ty - 45) * {side} + (p.tx - 13)) * 9 + p.by * 3 + p.bx
           as base_index,
         p.tx * 60 + p.bx * 20 + lx.v as gx,
         p.ty * 60 + p.by * 20 + ly.v as gy,
         lx.v as lx, ly.v as ly
  from parsed p
  cross join (select unnest(generate_series(0, 19)) as v) lx
  cross join (select unnest(generate_series(0, 19)) as v) ly
),
h as (
  select image_id, lx // 4 as c, ly // 4 as r,
    case when base_index % 16 = 5 and ly % 7 = 0 and lx % 5 = 0
         then -32768
         else cast(round(500.0 + 400.0 * sin(2 * pi() * gx / 1200.0)
                                       * cos(2 * pi() * gy / 1200.0)) as int)
    end as hv
  from px
),
cells as (select image_id, r, c, sum(hv) as s from h group by 1, 2, 3),
hbits as (
  select a.image_id,
         sum(case when a.s > b.s
                  then cast(1 as bigint) << (a.r * 4 + a.c) else 0 end) as hb
  from cells a
  join cells b on b.image_id = a.image_id and b.r = a.r and b.c = a.c + 1
  group by 1
),
vbits as (
  select a.image_id,
         sum(case when a.s > b.s
                  then cast(1 as bigint) << (20 + a.r * 5 + a.c) else 0 end) as vb
  from cells a
  join cells b on b.image_id = a.image_id and b.c = a.c and b.r = a.r + 1
  group by 1
)
select hb_t.image_id, cast(hb_t.hb + vb_t.vb as bigint) as dhash
from hbits hb_t join vbits vb_t using (image_id)
"""


SQL_IMAGE_DHASH = sql_image_dhash()


def sql_pair_dedup_clusters(sf: float = 0.01) -> str:
    return f"""
with recursive img as (
  select image_id, phash, caption
  from read_parquet('/root/repo/data/synth_images/sf{sf}/*.parquet')
),
pe as (
  select i.image_id as a, g.b
  from img i join (select phash, min(image_id) as b from img group by 1) g
    using (phash)
  where i.image_id <> g.b
),
ce as (
  select i.image_id as a, g.b
  from img i join (select caption, min(image_id) as b from img group by 1) g
    using (caption)
  where i.image_id <> g.b
),
e0 as (select a, b from pe union select a, b from ce),
edges as (select a, b from e0 union select b as a, a as b from e0),
reach(node, root) as (
  select image_id, image_id from img
  union
  select e.b, r.root from reach r join edges e on e.a = r.node
),
labels as (select node, min(root) as label from reach group by node)
select l.label as cluster_id,
       cast(count(*) as bigint) as n_members,
       cast(count(distinct i.phash) as bigint) as n_phashes,
       cast(count(distinct i.caption) as bigint) as n_captions
from img i join labels l on i.image_id = l.node
group by 1
"""


SQL_PAIR_DEDUP_CLUSTERS = sql_pair_dedup_clusters()


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio curation features over real WAV/PCM decode.

    The clips table (multimodal extra — the reference has no audio
    path) carries opaque ``binary`` WAV payloads; the Spark side
    decodes them with the from-scratch RIFF codec
    (:mod:`demeton_spark.audio`) inside one mapInPandas pass and
    reports the corpus-curation feature set.  The DuckDB oracle cannot
    decode WAV — instead the generator params ``(a, n, rate)``
    materialized next to the bytes let it regenerate the exact integer
    sample series (``((a·(t+7)·(t+13)) mod 4001) − 2000``) and compute
    the same features in SQL, so decode + DSP are both checked
    end-to-end.  Sample values are integers, so sums are exact in
    float64 and rms matches bit-for-bit before the 6-decimal round.
    The spectral centroid is not SQL-expressible (rfft) and is pinned
    against closed-form tones in tests/test_audio.py instead.  At
    10^10 clips this is a linear embarrassingly-parallel scan — no
    shuffle at all.
    """
    import re

    from demeton_spark import multimodal
    from demeton_spark.synth import ensure_contract_audio

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    clips = spark.read.parquet(ensure_contract_audio(spark, sf))
    feats = multimodal.audio_features(clips.select("audio_id", "bytes"))
    return feats.select(
        "audio_id",
        F.col("n_samples").cast("bigint").alias("n_samples"),
        "sample_rate",
        "duration_ms",
        F.round("rms", 6).alias("rms"),
        "peak",
        F.col("zero_crossings").cast("bigint").alias("zero_crossings"),
    )


def sql_audio_features(sf: float = 0.01) -> str:
    return f"""
with clips as (
  select audio_id, a, n, rate
  from read_parquet('/root/repo/data/synth_audio/sf{sf}/*.parquet')
),
samples as (
  select c.audio_id, c.n, c.rate, u.t,
         cast(((c.a * (u.t + 7) * (u.t + 13)) % 4001) - 2000 as double) as s
  from clips c, unnest(range(0, cast(c.n as bigint))) as u(t)
),
base as (
  select audio_id,
         cast(count(*) as bigint) as n_samples,
         cast(any_value(rate) as int) as sample_rate,
         count(*) * 1000.0 / any_value(rate) as duration_ms,
         round(sqrt(avg(s * s)), 6) as rms,
         cast(max(abs(s)) as int) as peak
  from samples group by audio_id
),
zc as (
  select audio_id,
         cast(coalesce(sum(case when s * prev < 0 then 1 else 0 end), 0) as bigint)
           as zero_crossings
  from (
    select audio_id, s,
           lag(s) over (partition by audio_id order by t) as prev
    from samples where s <> 0
  ) group by audio_id
)
select b.audio_id, b.n_samples, b.sample_rate, b.duration_ms, b.rms, b.peak,
       z.zero_crossings
from base b join zc z using (audio_id)
"""


SQL_AUDIO_FEATURES = sql_audio_features()

#: fixture-pinned oracles the driver checks at sf0.01; oracle_check
#: regenerates these per-sf so the gate stays portable
FIXTURE_ORACLES = {
    "image_phash_dedup": sql_image_phash_dedup,
    "image_dhash": sql_image_dhash,
    "pair_dedup_clusters": sql_pair_dedup_clusters,
    "audio_features": sql_audio_features,
}


def q_events_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type — the SAME operator the
    streaming path runs (`streaming.windowed_event_counts` works on
    batch and stream alike); here it is oracle-checked in batch mode
    against DuckDB's time_bucket."""
    from .streaming import windowed_event_counts

    ev = _t(spark, sf_dir, "events")
    out = windowed_event_counts(ev)
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("sum_value", 6).alias("sum_value"),
    )


SQL_EVENTS_WINDOWED_COUNTS = """
select time_bucket(interval '1 hour', cast(ts as timestamp)) as window_start,
       event_type,
       cast(count(*) as bigint) as n_events,
       round(sum(value), 6) as sum_value
from events
group by 1, 2
"""


def q_events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (1-hour gap) per user — the SAME
    operator the streaming path runs (`streaming.session_counts`);
    batch mode oracle-checked against DuckDB gaps-and-islands."""
    from .streaming import session_counts

    ev = _t(spark, sf_dir, "events")
    out = session_counts(ev)
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


SQL_EVENTS_SESSION_WINDOWS = """
with marked as (
  select cast(user_id as bigint) as user_id, cast(ts as timestamp) as ts,
         case when ts - lag(ts) over (partition by user_id order by ts)
                   > interval '1 hour' or
                   lag(ts) over (partition by user_id order by ts) is null
              then 1 else 0 end as new_session
  from events
),
ids as (
  select user_id, ts,
         sum(new_session) over (partition by user_id order by ts
                                rows unbounded preceding) as session_id
  from marked
)
select user_id,
       min(ts) as session_start,
       max(ts) + interval '1 hour' as session_end,
       cast(count(*) as bigint) as n_events
from ids
group by user_id, session_id
"""


def q_user_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user (count, sum, max) over event values — the batch twin of
    the custom stateful streaming operator (`streaming.
    running_user_stats` converges to exactly this aggregate; the
    equivalence is pinned in tests/test_streaming.py)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("user_id").cast("bigint").alias("user_id")
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


SQL_USER_VALUE_STATS = """
select cast(user_id as bigint) as user_id,
       cast(count(*) as bigint) as n_events,
       round(sum(value), 6) as sum_value,
       round(max(value), 6) as max_value
from events
group by user_id
"""


def q_knn_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of the IVF-bucketed ANN against the exact brute-force
    top-k, per probe — the standard ANN quality metric, computed as a
    join of the two query results (both already oracle-checked)."""
    exact = q_knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    approx = q_knn_ivf_bucketed(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(approx, on=["query_id", "neighbor_id"], how="left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("int").alias("k"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("int").alias("hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                / F.count("*"), 6
            ).alias("recall"),
        )
    )


SQL_KNN_IVF_RECALL = f"""
with exact as ({SQL_KNN_BRUTEFORCE}),
approx as ({SQL_KNN_IVF_BUCKETED})
select e.query_id,
       cast(count(*) as int) as k,
       cast(sum(case when a.neighbor_id is not null then 1 else 0 end) as int)
           as hits,
       round(sum(case when a.neighbor_id is not null then 1 else 0 end)
             * 1.0 / count(*), 6) as recall
from exact e
left join approx a
  on e.query_id = a.query_id and e.neighbor_id = a.neighbor_id
group by e.query_id
"""


# ---------------------------------------------------------------------------
# k-means-trained IVF: the production coarse quantizer
# ---------------------------------------------------------------------------
#
# The hyperplane-LSH IVF above is data-independent; a TRAINED coarse
# quantizer (Lloyd's k-means, the IVF-Flat layout every production ANN
# store uses) adapts the inverted lists to the corpus.  Distributed
# shape per Lloyd iteration: assignment is a broadcast of K·D centroid
# literals into a Catalyst fold (no Python, no shuffle), the update is
# ONE hash-agg shuffle on (cluster, dim) with map-side partial
# aggregation — K·D·partitions rows cross the wire, not N·D — and the
# K·D result collects to the driver as the next model (the same
# "collect the model, not the data" loop MLlib's KMeans uses).
# Centroids are quantized to 6 decimals each iteration so the
# assignment cascade is bit-identical between Spark and the DuckDB
# twin regardless of either engine's float accumulation order.

KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_NPROBE = 2
_KM_DIMS = 64


def _km_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )


def _km_dist(v, cent: list):
    """‖v−c‖² as dot(v,v) − 2·dot(v,c) + dot(c,c): all three terms are
    the same sequential fold DuckDB's list_dot_product runs, so both
    engines produce the identical double."""
    c = F.array(*[F.lit(float(x)) for x in cent])
    cc = float(sum(x * x for x in cent))  # scalar, exact same literal in SQL
    return _dot(v, v) - 2.0 * _dot(v, c) + F.lit(cc)


def _km_assign_col(v, centroids: list):
    """argmin over K centroid distances; ties → lowest cluster id
    (array_position returns the FIRST index of the minimum)."""
    dists = F.array(*[_km_dist(v, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


_KM_MEMO: dict[tuple[str, str], tuple[list, DataFrame]] = {}


def _km_fit(spark: SparkSession, sf_dir: str) -> tuple[list, DataFrame]:
    """Run KMEANS_ITERS Lloyd iterations; return (centroids, emb).

    Memoized per (session, sf_dir) like the dedup cluster table: the
    fitted model is written once and read by every consumer at
    production scale, so centroids/knn/recall queries share one fit."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _KM_MEMO:
        return _KM_MEMO[key]
    emb = _km_emb(spark, sf_dir).localCheckpoint()
    init = {
        r["vec_id"]: r["v"]
        for r in emb.where(F.col("vec_id") < KMEANS_K).collect()
    }
    centroids = [
        [round(x, 6) for x in init[c]] for c in range(KMEANS_K)
    ]
    for _ in range(KMEANS_ITERS):
        assigned = emb.select(
            _km_assign_col(F.col("v"), centroids).alias("cluster"), "v"
        )
        parts = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("x"), 6).alias("c"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty cluster keeps its centroid
        for r in parts:
            new[r["cluster"]][r["dim"]] = r["c"]
        centroids = new
    _KM_MEMO[key] = (centroids, emb)
    if len(_KM_MEMO) > 8:  # bound driver references across sessions
        _KM_MEMO.pop(next(iter(_KM_MEMO)))
    return centroids, emb


def q_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fitted k-means model: per-(cluster, dim) centroid values plus
    member counts after KMEANS_ITERS quantized Lloyd iterations."""
    centroids, emb = _km_fit(spark, sf_dir)
    assigned = emb.select(
        "vec_id", _km_assign_col(F.col("v"), centroids).alias("cluster")
    )
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("n_members"))
    cent_rows = [
        (c, d, centroids[c][d])
        for c in range(KMEANS_K)
        for d in range(_KM_DIMS)
    ]
    cent_df = spark.createDataFrame(cent_rows, "cluster int, dim int, centroid double")
    return cent_df.join(sizes, "cluster", "left").select(
        "cluster",
        "dim",
        "centroid",
        F.coalesce(F.col("n_members"), F.lit(0)).cast("bigint").alias("n_members"),
    )


def q_knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat search over the trained quantizer: each probe scans the
    union of its NPROBE nearest centroids' inverted lists, then ranks
    by exact cosine (top-3).  At scale the lists live as an Iceberg
    table bucketed by cluster; a probe reads NPROBE/K of the corpus."""
    from pyspark.sql import Window

    centroids, emb = _km_fit(spark, sf_dir)
    normed = emb.select(
        "vec_id", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("norm")
    )
    lists = normed.select(
        "vec_id", "v", "norm",
        _km_assign_col(F.col("v"), centroids).alias("cluster"),
    ).localCheckpoint()
    probes = lists.where(F.col("vec_id") < 5)
    # NPROBE nearest centroids per probe: rank the K distances inline
    dists = F.array(
        *[_km_dist(F.col("v"), c) for c in centroids]
    )
    probe_clusters = (
        probes.select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
            F.posexplode(dists).alias("cluster", "cdist"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("cdist", "cluster")
            ),
        )
        .where(F.col("crank") <= KMEANS_NPROBE)
        .select("query_id", "qv", "qnorm", "cluster")
    )
    scored = (
        probe_clusters.join(lists, "cluster")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def q_knn_ivf_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the trained-IVF search vs exact brute force."""
    exact = q_knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    approx = q_knn_ivf_kmeans(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("hit_id")
    )
    return (
        exact.join(
            approx,
            (exact.query_id == approx.query_id)
            & (exact.neighbor_id == approx.hit_id),
            "left",
        )
        .drop(approx.query_id)
        .groupBy("query_id")
        .agg(
            F.count("*").cast("int").alias("k"),
            F.sum(
                F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
            ).cast("int").alias("hits"),
            F.round(
                F.sum(F.when(F.col("hit_id").isNotNull(), 1).otherwise(0))
                / F.count("*"),
                6,
            ).alias("recall"),
        )
    )


def _km_sql_dist(vcol: str, ccol: str) -> str:
    return (
        f"list_dot_product({vcol}, {vcol})"
        f" - 2 * list_dot_product({vcol}, {ccol})"
        f" + list_dot_product({ccol}, {ccol})"
    )


def _kmeans_fit_sql() -> str:
    """CTE chain running the same quantized Lloyd cascade in DuckDB.

    Iteration t: cross join vecs × K centroids (K rows — benign),
    first-min argmin via row_number ordered (dist, cluster), then
    per-(cluster, dim) avg rounded to 6 decimals, re-assembled into
    centroid lists; empty clusters inherit the previous centroid."""
    steps = [
        """emb as (
  select cast(vec_id as bigint) as vec_id,
         list_transform(embedding, x -> cast(x as double)) as v
  from embeddings
),
cent0 as (
  select cast(vec_id as int) as cluster,
         list_transform(v, x -> round(x, 6)) as c
  from emb where vec_id < {K}
)""".format(K=KMEANS_K)
    ]
    prev = "cent0"
    for t in range(1, KMEANS_ITERS + 1):
        dist = _km_sql_dist("e.v", "k.c")
        steps.append(
            f"""asg{t} as (
  select vec_id, v, cluster from (
    select e.vec_id, e.v, k.cluster,
           row_number() over (partition by e.vec_id
                              order by {dist}, k.cluster) as rn
    from emb e cross join {prev} k
  ) where rn = 1
),
upd{t} as (
  select cluster, dim, round(avg(x), 6) as c
  from (
    select cluster, unnest(v) as x, generate_subscripts(v, 1) - 1 as dim
    from asg{t}
  )
  group by cluster, dim
),
cent{t} as (
  select p.cluster,
         coalesce(u.c, p.c) as c
  from {prev} p
  left join (select cluster, list(c order by dim) as c from upd{t}
             group by cluster) u
    on u.cluster = p.cluster
)"""
        )
        prev = f"cent{t}"
    return ",\n".join(steps), prev


_KM_SQL_CHAIN, _KM_SQL_FINAL = _kmeans_fit_sql()

SQL_KMEANS_CENTROIDS = f"""
with {_KM_SQL_CHAIN},
final_assign as (
  select vec_id, cluster from (
    select e.vec_id, k.cluster,
           row_number() over (partition by e.vec_id
                              order by {_km_sql_dist("e.v", "k.c")}, k.cluster) as rn
    from emb e cross join {_KM_SQL_FINAL} k
  ) where rn = 1
),
sizes as (select cluster, count(*) as n from final_assign group by cluster)
select cast(k.cluster as int) as cluster,
       cast(d.dim as int) as dim,
       k.c[d.dim + 1] as centroid,
       cast(coalesce(s.n, 0) as bigint) as n_members
from {_KM_SQL_FINAL} k
cross join (select unnest(generate_series(0, {_KM_DIMS - 1})) as dim) d
left join sizes s on s.cluster = k.cluster
"""

SQL_KNN_IVF_KMEANS = f"""
with {_KM_SQL_CHAIN},
normed as (
  select vec_id, v, sqrt(list_dot_product(v, v)) as norm from emb
),
lists as (
  select n.vec_id, n.v, n.norm, a.cluster
  from normed n
  join (
    select vec_id, cluster from (
      select e.vec_id, k.cluster,
             row_number() over (partition by e.vec_id
                                order by {_km_sql_dist("e.v", "k.c")}, k.cluster) as rn
      from emb e cross join {_KM_SQL_FINAL} k
    ) where rn = 1
  ) a on a.vec_id = n.vec_id
),
probe_clusters as (
  select query_id, qv, qnorm, cluster from (
    select p.vec_id as query_id, p.v as qv, p.norm as qnorm, k.cluster,
           row_number() over (partition by p.vec_id
                              order by {_km_sql_dist("p.v", "k.c")}, k.cluster) as crank
    from (select * from lists where vec_id < 5) p
    cross join {_KM_SQL_FINAL} k
  ) where crank <= {KMEANS_NPROBE}
),
scored as (
  select p.query_id, l.vec_id as neighbor_id,
         round(list_dot_product(p.qv, l.v) / (p.qnorm * l.norm), 6) as cosine
  from probe_clusters p
  join lists l on l.cluster = p.cluster and l.vec_id <> p.query_id
)
select query_id, neighbor_id, cosine, cast(rank as int) as rank from (
  select *, row_number() over (partition by query_id
                               order by cosine desc, neighbor_id) as rank
  from scored
) where rank <= 3
"""

SQL_KNN_IVF_KMEANS_RECALL = f"""
with exact as ({SQL_KNN_BRUTEFORCE}),
approx as ({SQL_KNN_IVF_KMEANS})
select e.query_id,
       cast(count(*) as int) as k,
       cast(sum(case when a.neighbor_id is not null then 1 else 0 end) as int)
           as hits,
       round(sum(case when a.neighbor_id is not null then 1 else 0 end)
             * 1.0 / count(*), 6) as recall
from exact e
left join approx a
  on e.query_id = a.query_id and e.neighbor_id = a.neighbor_id
group by e.query_id
"""


# ---------------------------------------------------------------------------
# oracles for raster contract queries (the synthetic world, in SQL)
# ---------------------------------------------------------------------------
#
# The raster contract queries (__spark_entry__) run over the deterministic
# synthetic world, not the parquet tables — but the world itself is a pure
# function of cell coordinates, so DuckDB can regenerate it from
# generate_series and check the raster operators exactly.  Rounding parity:
# no terrain value in this window sits nearer than 1.9e-5 to a .5 boundary
# (checked empirically), so DuckDB round() == np.round here.

_CQ_TS, _CQ_BS = 60, 20
_CQ_LON0, _CQ_LAT0, _CQ_NTX, _CQ_NTY = 13, 45, 2, 2


def _sql_synth_world() -> str:
    """DuckDB CTE reproducing synth.expected_world_heights for the
    contract-world spec (2×2 1° tiles, ts=60, bs=20): terrain sinusoid
    (synth.py:100-108) + deterministic hole mask (synth.py:148-152)."""
    bpt_side = _CQ_TS // _CQ_BS
    bpt = bpt_side * bpt_side
    return f"""
world as (
  select tx, ty, lx, ly, tx * {_CQ_TS} + lx as gx, ty * {_CQ_TS} + ly as gy,
    case when ((((ty - {_CQ_LAT0}) * {_CQ_NTX} + (tx - {_CQ_LON0})) * {bpt}
               + (ly // {_CQ_BS}) * {bpt_side} + (lx // {_CQ_BS})) % 16 = 5)
              and (ly % {_CQ_BS}) % 7 = 0 and (lx % {_CQ_BS}) % 5 = 0
         then -32768
         else cast(round(500.0
              + 400.0 * sin(2 * pi() * (tx * {_CQ_TS} + lx) / 1200.0)
                      * cos(2 * pi() * (ty * {_CQ_TS} + ly) / 1200.0)) as int)
    end as h
  from (select unnest(generate_series({_CQ_LON0}, {_CQ_LON0 + _CQ_NTX - 1})) as tx) a
  cross join (select unnest(generate_series({_CQ_LAT0}, {_CQ_LAT0 + _CQ_NTY - 1})) as ty) b
  cross join (select unnest(generate_series(0, {_CQ_TS - 1})) as lx) c
  cross join (select unnest(generate_series(0, {_CQ_TS - 1})) as ly) d
)"""


# Level-0→1 pyramid: 2×2 NaN-masked mean with .NET-style half-to-even
# rounding, expressed EXACTLY over integers: for mean s/n (s≥0, n≤4),
# half-to-even(s/n) = s//n + [2(s%n)>n or (2(s%n)=n and s//n odd)].
SQL_PYRAMID_DOWNSAMPLE = f"""
with {_sql_synth_world()},
grp as (
  select tx // 2 as px, ty // 2 as py,
         (ty % 2) * {_CQ_TS // 2} + ly // 2 as py_cell,
         (tx % 2) * {_CQ_TS // 2} + lx // 2 as px_cell,
         sum(case when h <> -32768 then h else 0 end) as s,
         sum(case when h <> -32768 then 1 else 0 end) as n
  from world
  group by 1, 2, 3, 4
),
vals as (
  select px, py,
    case when n = 0 then null
         else s // n + case when 2 * (s % n) > n then 1
                            when 2 * (s % n) = n and (s // n) % 2 = 1 then 1
                            else 0 end
    end as v
  from grp
)
select 1 as level, cast(px as int) as tile_x, cast(py as int) as tile_y,
       cast({_CQ_TS * _CQ_TS} - count(v) as bigint) as missing_px,
       cast(sum(v) as bigint) as height_sum
from vals
group by px, py
"""


# Cross-tile water components at sea_level=550 via min-label propagation
# seeded ONLY at scan-order local minima (cells with no water neighbor
# above or to the left): every cell is reachable from some seed by
# construction, and the component's global scan-first cell is always a
# seed, so min(root) per cell = the component id — with reach size
# O(cells × seeds-reaching) instead of O(cells²).
SQL_WATER_COMPONENTS = f"""
with recursive {_sql_synth_world()},
water as (
  select gx, gy,
         (gy + {1 << 25}) * {1 << 26}::bigint + (gx + {1 << 25}) as id
  from world where h <> -32768 and h <= 550
),
edges as (
  select a.id as src, b.id as dst from water a
    join water b on b.gx = a.gx + 1 and b.gy = a.gy
  union all
  select b.id, a.id from water a
    join water b on b.gx = a.gx + 1 and b.gy = a.gy
  union all
  select a.id, b.id from water a
    join water b on b.gx = a.gx and b.gy = a.gy + 1
  union all
  select b.id, a.id from water a
    join water b on b.gx = a.gx and b.gy = a.gy + 1
),
reach(id, root) as (
  select w.id, w.id from water w
  where not exists (select 1 from water u
                    where u.gx = w.gx - 1 and u.gy = w.gy)
    and not exists (select 1 from water u
                    where u.gx = w.gx and u.gy = w.gy - 1)
  union
  select e.dst, r.root from reach r join edges e on e.src = r.id
),
lab as (
  select id, min(root) as root from reach group by id
),
cells as (
  select w.gx, w.gy, l.root from water w join lab l using (id)
)
select root as component_id,
       cast(count(*) as bigint) as area,
       cast(min(gx) as bigint) as min_cx, cast(min(gy) as bigint) as min_cy,
       cast(max(gx) as bigint) as max_cx, cast(max(gy) as bigint) as max_cy
from cells
group by root
"""


# Flagship hillshade pipeline over the contract world: the query's
# OUTPUT columns (tile metadata + shaded/total pixel counts) are all
# SQL-derivable — with an opaque elecolor base under igor, a pixel is
# shaded iff its height is non-missing, so shaded_px = per-tile
# non-missing count over the regenerated world.  Pixel VALUES stay
# pinned by tests (byte-parity vs the untiled numpy oracle).
SQL_HILLSHADE_TILES = f"""
with {_sql_synth_world()}
select cast(tx as int) as tile_x, cast(ty as int) as tile_y,
       'N' || lpad(cast(ty as varchar), 2, '0')
           || 'E' || lpad(cast(tx as varchar), 3, '0') as tile_name,
       cast({_CQ_TS} as int) as width, cast({_CQ_TS} as int) as height,
       cast(count(case when h <> -32768 then 1 end) as bigint) as shaded_px,
       cast({_CQ_TS * _CQ_TS} as bigint) as total_px
from world
group by tx, ty
"""


def _sql_pip_expr(px: str, py: str, verts) -> str:
    """Crossing-number point-in-polygon as SQL, term-for-term the same
    arithmetic as geometry.points_in_polygon (identical IEEE doubles on
    both engines; no horizontal edges in the contract polygon, so the
    x_at division is always well-defined)."""
    def d(v: float) -> str:
        # bare decimal literals parse as DECIMAL in DuckDB; force the
        # IEEE double the numpy kernel uses
        return f"cast({v!r} as double)"

    terms = []
    n = len(verts)
    j = n - 1
    for i in range(n):
        xi, yi = verts[i]
        xj, yj = verts[j]
        terms.append(
            f"(case when (({d(yi)} > {py}) <> ({d(yj)} > {py})) and "
            f"({px} < (({d(xj)} - {d(xi)}) * ({py} - {d(yi)}) / "
            f"({d(yj)} - {d(yi)}) + {d(xi)})) then 1 else 0 end)"
        )
        j = i
    return "((" + " + ".join(terms) + ") % 2 = 1)"


_CLIP_POLY = [(13.1, 45.1), (13.95, 45.5), (13.4, 45.95)]

# Clipped flagship: tiles prune to the polygon's floor/ceil−1 bbox
# cover, and a pixel is shaded iff non-missing AND its cell lon/lat
# (gx/cpd, gy/cpd — the kernel's convention) passes the SAME
# crossing-number test the engine evaluates per band.
SQL_HILLSHADE_CLIP = f"""
with {_sql_synth_world()}
select cast(tx as int) as tile_x, cast(ty as int) as tile_y,
       'N' || lpad(cast(ty as varchar), 2, '0')
           || 'E' || lpad(cast(tx as varchar), 3, '0') as tile_name,
       cast(count(case when h <> -32768 and
             {_sql_pip_expr(
                 f"(cast(gx as double) / {_CQ_TS})",
                 f"(cast(gy as double) / {_CQ_TS})",
                 _CLIP_POLY,
             )}
           then 1 end) as bigint) as shaded_px,
       cast({_CQ_TS * _CQ_TS} as bigint) as total_px
from world
where tx >= floor({min(v[0] for v in _CLIP_POLY)!r})
  and tx <= ceil({max(v[0] for v in _CLIP_POLY)!r}) - 1
  and ty >= floor({min(v[1] for v in _CLIP_POLY)!r})
  and ty <= ceil({max(v[1] for v in _CLIP_POLY)!r}) - 1
group by tx, ty
"""


# Tile-shade lifecycle completeness: the fixed pipeline starts from a
# SOLID background (TileShadeCommand.fs:333-388), so every pixel of
# every tile must come out shaded — the reference's own acceptance
# shape ("elevation colorer colors all pixels").  The oracle checks
# exactly that completeness plus tile naming; the XTH bit-packing and
# water-shader semantics stay pinned by tests/test_water.py and
# tests/test_engine_spark.py.
SQL_TILE_SHADE_XTH = f"""
select cast(tx as int) as tile_x, cast(ty as int) as tile_y,
       'N' || lpad(cast(ty as varchar), 2, '0')
           || 'E' || lpad(cast(tx as varchar), 3, '0') as tile_name,
       cast({_CQ_TS * _CQ_TS} as bigint) as shaded_px,
       cast({_CQ_TS * _CQ_TS} as bigint) as total_px
from (select unnest(generate_series({_CQ_LON0},
                                    {_CQ_LON0 + _CQ_NTX - 1})) as tx) a
cross join (select unnest(generate_series({_CQ_LAT0},
                                          {_CQ_LAT0 + _CQ_NTY - 1})) as ty) b
"""


# Marching-squares case histogram over the contract world: corner
# heights via three self-joins, case index = the same 4-bit corner code
# the segment extractor uses (any missing corner → 0; uniform 0/15
# excluded), counted per (tile, level).
SQL_TILE_ISOLINE_CASES = f"""
with {_sql_synth_world()},
corners as (
  select b.tx, b.ty,
         b.h as bl, r.h as br, t.h as tl, q.h as tr_
  from world b
  join world r on r.tx = b.tx and r.ty = b.ty
              and r.lx = b.lx + 1 and r.ly = b.ly
  join world t on t.tx = b.tx and t.ty = b.ty
              and t.lx = b.lx and t.ly = b.ly + 1
  join world q on q.tx = b.tx and q.ty = b.ty
              and q.lx = b.lx + 1 and q.ly = b.ly + 1
  where b.lx < {_CQ_TS - 1} and b.ly < {_CQ_TS - 1}
),
cases as (
  select tx, ty, cast(lvl as double) as level,
    case when bl = -32768 or br = -32768 or tl = -32768 or tr_ = -32768
         then 0
         else (case when bl >= lvl then 1 else 0 end)
            + (case when br >= lvl then 2 else 0 end)
            + (case when tr_ >= lvl then 4 else 0 end)
            + (case when tl >= lvl then 8 else 0 end) end as case_id
  from corners
  cross join (select unnest([550.0, 650.0]) as lvl) L
)
select cast(tx as int) as tile_x, cast(ty as int) as tile_y, level,
       cast(case_id as int) as case_id,
       cast(count(*) as bigint) as n_cells
from cases
where case_id between 1 and 14
group by tx, ty, level, case_id
"""


# Posterize classes over the contract world: class = #thresholds ≤ h
# (np.digitize), missing → −1; per-tile pixel count + tile-local bbox.
SQL_TILE_POSTERIZE = f"""
with {_sql_synth_world()},
classed as (
  select tx, ty, lx, ly,
         case when h = -32768 then -1
              else (case when h >= 550 then 1 else 0 end)
                 + (case when h >= 650 then 1 else 0 end) end as class_id
  from world
)
select cast(tx as int) as tile_x, cast(ty as int) as tile_y,
       cast(class_id as int) as class_id,
       cast(count(*) as int) as n_px,
       cast(min(lx) as int) as min_x, cast(min(ly) as int) as min_y,
       cast(max(lx) as int) as max_x, cast(max(ly) as int) as max_y
from classed
group by tx, ty, class_id
"""


# Projected-raster shade command (__spark_entry__._q_shade_raster): the
# whole driver-side geometry — Mercator MBR of the four coverage points,
# 64-px raster-tile split, per-rect corner inversion (±1 px buffer) →
# covering DEM tiles ∩ the available 2×2 world — is rebuilt in SQL from
# the same literals, and shaded_px is recomputed per pixel: a pixel is
# shaded iff its bilinear 4-corner neighborhood (floor/ceil of the
# inverse-projected cell coords) lies inside the group's DEM mosaic with
# all four corners non-missing (kernels.bilinear_interpolate NaN rule).
# Pixel VALUES (Horn p/q on per-pixel geodesic grids, igor shading) stay
# pinned by tests/test_render.py.
_SR_PTS = [(13.2, 45.2), (14.8, 45.2), (13.2, 46.8), (14.8, 46.8)]
_SR_PSF = "(6371000.0 / 5000000.0) * 39.3701 * 96"  # MapScale(5e6, 96)
_SR_PX = 64

SQL_SHADE_RASTER = f"""
with {_sql_synth_world()},
c as (select {_SR_PSF} as psf),
pt as (select * from (values {", ".join(f"({lon!r}, {lat!r})" for lon, lat in _SR_PTS)}) v(lon, lat)),
mbr as (
  select cast(floor(min(radians(lon) * psf)) as bigint) as mnx,
         cast(floor(min(ln(tan(pi()/4 + radians(lat)/2)) * psf)) as bigint) as mny,
         cast(ceil(max(radians(lon) * psf)) as bigint) as mxx,
         cast(ceil(max(ln(tan(pi()/4 + radians(lat)/2)) * psf)) as bigint) as mxy
  from pt cross join c
),
grid as (
  select xi, yi,
         mnx + xi * {_SR_PX} as rx, mny + yi * {_SR_PX} as ry,
         cast(least({_SR_PX}, mxx - (mnx + xi * {_SR_PX})) as int) as w,
         cast(least({_SR_PX}, mxy - (mny + yi * {_SR_PX})) as int) as h
  from mbr
  cross join (select unnest(generate_series(0, 63)) as xi) gxi
  cross join (select unnest(generate_series(0, 63)) as yi) gyi
  where mnx + xi * {_SR_PX} < mxx and mny + yi * {_SR_PX} < mxy
),
cov as (
  select g.*,
    greatest(cast(floor(degrees((rx - 1) / psf)) as int), {_CQ_LON0}) as tx_lo,
    least(cast(ceil(degrees((rx + w + 1) / psf)) as int) - 1,
          {_CQ_LON0 + _CQ_NTX - 1}) as tx_hi,
    greatest(cast(floor(degrees(2*atan(exp((ry - 1) / psf)) - pi()/2)) as int),
             {_CQ_LAT0}) as ty_lo,
    least(cast(ceil(degrees(2*atan(exp((ry + h + 1) / psf)) - pi()/2)) as int) - 1,
          {_CQ_LAT0 + _CQ_NTY - 1}) as ty_hi
  from grid g cross join c
),
rects as (
  select xi, yi, rx, ry, w, h,
         (tx_hi - tx_lo + 1) * (ty_hi - ty_lo + 1) as n_dem,
         tx_lo * {_CQ_TS} as cx0, ty_lo * {_CQ_TS} as cy0,
         (tx_hi - tx_lo + 1) * {_CQ_TS} as mw,
         (ty_hi - ty_lo + 1) * {_CQ_TS} as mh
  from cov
  where tx_hi >= tx_lo and ty_hi >= ty_lo
),
px as (
  select r.xi, r.yi,
         degrees((r.rx + p.i) / psf) * {float(_CQ_TS)!r} - r.cx0 as x,
         degrees(2*atan(exp((r.ry + q.i) / psf)) - pi()/2) * {float(_CQ_TS)!r}
           - r.cy0 as y,
         r.cx0, r.cy0, r.mw, r.mh
  from rects r cross join c
  cross join (select unnest(generate_series(0, {_SR_PX - 1})) as i) p
  cross join (select unnest(generate_series(0, {_SR_PX - 1})) as i) q
  where p.i < r.w and q.i < r.h
),
shaded as (
  select xi, yi, count(*) as n
  from px
  where floor(x) >= 0 and floor(y) >= 0 and ceil(x) < mw and ceil(y) < mh
    and exists (select 1 from world w1 where w1.gx = cast(floor(px.x) as int) + px.cx0
                and w1.gy = cast(floor(px.y) as int) + px.cy0 and w1.h <> -32768)
    and exists (select 1 from world w2 where w2.gx = cast(ceil(px.x) as int) + px.cx0
                and w2.gy = cast(floor(px.y) as int) + px.cy0 and w2.h <> -32768)
    and exists (select 1 from world w3 where w3.gx = cast(floor(px.x) as int) + px.cx0
                and w3.gy = cast(ceil(px.y) as int) + px.cy0 and w3.h <> -32768)
    and exists (select 1 from world w4 where w4.gx = cast(ceil(px.x) as int) + px.cx0
                and w4.gy = cast(ceil(px.y) as int) + px.cy0 and w4.h <> -32768)
  group by xi, yi
)
select cast(r.xi as int) as rt_x, cast(r.yi as int) as rt_y,
       r.w as width, r.h as height,
       cast(coalesce(s.n, 0) as bigint) as shaded_px,
       cast(r.w * r.h as bigint) as total_px,
       cast(r.n_dem as int) as n_dem_tiles
from rects r left join shaded s on r.xi = s.xi and r.yi = s.yi
"""


# Projected-raster shade under Lambert Conformal Conic 2SP
# (__spark_entry__._q_shade_raster_lcc) — the reference's tile-shade /
# shade commands accept any PROJ projection (TileShadeCommand.fs:390-425,
# Factory.fs:10-18); this twin rebuilds the ENTIRE LCC math in SQL from
# the raw public parameters (GRS80 axes, standard parallels), never from
# the engine's derived constants:
#   - cone constants ns/F/rho0 from msfnz/tsfnz closed forms
#     (Common.fs:158-176) — same operation order as projections.py so
#     the doubles are bit-identical,
#   - forward projection of the coverage points -> raster MBR -> 64-px
#     raster-tile split (same grid as SQL_SHADE_RASTER),
#   - per-point INVERSE projection (rect corners +-1 px for DEM cover,
#     every pixel for the shaded count) with phi2z's iterative latitude
#     (Common.fs:178-199) as a per-row recursive CTE: iterate
#     phi += dphi until |dphi| < 1e-10 (<=15 rounds), exactly the
#     engine's per-lane convergence rule,
#   - shaded_px by the same bilinear 4-corner non-missing rule as the
#     Mercator twin.  Pixel VALUES stay pinned by tests/test_render.py;
#     the LCC formulas themselves are pinned against cs2cs control
#     points in tests/test_projections.py.
LCC_CONTRACT_SPEC = (
    "+proj=lcc +lon_0=14 +lat_0=45 +lat_1=45.25 +lat_2=46.75 +ellps=grs80"
)

SQL_SHADE_RASTER_LCC = f"""
with recursive {_sql_synth_world()},
lp as (
  select 6378137.0 as a, 6356752.314140347 as b,
         radians(14.0) as lon0, radians(45.0) as lat0r,
         radians(45.25) as lat1, radians(46.75) as lat2,
         1.0 as k0, 0.0 as px0, 0.0 as py0,
         39.3701 * 96.0 / 5000000.0 as sf
),
le as (select *, sqrt(1.0 - (b / a) * (b / a)) as e from lp),
lm as (select *,
  cos(lat1) / sqrt(1.0 - (e * sin(lat1)) * (e * sin(lat1))) as ms1,
  cos(lat2) / sqrt(1.0 - (e * sin(lat2)) * (e * sin(lat2))) as ms2,
  tan(0.5 * (pi() / 2.0 - lat1))
    / pow((1.0 - e * sin(lat1)) / (1.0 + e * sin(lat1)), e / 2.0) as ts1,
  tan(0.5 * (pi() / 2.0 - lat2))
    / pow((1.0 - e * sin(lat2)) / (1.0 + e * sin(lat2)), e / 2.0) as ts2,
  tan(0.5 * (pi() / 2.0 - lat0r))
    / pow((1.0 - e * sin(lat0r)) / (1.0 + e * sin(lat0r)), e / 2.0) as ts0
  from le),
ln_ as (select *, ln(ms1 / ms2) / ln(ts1 / ts2) as ns from lm),
lf as (select *, ms1 / (ns * pow(ts1, ns)) as f0 from ln_),
lcc as (select *, a * f0 * pow(ts0, ns) as rho0 from lf),
pt as (select * from (values {", ".join(f"({lon!r}, {lat!r})" for lon, lat in _SR_PTS)}) v(lon, lat)),
fwdt as (
  select l.*,
    a * f0 * pow(tan(0.5 * (pi() / 2.0 - radians(lat)))
      / pow((1.0 - e * sin(radians(lat))) / (1.0 + e * sin(radians(lat))),
            e / 2.0), ns) as rh1,
    ns * (radians(lon) - lon0) as theta
  from pt p cross join lcc l
),
fwd as (
  select (k0 * (rh1 * sin(theta)) + px0) * sf as x,
         (k0 * (rho0 - rh1 * cos(theta)) + py0) * sf as y
  from fwdt
),
mbr as (
  select cast(floor(min(x)) as bigint) as mnx,
         cast(floor(min(y)) as bigint) as mny,
         cast(ceil(max(x)) as bigint) as mxx,
         cast(ceil(max(y)) as bigint) as mxy
  from fwd
),
grid as (
  select xi, yi,
         mnx + xi * {_SR_PX} as rx, mny + yi * {_SR_PX} as ry,
         cast(least({_SR_PX}, mxx - (mnx + xi * {_SR_PX})) as int) as w,
         cast(least({_SR_PX}, mxy - (mny + yi * {_SR_PX})) as int) as h
  from mbr
  cross join (select unnest(generate_series(0, 63)) as xi) gxi
  cross join (select unnest(generate_series(0, 63)) as yi) gyi
  where mnx + xi * {_SR_PX} < mxx and mny + yi * {_SR_PX} < mxy
),
ipts as (
  select xi, yi, -1 as ii, -1 as jj,
         cast(rx - 1 as double) as xr, cast(ry - 1 as double) as yr from grid
  union all
  select xi, yi, -2, -2, cast(rx - 1 as double),
         cast(ry + h + 1 as double) from grid
  union all
  select xi, yi, -3, -3, cast(rx + w + 1 as double),
         cast(ry - 1 as double) from grid
  union all
  select xi, yi, -4, -4, cast(rx + w + 1 as double),
         cast(ry + h + 1 as double) from grid
  union all
  select g.xi, g.yi, p.i, q.i,
         cast(g.rx + p.i as double), cast(g.ry + q.i as double)
  from grid g
  cross join (select unnest(generate_series(0, {_SR_PX - 1})) as i) p
  cross join (select unnest(generate_series(0, {_SR_PX - 1})) as i) q
  where p.i < g.w and q.i < g.h
),
inv1 as (
  select i.xi, i.yi, i.ii, i.jj, l.e, l.ns, l.lon0, l.a, l.f0,
         (i.xr / l.sf - l.px0) / l.k0 as xp,
         l.rho0 - (i.yr / l.sf - l.py0) / l.k0 as yp
  from ipts i cross join lcc l
),
inv2 as (select *, sqrt(xp * xp + yp * yp) as rh1 from inv1),
inv3 as (
  select xi, yi, ii, jj, ns, lon0,
    case when rh1 = 0.0 then 0.0 else atan2(xp, yp) end as theta,
    pow(rh1 / (a * f0), 1.0 / ns) as tsv
  from inv2
),
ph(xi, yi, ii, jj, tsv, it, phi, done) as (
  select xi, yi, ii, jj, tsv, 0,
         pi() / 2.0 - 2.0 * atan(tsv), false
  from inv3
  union all
  select xi, yi, ii, jj, tsv, it + 1, phi + dphi, abs(dphi) < 1.0e-10
  from (
    select p.xi, p.yi, p.ii, p.jj, p.tsv, p.it, p.phi,
      pi() / 2.0
        - 2.0 * atan(p.tsv * pow((1.0 - l.e * sin(p.phi))
                                 / (1.0 + l.e * sin(p.phi)), l.e / 2.0))
        - p.phi as dphi
    from ph p cross join lcc l
    where not p.done and p.it < 15
  ) t
),
pll as (
  select v.xi, v.yi, v.ii, v.jj,
         degrees(v.theta / v.ns + v.lon0) as lon_deg,
         degrees(f.lat) as lat_deg
  from inv3 v
  join (select xi, yi, ii, jj, max(phi) filter (where done) as lat
        from ph group by xi, yi, ii, jj) f
    on f.xi = v.xi and f.yi = v.yi and f.ii = v.ii and f.jj = v.jj
  where f.lat is not null
),
cov as (
  select xi, yi,
    greatest(cast(floor(min(lon_deg) * {float(_CQ_TS)!r} / {_CQ_TS}) as int),
             {_CQ_LON0}) as tx_lo,
    least(cast(ceil(max(lon_deg) * {float(_CQ_TS)!r} / {_CQ_TS}) as int) - 1,
          {_CQ_LON0 + _CQ_NTX - 1}) as tx_hi,
    greatest(cast(floor(min(lat_deg) * {float(_CQ_TS)!r} / {_CQ_TS}) as int),
             {_CQ_LAT0}) as ty_lo,
    least(cast(ceil(max(lat_deg) * {float(_CQ_TS)!r} / {_CQ_TS}) as int) - 1,
          {_CQ_LAT0 + _CQ_NTY - 1}) as ty_hi
  from pll where ii < 0 group by xi, yi
),
rects as (
  select g.xi, g.yi, g.w, g.h,
         (c.tx_hi - c.tx_lo + 1) * (c.ty_hi - c.ty_lo + 1) as n_dem,
         c.tx_lo * {_CQ_TS} as cx0, c.ty_lo * {_CQ_TS} as cy0,
         (c.tx_hi - c.tx_lo + 1) * {_CQ_TS} as mw,
         (c.ty_hi - c.ty_lo + 1) * {_CQ_TS} as mh
  from grid g join cov c on c.xi = g.xi and c.yi = g.yi
  where c.tx_hi >= c.tx_lo and c.ty_hi >= c.ty_lo
),
px as (
  select p.xi, p.yi,
         p.lon_deg * {float(_CQ_TS)!r} - r.cx0 as x,
         p.lat_deg * {float(_CQ_TS)!r} - r.cy0 as y,
         r.cx0, r.cy0, r.mw, r.mh
  from pll p join rects r on r.xi = p.xi and r.yi = p.yi
  where p.ii >= 0
),
shaded as (
  select xi, yi, count(*) as n
  from px
  where floor(x) >= 0 and floor(y) >= 0 and ceil(x) < mw and ceil(y) < mh
    and exists (select 1 from world w1 where w1.gx = cast(floor(px.x) as int) + px.cx0
                and w1.gy = cast(floor(px.y) as int) + px.cy0 and w1.h <> -32768)
    and exists (select 1 from world w2 where w2.gx = cast(ceil(px.x) as int) + px.cx0
                and w2.gy = cast(floor(px.y) as int) + px.cy0 and w2.h <> -32768)
    and exists (select 1 from world w3 where w3.gx = cast(floor(px.x) as int) + px.cx0
                and w3.gy = cast(ceil(px.y) as int) + px.cy0 and w3.h <> -32768)
    and exists (select 1 from world w4 where w4.gx = cast(ceil(px.x) as int) + px.cx0
                and w4.gy = cast(ceil(px.y) as int) + px.cy0 and w4.h <> -32768)
  group by xi, yi
)
select cast(r.xi as int) as rt_x, cast(r.yi as int) as rt_y,
       r.w as width, r.h as height,
       cast(coalesce(s.n, 0) as bigint) as shaded_px,
       cast(r.w * r.h as bigint) as total_px,
       cast(r.n_dem as int) as n_dem_tiles
from rects r left join shaded s on r.xi = s.xi and r.yi = s.yi
"""


# Marching-squares isoline stats (__spark_entry__._q_tile_isolines):
# segments are regenerated per cell from the case table with the SAME
# interpolation formula (isolines._CASES / _interp), degenerate
# zero-length segments dropped by the same 1e-12 rule, and the chain
# taxonomy is recovered graph-theoretically — endpoints keyed at the
# chainer's 1e-9 tolerance, n_clipped = components containing an
# odd-degree endpoint, n_closed = the rest (valid because every
# endpoint has degree ≤ 2 here, which makes greedy chaining equal to
# connected components; chain GEOMETRY stays pinned in
# tests/test_isolines.py).
_ISO_LEVELS = [550.0, 650.0]

SQL_TILE_ISOLINES = f"""
with recursive {_sql_synth_world()},
levels as (select cast(v.l as double) as level
           from (values {", ".join(f"({lv!r})" for lv in _ISO_LEVELS)}) v(l)),
cells as (
  select bl.tx, bl.ty, bl.lx as x, bl.ly as y, lv.level as level,
         cast(bl.h as double) as bl, cast(br.h as double) as br,
         cast(tr.h as double) as tr, cast(tl.h as double) as tl,
         case when bl.h <> -32768 and br.h <> -32768
               and tr.h <> -32768 and tl.h <> -32768
              then (case when bl.h >= lv.level then 1 else 0 end)
                 + (case when br.h >= lv.level then 2 else 0 end)
                 + (case when tr.h >= lv.level then 4 else 0 end)
                 + (case when tl.h >= lv.level then 8 else 0 end)
              else 0 end as cid
  from world bl
  join world br on br.tx = bl.tx and br.ty = bl.ty
               and br.lx = bl.lx + 1 and br.ly = bl.ly
  join world tr on tr.tx = bl.tx and tr.ty = bl.ty
               and tr.lx = bl.lx + 1 and tr.ly = bl.ly + 1
  join world tl on tl.tx = bl.tx and tl.ty = bl.ty
               and tl.lx = bl.lx and tl.ly = bl.ly + 1
  cross join levels lv
  where bl.lx < {_CQ_TS - 1} and bl.ly < {_CQ_TS - 1}
),
pairs as (
  select * from (values
    (1,3,0),(14,3,0),(2,0,1),(13,0,1),(4,1,2),(11,1,2),(8,2,3),(7,2,3),
    (3,3,1),(12,3,1),(6,0,2),(9,0,2),(5,3,2),(5,1,0),(10,0,3),(10,2,1)
  ) v(cid, ea, eb)
),
segs0 as (
  select c.tx, c.ty, c.level,
    least(greatest((c.level - c.bl) / (c.br - c.bl), 0.0), 1.0) as t0,
    least(greatest((c.level - c.br) / (c.tr - c.br), 0.0), 1.0) as t1,
    least(greatest((c.level - c.tl) / (c.tr - c.tl), 0.0), 1.0) as t2,
    least(greatest((c.level - c.bl) / (c.tl - c.bl), 0.0), 1.0) as t3,
    c.x, c.y, p.ea, p.eb
  from cells c join pairs p on p.cid = c.cid
),
segs as (
  select tx, ty, level,
    case ea when 0 then x + t0 when 1 then x + 1.0
            when 2 then x + t2 else cast(x as double) end as x0,
    case ea when 0 then cast(y as double) when 1 then y + t1
            when 2 then y + 1.0 else y + t3 end as y0,
    case eb when 0 then x + t0 when 1 then x + 1.0
            when 2 then x + t2 else cast(x as double) end as x1,
    case eb when 0 then cast(y as double) when 1 then y + t1
            when 2 then y + 1.0 else y + t3 end as y1
  from segs0
),
live as (
  select *, cast(round(x0 * 1e9) as bigint) as ka_x,
            cast(round(y0 * 1e9) as bigint) as ka_y,
            cast(round(x1 * 1e9) as bigint) as kb_x,
            cast(round(y1 * 1e9) as bigint) as kb_y
  from segs
  where abs(x0 - x1) > 1e-12 or abs(y0 - y1) > 1e-12
),
nodes as (
  select distinct tx, ty, level, ka_x as nx, ka_y as ny from live
  union
  select distinct tx, ty, level, kb_x, kb_y from live
),
deg as (
  select tx, ty, level, nx, ny, count(*) as d from (
    select tx, ty, level, ka_x as nx, ka_y as ny from live
    union all
    select tx, ty, level, kb_x, kb_y from live
  ) group by all
),
edges as (
  select tx, ty, level, ka_x as ax, ka_y as ay, kb_x as bx, kb_y as by_
  from live
  union all
  select tx, ty, level, kb_x, kb_y, ka_x, ka_y from live
),
reach(tx, ty, level, nx, ny, rx, ry) as (
  select tx, ty, level, nx, ny, nx, ny from nodes
  union
  select e.tx, e.ty, e.level, e.bx, e.by_, r.rx, r.ry
  from reach r join edges e on e.tx = r.tx and e.ty = r.ty
    and e.level = r.level and e.ax = r.nx and e.ay = r.ny
),
comp as (
  select tx, ty, level, nx, ny,
         min(cast(rx as hugeint) * 200000000000 + ry) as root
  from reach group by tx, ty, level, nx, ny
),
chainstats as (
  select c.tx, c.ty, c.level,
         count(distinct c.root) as n_chains,
         count(distinct case when d.d % 2 = 1 then c.root end) as n_paths
  from comp c join deg d on d.tx = c.tx and d.ty = c.ty
    and d.level = c.level and d.nx = c.nx and d.ny = c.ny
  group by c.tx, c.ty, c.level
),
segstats as (
  select tx, ty, level,
         count(*) as n_segments,
         round(sum(sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0))), 6)
           as total_len
  from live group by tx, ty, level
)
select cast(t.tx as int) as tile_x, cast(t.ty as int) as tile_y,
       lv.level as level,
       cast(coalesce(s.n_segments, 0) as bigint) as n_segments,
       cast(coalesce(c.n_chains - c.n_paths, 0) as bigint) as n_closed,
       cast(coalesce(c.n_paths, 0) as bigint) as n_clipped,
       cast(coalesce(s.total_len, 0.0) as double) as total_len
from (select distinct tx, ty from world) t
cross join levels lv
left join segstats s on s.tx = t.tx and s.ty = t.ty and s.level = lv.level
left join chainstats c on c.tx = t.tx and c.ty = t.ty and c.level = lv.level
"""


# ---------------------------------------------------------------------------
# S2-style hierarchical geocell index (north_rule "H3/S2 index")
# ---------------------------------------------------------------------------
#
# Catalyst-ONLY implementation: the cube-face projection, quadratic ST
# transform and the per-level Hilbert state machine all compile to JVM
# whole-stage-codegen expressions (the 2-bit orientation chain unrolls
# into LEVEL chained CASEs) — zero Python in the hot path, unlike the
# mapInPandas route demeton_spark.geocell also offers.  The DuckDB twin
# below is generated from the same public tables but through an
# independent chain of unrolled CTEs.

GEOCELL_LEVEL = 12
GEOCELL_PARENT_LEVEL = 5

# Hilbert tables (public S2 scheme; see demeton_spark/geocell.py)
_GC_IJ_TO_POS = (0, 1, 3, 2, 0, 3, 1, 2, 2, 3, 1, 0, 2, 1, 3, 0)
_GC_POS_TO_ORIENT = (1, 0, 0, 3)


def _with_geocell(
    df: DataFrame, level: int, keep: list, ij_only: bool = False
) -> DataFrame:
    """Add (face, cell_id) for (lon, lat) columns, pure Catalyst —
    or just the discrete (face, i, j) grid coordinate when ``ij_only``
    (the key shape cell-neighborhood joins bucket on).

    The Hilbert orientation chain is emitted as one NAMED projection
    per level (orientation feeds two consumers each level, so a single
    inlined expression tree would double per level — 2^level nodes;
    named columns keep it linear and let whole-stage codegen split
    across projections)."""
    lon, lat = F.col("lon"), F.col("lat")
    x = F.cos(F.radians(lat)) * F.cos(F.radians(lon))
    y = F.cos(F.radians(lat)) * F.sin(F.radians(lon))
    z = F.sin(F.radians(lat))
    df = df.select(*keep, x.alias("_x"), y.alias("_y"), z.alias("_z"))
    x, y, z = F.col("_x"), F.col("_y"), F.col("_z")
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    face = (
        F.when((ax >= ay) & (ax >= az), F.when(x >= 0, 0).otherwise(3))
        .when(ay >= az, F.when(y >= 0, 1).otherwise(4))
        .otherwise(F.when(z >= 0, 2).otherwise(5))
    )
    df = df.select(*keep, face.alias("face"), "_x", "_y", "_z")
    face = F.col("face")
    # ValidFaceXYZtoUV: divisor is the face's raw (possibly negative)
    # dominant component
    u = (
        F.when(face == 0, y / x)
        .when(face == 1, -x / y)
        .when(face == 2, -x / z)
        .when(face == 3, z / x)
        .when(face == 4, z / y)
        .otherwise(-y / z)
    )
    v = (
        F.when(face == 0, z / x)
        .when(face == 1, z / y)
        .when(face == 2, -y / z)
        .when(face == 3, y / x)
        .when(face == 4, -x / y)
        .otherwise(-x / z)
    )

    def st(c):
        return F.when(
            c >= 0, F.lit(0.5) * F.sqrt(F.lit(1.0) + F.lit(3.0) * c)
        ).otherwise(F.lit(1.0) - F.lit(0.5) * F.sqrt(F.lit(1.0) - F.lit(3.0) * c))

    n = 1 << level
    df = df.select(*keep, "face", st(u).alias("_s"), st(v).alias("_t"))

    def ij(c):
        return F.greatest(
            F.lit(0).cast("long"),
            F.least(F.lit(n - 1).cast("long"), F.floor(c * n).cast("long")),
        )

    if ij_only:
        return df.select(
            *keep,
            F.col("face").cast("int").alias("face"),
            ij(F.col("_s")).alias("i"),
            ij(F.col("_t")).alias("j"),
        )
    df = df.select(
        *keep,
        "face",
        ij(F.col("_s")).alias("_i"),
        ij(F.col("_t")).alias("_j"),
        (face % 2).cast("int").alias("_o"),
        F.lit(0).cast("long").alias("_pos"),
    )
    i, j = F.col("_i"), F.col("_j")
    for k in range(level - 1, -1, -1):
        # closed form of the _GC_IJ_TO_POS table: orientation bit 0
        # swaps the i/j bits, bit 1 inverts both, then pos is the
        # inverse Gray code of the quadrant (the canonical U-order)
        ij = ((F.shiftright(i, k) % 2) * 2 + F.shiftright(j, k) % 2).cast("int")
        swapped = F.when(
            F.col("_o").bitwiseAND(1) == 1,
            (ij.bitwiseAND(1) * 2) + F.shiftright(ij, 1),
        ).otherwise(ij)
        df = df.select(
            *keep, "face", "_i", "_j", "_o", "_pos",
            F.when(
                F.col("_o").bitwiseAND(2) == 2, swapped.bitwiseXOR(3)
            ).otherwise(swapped).alias("_ij"),
        )
        ij_e = F.col("_ij")
        p = ij_e.bitwiseAND(2) + ij_e.bitwiseXOR(F.shiftright(ij_e, 1)).bitwiseAND(1)
        df = df.select(
            *keep, "face", "_i", "_j", "_o", "_pos", p.alias("_p")
        )
        df = df.select(
            *keep,
            "face",
            "_i",
            "_j",
            (F.col("_pos") * 4 + F.col("_p")).alias("_pos"),
            F.col("_o")
            .bitwiseXOR(
                F.when(F.col("_p") == 0, 1).when(F.col("_p") == 3, 3).otherwise(0)
            )
            .alias("_o"),
        )
    return df.select(
        *keep,
        F.col("face").cast("int").alias("face"),
        (F.col("face").cast("long") * (1 << (2 * level)) + F.col("_pos")).alias(
            "cell_id"
        ),
    )


_GEOCELL_MEMO: dict[tuple[str, str], DataFrame] = {}


def q_geocell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every event point to its level-12 S2-style geocell and
    aggregate — the "H3/S2 cell encoding assigns every row" join from
    the north rule, Catalyst-only (one hash-agg shuffle; no UDF).

    The aggregated cell table is localCheckpoint-materialized per
    (session, sf_dir): downstream consumers (rollup) read the written
    cell table at production scale rather than re-encoding."""
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _GEOCELL_MEMO.get(key)
    if df is None:
        pts = _pts(spark, sf_dir)
        cells = _with_geocell(pts, GEOCELL_LEVEL, keep=["value"])
        df = (
            cells.groupBy("face", "cell_id")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 6).alias("sum_value"),
            )
            .localCheckpoint()
        )
        _GEOCELL_MEMO[key] = df
        if len(_GEOCELL_MEMO) > 8:
            _GEOCELL_MEMO.pop(next(iter(_GEOCELL_MEMO)))
    return df


def q_geocell_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll level-12 cells up to their level-5 Hilbert parents.

    Parent id = one integer division (compact id ``face·4^L + pos``);
    the hierarchy never re-touches trig — this is the query shape a
    10^12-row table uses to build coarse skew statistics, and because
    child ids of a parent are CONTIGUOUS, at scale it reads an
    Iceberg table sorted by cell_id with near-perfect file pruning."""
    cells = q_geocell_assign(spark, sf_dir)
    step = 1 << (2 * (GEOCELL_LEVEL - GEOCELL_PARENT_LEVEL))
    return (
        cells.groupBy(
            F.expr(f"cell_id div {step}").alias("parent_cell")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.count("*").alias("n_child_cells"),
            F.round(F.sum("sum_value"), 6).alias("sum_value"),
        )
    )


def _geocell_assign_sql(level: int) -> str:
    """Generate the DuckDB twin: same public math, independent code
    path (unrolled CTE chain for the Hilbert orientation chain)."""
    n = 1 << level
    ij2pos_cases = " ".join(
        f"when {c} then {_GC_IJ_TO_POS[c]}" for c in range(16)
    )
    steps = []
    prev = "st2"
    for idx, k in enumerate(range(level - 1, -1, -1)):
        cur = f"h{idx}"
        steps.append(
            f"""{cur} as (
  select event_id, value, face,
         pos * 4 + p as pos,
         xor(orient, case p when 0 then 1 when 3 then 3 else 0 end) as orient,
         i, j
  from (
    select *, (case orient * 4 + ((i // {1 << k}) % 2) * 2 + ((j // {1 << k}) % 2)
               {ij2pos_cases} end) as p
    from {prev}
  )
)"""
        )
        prev = cur
    chain = ",\n".join(steps)
    return f"""
with pts as ({_PTS_SQL}),
xyz as (
  select event_id, value,
         cos(radians(lat)) * cos(radians(lon)) as x,
         cos(radians(lat)) * sin(radians(lon)) as y,
         sin(radians(lat)) as z
  from pts
),
fuv as (
  select event_id, value,
         case when abs(x) >= abs(y) and abs(x) >= abs(z)
              then case when x >= 0 then 0 else 3 end
              when abs(y) >= abs(z)
              then case when y >= 0 then 1 else 4 end
              else case when z >= 0 then 2 else 5 end end as face,
         x, y, z
  from xyz
),
uv as (
  select event_id, value, face,
         case face when 0 then y / x when 1 then -x / y when 2 then -x / z
                   when 3 then z / x when 4 then z / y else -y / z end as u,
         case face when 0 then z / x when 1 then z / y when 2 then -y / z
                   when 3 then y / x when 4 then -x / y else -x / z end as v
  from fuv
),
st as (
  select event_id, value, face,
         greatest(0, least({n - 1}, cast(floor(
           (case when u >= 0 then 0.5 * sqrt(1 + 3 * u)
                 else 1 - 0.5 * sqrt(1 - 3 * u) end) * {n}) as bigint))) as i,
         greatest(0, least({n - 1}, cast(floor(
           (case when v >= 0 then 0.5 * sqrt(1 + 3 * v)
                 else 1 - 0.5 * sqrt(1 - 3 * v) end) * {n}) as bigint))) as j
  from uv
),
st2 as (
  select event_id, value, face, face % 2 as orient,
         cast(0 as bigint) as pos, i, j
  from st
),
{chain}
select cast(face as int) as face,
       cast(face as bigint) * {1 << (2 * level)} + pos as cell_id,
       cast(count(*) as bigint) as n_events,
       round(sum(value), 6) as sum_value
from {prev}
group by 1, 2
"""


SQL_GEOCELL_ASSIGN = _geocell_assign_sql(GEOCELL_LEVEL)

SQL_GEOCELL_ROLLUP = f"""
with cells as ({SQL_GEOCELL_ASSIGN})
select cast(cell_id // {1 << (2 * (GEOCELL_LEVEL - GEOCELL_PARENT_LEVEL))} as bigint)
         as parent_cell,
       cast(sum(n_events) as bigint) as n_events,
       cast(count(*) as bigint) as n_child_cells,
       round(sum(sum_value), 6) as sum_value
from cells
group by 1
"""


# --- spatial kNN via cell-neighborhood buckets ------------------------------
#
# The north rule's "kNN" over the cell index: every point is keyed by
# its (face, i, j) grid coordinate, a probe's candidates are the 3×3
# cell neighborhood (9 equi-join keys — at 10^12 rows only same-bucket
# blocks are touched, never an all-pairs join), then exact great-circle
# chord distance ranks the survivors.  Cross-face neighborhoods are NOT
# stitched (the ring clips at the face edge); geo_knn_recall measures
# what that costs against exact brute force instead of assuming it.

GEO_KNN_LEVEL = 5
GEO_KNN_K = 3


def _with_xyz(df: DataFrame, keep: list) -> DataFrame:
    lon, lat = F.col("lon"), F.col("lat")
    return df.select(
        *keep,
        "lon",
        "lat",
        (F.cos(F.radians(lat)) * F.cos(F.radians(lon))).alias("x"),
        (F.cos(F.radians(lat)) * F.sin(F.radians(lon))).alias("y"),
        F.sin(F.radians(lat)).alias("z"),
    )


def _geo_pts_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _pts(spark, sf_dir).select("event_id", "lon", "lat")
    keyed = _with_geocell(
        pts, GEO_KNN_LEVEL, keep=["event_id", "lon", "lat"], ij_only=True
    )
    return _with_xyz(keyed, keep=["event_id", "face", "i", "j"])


def q_geo_knn_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 nearest event points per probe via the cell-bucket join."""
    from pyspark.sql import Window

    base = _geo_pts_keyed(spark, sf_dir)
    ring = F.array(
        *[
            F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
            for di in (-1, 0, 1)
            for dj in (-1, 0, 1)
        ]
    )
    probes = (
        base.where(F.col("event_id") < 5)
        .select(
            F.col("event_id").alias("query_id"),
            F.col("face"),
            F.col("i"),
            F.col("j"),
            F.col("x").alias("qx"),
            F.col("y").alias("qy"),
            F.col("z").alias("qz"),
            F.explode(ring).alias("d"),
        )
        .select(
            "query_id",
            "face",
            (F.col("i") + F.col("d.di")).alias("i"),
            (F.col("j") + F.col("d.dj")).alias("j"),
            "qx",
            "qy",
            "qz",
        )
    )
    cand = probes.join(base, ["face", "i", "j"]).where(
        F.col("event_id") != F.col("query_id")
    )
    chord_sq = (
        (F.col("qx") - F.col("x")) * (F.col("qx") - F.col("x"))
        + (F.col("qy") - F.col("y")) * (F.col("qy") - F.col("y"))
        + (F.col("qz") - F.col("z")) * (F.col("qz") - F.col("z"))
    )
    w = Window.partitionBy("query_id").orderBy("chord_sq", "neighbor_id")
    return (
        cand.select(
            "query_id",
            F.col("event_id").alias("neighbor_id"),
            chord_sq.alias("chord_sq"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= GEO_KNN_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("chord_sq"), 9).alias("chord_sq"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def q_geo_knn_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the cell-bucket kNN vs exact brute force
    (bounded 5×N cross join — the gate, not the data path)."""
    from pyspark.sql import Window

    base = _with_xyz(
        _pts(spark, sf_dir).select("event_id", "lon", "lat"),
        keep=["event_id"],
    )
    probes = base.where(F.col("event_id") < 5).select(
        F.col("event_id").alias("query_id"),
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
        F.col("z").alias("qz"),
    )
    chord_sq = (
        (F.col("qx") - F.col("x")) * (F.col("qx") - F.col("x"))
        + (F.col("qy") - F.col("y")) * (F.col("qy") - F.col("y"))
        + (F.col("qz") - F.col("z")) * (F.col("qz") - F.col("z"))
    )
    w = Window.partitionBy("query_id").orderBy("chord_sq", "neighbor_id")
    exact = (
        probes.crossJoin(base)
        .where(F.col("event_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("event_id").alias("neighbor_id"),
            chord_sq.alias("chord_sq"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= GEO_KNN_K)
        .select("query_id", "neighbor_id")
    )
    approx = q_geo_knn_cells(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("hit_id")
    )
    return (
        exact.join(
            approx,
            (exact.query_id == approx.query_id)
            & (exact.neighbor_id == approx.hit_id),
            "left",
        )
        .drop(approx.query_id)
        .groupBy("query_id")
        .agg(
            F.count("*").cast("int").alias("k"),
            F.sum(F.when(F.col("hit_id").isNotNull(), 1).otherwise(0))
            .cast("int")
            .alias("hits"),
            F.round(
                F.sum(F.when(F.col("hit_id").isNotNull(), 1).otherwise(0))
                / F.count("*"),
                6,
            ).alias("recall"),
        )
    )


_GEO_PTS_KEYED_SQL = f"""
pts as ({_PTS_SQL}),
xyz as (
  select event_id,
         cos(radians(lat)) * cos(radians(lon)) as x,
         cos(radians(lat)) * sin(radians(lon)) as y,
         sin(radians(lat)) as z
  from pts
),
fuv as (
  select event_id, x, y, z,
         case when abs(x) >= abs(y) and abs(x) >= abs(z)
              then case when x >= 0 then 0 else 3 end
              when abs(y) >= abs(z)
              then case when y >= 0 then 1 else 4 end
              else case when z >= 0 then 2 else 5 end end as face
  from xyz
),
keyed as (
  select event_id, x, y, z, face,
         greatest(0, least({(1 << GEO_KNN_LEVEL) - 1}, cast(floor(
           (case when u >= 0 then 0.5 * sqrt(1 + 3 * u)
                 else 1 - 0.5 * sqrt(1 - 3 * u) end) * {1 << GEO_KNN_LEVEL})
           as bigint))) as i,
         greatest(0, least({(1 << GEO_KNN_LEVEL) - 1}, cast(floor(
           (case when v >= 0 then 0.5 * sqrt(1 + 3 * v)
                 else 1 - 0.5 * sqrt(1 - 3 * v) end) * {1 << GEO_KNN_LEVEL})
           as bigint))) as j
  from (
    select event_id, x, y, z, face,
           case face when 0 then y / x when 1 then -x / y when 2 then -x / z
                     when 3 then z / x when 4 then z / y else -y / z end as u,
           case face when 0 then z / x when 1 then z / y when 2 then -y / z
                     when 3 then y / x when 4 then -x / y else -x / z end as v
    from fuv
  )
)"""

SQL_GEO_KNN_CELLS = f"""
with {_GEO_PTS_KEYED_SQL},
probes as (
  select k.event_id as query_id, k.face, k.i + dd.di as i, k.j + d2.dj as j,
         k.x as qx, k.y as qy, k.z as qz
  from keyed k
  cross join (select unnest(generate_series(-1, 1)) as di) dd
  cross join (select unnest(generate_series(-1, 1)) as dj) d2
  where k.event_id < 5
),
cand as (
  select p.query_id, b.event_id as neighbor_id,
         (p.qx - b.x) * (p.qx - b.x) + (p.qy - b.y) * (p.qy - b.y)
           + (p.qz - b.z) * (p.qz - b.z) as chord_sq
  from probes p
  join keyed b on b.face = p.face and b.i = p.i and b.j = p.j
  where b.event_id <> p.query_id
)
select query_id, neighbor_id, round(chord_sq, 9) as chord_sq,
       cast(rank as int) as rank
from (
  select *, row_number() over (partition by query_id
                               order by chord_sq, neighbor_id) as rank
  from cand
) where rank <= {GEO_KNN_K}
"""

SQL_GEO_KNN_RECALL = f"""
with {_GEO_PTS_KEYED_SQL},
exact as (
  select query_id, neighbor_id from (
    select p.event_id as query_id, b.event_id as neighbor_id,
           row_number() over (
             partition by p.event_id
             order by (p.x - b.x) * (p.x - b.x) + (p.y - b.y) * (p.y - b.y)
                      + (p.z - b.z) * (p.z - b.z), b.event_id) as rank
    from (select * from xyz where event_id < 5) p
    cross join xyz b
    where b.event_id <> p.event_id
  ) where rank <= {GEO_KNN_K}
),
approx as ({SQL_GEO_KNN_CELLS})
select e.query_id,
       cast(count(*) as int) as k,
       cast(sum(case when a.neighbor_id is not null then 1 else 0 end) as int)
           as hits,
       round(sum(case when a.neighbor_id is not null then 1 else 0 end)
             * 1.0 / count(*), 6) as recall
from exact e
left join approx a
  on e.query_id = a.query_id and e.neighbor_id = a.neighbor_id
group by e.query_id
"""


# --- J1+J9 at web scale: points × polygons spatial join ---------------------
#
# The general distributed form of the reference's raster clip
# (Demeton/Geometry/Funcs.fs:9-33 orientation tests): MANY points
# joined against MANY polygons with no cross join anywhere.  The
# polygon dimension compiles to a grid-cell COVER (one row per
# 1-degree cell its bbox overlaps — the same integer grid the SRTM
# tile index uses, tiles.py); points carry their cell key for free
# (floor of lon/lat), so candidates come out of a plain equi-join on
# the cell id.  The exact test is then crossing-number parity computed
# entirely in Catalyst: candidates join the tiny edge table
# (broadcast), each (point, edge) row contributes a 0/1 crossing
# indicator, and a hash aggregate keeps odd-parity pairs.  At 10^12
# points × 10^6 polygons the identical plan holds with the broadcasts
# replaced by shuffle joins on the cell key (and a finer cover level —
# geocell.cover_bbox — when polygons are small relative to 1°).
#
# Polygons are a deterministic synthetic dimension (ellipse-ish k-gons
# with modular-arithmetic centers/radii and integer-radian phases) so
# the DuckDB twin regenerates them exactly.

_GPIP_N_POLYS = 40
_GPIP_ECC = 0.7  # vertical semi-axis factor (ellipse-ish, still simple)
import math as _math

_GPIP_TWO_PI = 2 * _math.pi


def _gpip_polys(spark: SparkSession) -> DataFrame:
    p = F.col("poly_id")
    return spark.range(_GPIP_N_POLYS).select(F.col("id").alias("poly_id")).select(
        "poly_id",
        (F.lit(3) + p % 6).alias("k"),
        (F.lit(-170.0) + (p * 97) % 340 + F.lit(0.5)).alias("cx"),
        (F.lit(-75.0) + (p * 61) % 150 + F.lit(0.5)).alias("cy"),
        (F.lit(1.5) + (p % 5).cast("double")).alias("r"),
    )


def _gpip_edges(spark: SparkSession) -> DataFrame:
    base = _gpip_polys(spark).select(
        "poly_id", "k", "cx", "cy", "r",
        F.explode(F.sequence(F.lit(0), F.col("k") - 1)).alias("i"),
    )
    kd = F.col("k").cast("double")
    phase = F.col("poly_id").cast("double")
    a1 = F.lit(_GPIP_TWO_PI) * F.col("i") / kd + phase
    a2 = F.lit(_GPIP_TWO_PI) * ((F.col("i") + 1) % F.col("k")) / kd + phase
    ry = F.lit(_GPIP_ECC) * F.col("r")
    return base.select(
        "poly_id",
        (F.col("cx") + F.col("r") * F.cos(a1)).alias("x1"),
        (F.col("cy") + ry * F.sin(a1)).alias("y1"),
        (F.col("cx") + F.col("r") * F.cos(a2)).alias("x2"),
        (F.col("cy") + ry * F.sin(a2)).alias("y2"),
    )


def q_geo_points_in_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial join: per polygon, count/aggregate the event points it
    contains.  Cell-cover equi-join → broadcast edge join →
    crossing-number parity, all Catalyst (no UDF, no cross join)."""
    polys = _gpip_polys(spark)
    ry = F.lit(_GPIP_ECC) * F.col("r")
    cover = polys.select(
        "poly_id",
        F.explode(
            F.sequence(
                F.floor(F.col("cx") - F.col("r")).cast("int"),
                F.floor(F.col("cx") + F.col("r")).cast("int"),
            )
        ).alias("tx"),
        (F.col("cy") - ry).alias("_y0"),
        (F.col("cy") + ry).alias("_y1"),
    ).select(
        "poly_id",
        "tx",
        F.explode(
            F.sequence(
                F.floor(F.col("_y0")).cast("int"),
                F.floor(F.col("_y1")).cast("int"),
            )
        ).alias("ty"),
    )
    pts = _pts(spark, sf_dir).select(
        "event_id",
        "value",
        "lon",
        "lat",
        F.floor(F.col("lon")).cast("int").alias("tx"),
        F.floor(F.col("lat")).cast("int").alias("ty"),
    )
    cand = pts.join(F.broadcast(cover), ["tx", "ty"])
    lat, lon = F.col("lat"), F.col("lon")
    # Half-open crossing rule, identical to geometry.points_in_polygon
    # and to the SQL twin.  The when() guard keeps a horizontal edge
    # (y1 == y2) from planting a divide-by-zero under ANSI mode (the
    # default in this Spark build, where double x/0 throws): the
    # straddle conjunct is false there, but correctness must not depend
    # on And's evaluation order; when the guard misses, lon < NULL is
    # NULL and false & NULL = false — same shape as _pip_parity_counts.
    crosses = (
        (F.col("y1") > lat) != (F.col("y2") > lat)
    ) & (
        lon
        < F.when(
            F.col("y2") != F.col("y1"),
            (F.col("x2") - F.col("x1")) * (lat - F.col("y1"))
            / (F.col("y2") - F.col("y1"))
            + F.col("x1"),
        )
    )
    parity = (
        cand.join(F.broadcast(_gpip_edges(spark)), "poly_id")
        .groupBy("event_id", "poly_id")
        .agg(
            F.first("value").alias("value"),
            F.sum(crosses.cast("int")).alias("nc"),
        )
        .where(F.col("nc") % 2 == 1)
    )
    per_poly = parity.groupBy("poly_id").agg(
        F.count("*").alias("_n"), F.sum("value").alias("_sv")
    )
    return polys.join(per_poly, "poly_id", "left").select(
        F.col("poly_id").cast("int").alias("poly_id"),
        F.col("k").cast("int").alias("n_vertices"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_inside"),
        F.round(F.coalesce(F.col("_sv"), F.lit(0.0)), 6).alias("sum_value"),
    )


_GPIP_POLYS_SQL = f"""
polys as (
  select p as poly_id, 3 + p % 6 as k,
         -170.0 + (p * 97) % 340 + 0.5 as cx,
         -75.0 + (p * 61) % 150 + 0.5 as cy,
         1.5 + cast(p % 5 as double) as r
  from (select unnest(generate_series(0, {_GPIP_N_POLYS - 1})) as p)
)"""

SQL_GEO_POINTS_IN_POLYGONS = f"""
with pts as ({_PTS_SQL}),
{_GPIP_POLYS_SQL},
edges as (
  select poly_id,
         cx + r * cos(2 * pi() * i / k + poly_id) as x1,
         cy + {_GPIP_ECC} * r * sin(2 * pi() * i / k + poly_id) as y1,
         cx + r * cos(2 * pi() * ((i + 1) % k) / k + poly_id) as x2,
         cy + {_GPIP_ECC} * r * sin(2 * pi() * ((i + 1) % k) / k + poly_id) as y2
  from (select poly_id, k, cx, cy, r, unnest(generate_series(0, k - 1)) as i
        from polys)
),
cand as (
  select pt.event_id, pt.value, pt.lon, pt.lat, po.poly_id
  from pts pt
  join polys po
    on pt.lon >= po.cx - po.r and pt.lon <= po.cx + po.r
   and pt.lat >= po.cy - {_GPIP_ECC} * po.r
   and pt.lat <= po.cy + {_GPIP_ECC} * po.r
),
parity as (
  select c.event_id, c.poly_id, any_value(c.value) as value,
         sum(case when ((e.y1 > c.lat) <> (e.y2 > c.lat))
                   and c.lon < (e.x2 - e.x1) * (c.lat - e.y1)
                               / (e.y2 - e.y1) + e.x1
                  then 1 else 0 end) as nc
  from cand c join edges e using (poly_id)
  group by 1, 2
)
select cast(po.poly_id as int) as poly_id,
       cast(po.k as int) as n_vertices,
       cast(coalesce(agg._n, 0) as bigint) as n_inside,
       round(coalesce(agg._sv, 0), 6) as sum_value
from polys po
left join (
  select poly_id, count(*) as _n, sum(value) as _sv
  from parity where nc % 2 = 1 group by 1
) agg on po.poly_id = agg.poly_id
"""


# --- zonal statistics: raster↔vector aggregate join -------------------------

def _zonal_polys():
    # the ORACLES literal calls _sql_zonal_stats() at import, so there
    # is nothing to defer — resolve directly
    from demeton_spark.zonal import zonal_demo_polygons

    return zonal_demo_polygons()


def _cq_tiles(spark: SparkSession) -> DataFrame:
    """Contract-world int16 tile table, generated distributed (one
    mapInPandas row per tile — no driver-side numpy world)."""
    import pandas as pd

    from demeton_spark.synth import WorldSpec, expected_tile_heights

    spec = WorldSpec(
        lon0=_CQ_LON0, lat0=_CQ_LAT0, n_tiles_x=_CQ_NTX, n_tiles_y=_CQ_NTY,
        tile_size=_CQ_TS, block_size=_CQ_BS,
    )
    coords = spark.createDataFrame(
        [
            (spec.lon0 + i, spec.lat0 + j)
            for i in range(spec.n_tiles_x)
            for j in range(spec.n_tiles_y)
        ],
        "tile_x int, tile_y int",
    ).repartition(spec.n_tiles_x * spec.n_tiles_y)

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "tile_x": pdf["tile_x"],
                    "tile_y": pdf["tile_y"],
                    "heights": [
                        expected_tile_heights(spec, int(tx), int(ty)).tobytes()
                        for tx, ty in zip(pdf["tile_x"], pdf["tile_y"])
                    ],
                }
            )

    return coords.mapInPandas(gen, "tile_x int, tile_y int, heights binary")


def q_geo_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics (raster↔vector join): per-polygon elevation
    aggregates over the contract DEM — polygon→tile-cover broadcast
    join, one Arrow pass of PIP-masked partials per (polygon, tile),
    hash-agg per polygon.  See demeton_spark/zonal.py."""
    from demeton_spark.zonal import zonal_stats

    return zonal_stats(_cq_tiles(spark), _CQ_TS, _zonal_polys())


def _sql_zonal_stats() -> str:
    parts = []
    lon = f"(cast(tx as double) + cast(lx as double) / {_CQ_TS})"
    lat = f"(cast(ty as double) + cast(ly as double) / {_CQ_TS})"
    for pid, verts in _zonal_polys():
        pip = _sql_pip_expr(lon, lat, verts)
        parts.append(f"""
select {pid} as poly_id, {len(verts)} as n_vertices,
       cast(count(*) as bigint) as n_px,
       cast(coalesce(sum(case when h <> -32768 then 1 end), 0) as bigint)
         as n_valid,
       cast(coalesce(sum(case when h <> -32768 then h end), 0) as bigint)
         as sum_h,
       cast(min(case when h <> -32768 then h end) as int) as min_h,
       cast(max(case when h <> -32768 then h end) as int) as max_h
from world where {pip}""")
    body = "\nunion all\n".join(parts)
    return f"with {_sql_synth_world()}\n{body}"


# --- point elevation: bilinear raster sampling at point locations -----------
#
# Raster enrichment of a point table (J4 nearest-raster lookup + J5
# bilinear lerp, surfaced as a distributed query): each point explodes
# to its 4 corner cells, corners equi-join the tile table on the tile
# key (cross-TILE corners land on their own tiles — no halo fetch
# needed), the int16 corner height is sliced out of the tile binary
# with pure Catalyst byte ops, and the 4-corner lerp runs as codegen'd
# double arithmetic.  Any missing/out-of-world corner nulls the result
# (kernels.bilinear_interpolate's NaN rule; Dem/Types.fs:143-155).
# Scale: points co-partition by tile key against a tile-bucketed table
# (SCALE.md) — one shuffle of 4 int-keyed rows per point, no pixels.


def pelev_lonlat_cols():
    """The shared in-world point derivation (events carry no geo
    columns): also consumed by streaming.polygon_event_counts, so the
    batch and streaming spatial queries sample identical points."""
    lon = (F.col("event_id") * 48271 % 1999).cast("double") / 1999.0 * 2.0 + 13.0
    lat = (F.col("user_id") * 16807 % 1997).cast("double") / 1997.0 * 2.0 + 45.0
    return lon, lat


def _pelev_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    lon, lat = pelev_lonlat_cols()
    return ev.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        lon.alias("lon"),
        lat.alias("lat"),
    )


def q_geo_point_elevation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ts = _CQ_TS
    pts = _pelev_points(spark, sf_dir).select(
        "event_id", "lon", "lat",
        (F.col("lon") * float(ts)).alias("gxf"),
        (F.col("lat") * float(ts)).alias("gyf"),
    )
    base = pts.select(
        "event_id", "lon", "lat",
        F.floor("gxf").cast("bigint").alias("gx1"),
        F.floor("gyf").cast("bigint").alias("gy1"),
        (F.col("gxf") - F.floor("gxf")).alias("dx"),
        (F.col("gyf") - F.floor("gyf")).alias("dy"),
    )
    corner = [
        F.struct(
            F.lit(c).alias("c"),
            (F.col("gx1") + c % 2).alias("gx"),
            (F.col("gy1") + c // 2).alias("gy"),
        )
        for c in range(4)
    ]
    corners = (
        base.select(
            "event_id", "lon", "lat", "dx", "dy",
            F.explode(F.array(*corner)).alias("k"),
        )
        .select(
            "event_id", "lon", "lat", "dx", "dy",
            F.col("k.c").alias("c"),
            F.col("k.gx").alias("gx"),
            F.col("k.gy").alias("gy"),
        )
        .withColumn("tile_x", F.expr(f"cast(gx div {ts} as int)"))
        .withColumn("tile_y", F.expr(f"cast(gy div {ts} as int)"))
    )
    j = corners.join(_cq_tiles(spark), ["tile_x", "tile_y"]).withColumn(
        "off", ((F.col("gy") % ts) * ts + F.col("gx") % ts) * 2 + 1
    )
    lo = F.conv(
        F.hex(F.expr("substring(heights, cast(off as int), 1)")), 16, 10
    ).cast("int")
    hi = F.conv(
        F.hex(F.expr("substring(heights, cast(off as int) + 1, 1)")), 16, 10
    ).cast("int")
    raw = lo + hi * 256
    signed = F.when(raw >= 32768, raw - 65536).otherwise(raw)
    hv = F.when(signed == -32768, F.lit(None)).otherwise(signed.cast("double"))
    per = j.groupBy("event_id").agg(
        F.first("lon").alias("lon"),
        F.first("lat").alias("lat"),
        F.first("dx").alias("dx"),
        F.first("dy").alias("dy"),
        *[
            F.max(F.when(F.col("c") == c, hv)).alias(f"h{c + 1}")
            for c in range(4)
        ],
    )
    hh1 = (F.col("h2") - F.col("h1")) * F.col("dx") + F.col("h1")
    hh2 = (F.col("h4") - F.col("h3")) * F.col("dx") + F.col("h3")
    return per.select(
        "event_id", "lon", "lat",
        F.round((hh2 - hh1) * F.col("dy") + hh1, 6).alias("elev"),
    )


SQL_GEO_POINT_ELEVATION = f"""
with {_sql_synth_world()},
pts as (
  select cast(event_id as bigint) as event_id,
         cast(event_id * 48271 % 1999 as double) / 1999.0 * 2.0 + 13.0 as lon,
         cast(user_id * 16807 % 1997 as double) / 1997.0 * 2.0 + 45.0 as lat
  from events
),
base as (
  select event_id, lon, lat,
         cast(floor(lon * {_CQ_TS}.0) as bigint) as gx1,
         cast(floor(lat * {_CQ_TS}.0) as bigint) as gy1,
         lon * {_CQ_TS}.0 - floor(lon * {_CQ_TS}.0) as dx,
         lat * {_CQ_TS}.0 - floor(lat * {_CQ_TS}.0) as dy
  from pts
),
corners as (
  select b.event_id, b.lon, b.lat, b.dx, b.dy, cs.c,
         b.gx1 + cs.c % 2 as gx, b.gy1 + cs.c // 2 as gy
  from base b cross join (select unnest([0, 1, 2, 3]) as c) cs
),
looked as (
  select k.event_id, k.lon, k.lat, k.dx, k.dy, k.c,
         case when w.h <> -32768 then cast(w.h as double) end as hv
  from corners k
  left join world w on w.tx * {_CQ_TS} + w.lx = k.gx
                   and w.ty * {_CQ_TS} + w.ly = k.gy
),
per as (
  select event_id, any_value(lon) as lon, any_value(lat) as lat,
         any_value(dx) as dx, any_value(dy) as dy,
         max(case when c = 0 then hv end) as h1,
         max(case when c = 1 then hv end) as h2,
         max(case when c = 2 then hv end) as h3,
         max(case when c = 3 then hv end) as h4
  from looked group by 1
)
select event_id, lon, lat,
       round(((h4 - h3) * dx + h3 - ((h2 - h1) * dx + h1)) * dy
             + ((h2 - h1) * dx + h1), 6) as elev
from per
"""


# --- polygon ↔ polygon spatial join ------------------------------------------
#
# The spatial-join class the point and raster queries don't cover: which
# polygons of set A overlap which of set B.  Candidates come from a
# shared-1°-cell equi-join of the two bbox covers (never all-pairs);
# verification is complete for convex polygons: A∩B ≠ ∅ iff a vertex of
# one lies in the other OR some edge pair properly crosses.  All three
# signals are the machinery already proven here — crossing-number
# parity (geo_points_in_polygons) and the O'Rourke orientation test
# (geometry.segments_intersection_kind) as Catalyst arithmetic.
# Vertices are Python-float literals on BOTH engines.


def _ppoly_family(n: int, kmult: int, cx0: float, cy0: float, phase0: float):
    import math

    out = []
    for p in range(n):
        k = 3 + (p * kmult) % 6
        cx = cx0 + (p * 37 % 100) / 20.0
        cy = cy0 + (p * 53 % 100) / 25.0
        r = 0.4 + (p % 5) * 0.3
        verts = [
            (
                cx + r * math.cos(2.0 * math.pi * i / k + phase0 + 0.7 * p),
                cy + 0.8 * r * math.sin(2.0 * math.pi * i / k + phase0 + 0.7 * p),
            )
            for i in range(k)
        ]
        out.append((p, verts))
    return out


_PPA = None
_PPB = None


def _ppoly_sets():
    global _PPA, _PPB
    if _PPA is None:
        import math

        _PPA = _ppoly_family(8, 1, 10.25, 40.25, 0.3)
        _PPB = _ppoly_family(10, 2, 10.75, 40.55, 1.1)
        # star-of-David pair: two triangles rotated 60° about one
        # center — every vertex lies OUTSIDE the other polygon, so the
        # overlap is detectable ONLY by the proper-edge-crossing arm
        # (the case a pure vertex-containment join would miss)
        def tri(phase):
            return [
                (
                    19.5 + 1.0 * math.cos(2.0 * math.pi * i / 3 + phase),
                    49.5 + 1.0 * math.sin(2.0 * math.pi * i / 3 + phase),
                )
                for i in range(3)
            ]

        _PPA = _PPA + [(len(_PPA), tri(0.05))]
        _PPB = _PPB + [(len(_PPB), tri(0.05 + math.pi / 3))]
    return _PPA, _PPB


def _ppoly_edges_df(spark: SparkSession, polys, id_col: str) -> DataFrame:
    rows = []
    for pid, verts in polys:
        j = len(verts) - 1
        for i in range(len(verts)):
            rows.append(
                (pid, verts[j][0], verts[j][1], verts[i][0], verts[i][1])
            )
            j = i
    return spark.createDataFrame(
        rows, f"{id_col} int, x1 double, y1 double, x2 double, y2 double"
    )


def _ppoly_verts_df(spark: SparkSession, polys, id_col: str) -> DataFrame:
    rows = [
        (pid, i, x, y)
        for pid, verts in polys
        for i, (x, y) in enumerate(verts)
    ]
    return spark.createDataFrame(
        rows, f"{id_col} int, vi int, vx double, vy double"
    )


def _ppoly_cover_df(spark: SparkSession, polys, id_col: str) -> DataFrame:
    from demeton_spark.zonal import _poly_tile_cover

    return spark.createDataFrame(
        _poly_tile_cover(polys), f"{id_col} int, cx int, cy int"
    )


def _pip_parity_counts(
    verts: DataFrame, edges: DataFrame, pairs: DataFrame,
    vid: str, eid: str, out_name: str,
) -> DataFrame:
    """Per candidate pair: how many vertices of ``vid``'s polygon fall
    inside ``eid``'s polygon (crossing-number parity over the edge
    table, all Catalyst)."""
    cand = verts.join(pairs, vid)
    # the when() guard keeps a horizontal edge (y1 == y2) from planting a
    # divide-by-zero under ANSI mode: the straddle conjunct is false there,
    # but correctness must not depend on And's evaluation order; when the
    # guard misses, vx < NULL is NULL and false & NULL = false
    crosses = (
        (F.col("y1") > F.col("vy")) != (F.col("y2") > F.col("vy"))
    ) & (
        F.col("vx")
        < F.when(
            F.col("y2") != F.col("y1"),
            (F.col("x2") - F.col("x1")) * (F.col("vy") - F.col("y1"))
            / (F.col("y2") - F.col("y1"))
            + F.col("x1"),
        )
    )
    parity = (
        cand.join(edges, eid)
        .groupBy(vid, eid, "vi")
        .agg(F.sum(crosses.cast("int")).alias("nc"))
        .where(F.col("nc") % 2 == 1)
    )
    return parity.groupBy(vid, eid).agg(F.count("*").alias(out_name))


def q_geo_polygon_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa, pb = _ppoly_sets()
    pairs = (
        _ppoly_cover_df(spark, pa, "a_id")
        .join(_ppoly_cover_df(spark, pb, "b_id"), ["cx", "cy"])
        .select("a_id", "b_id")
        .distinct()
    )
    va = _ppoly_verts_df(spark, pa, "a_id")
    vb = _ppoly_verts_df(spark, pb, "b_id")
    ea = _ppoly_edges_df(spark, pa, "a_id")
    eb = _ppoly_edges_df(spark, pb, "b_id")

    a_in_b = _pip_parity_counts(va, eb, pairs, "a_id", "b_id", "n_av_in_b")
    b_in_a = _pip_parity_counts(vb, ea, pairs, "b_id", "a_id", "n_bv_in_a")

    # proper edge crossings: strict orientation sign flips on both
    # segments (Computational Geometry in C, p. 30 — the same test
    # geometry.segments_intersection_kind applies)
    eaj = ea.join(pairs, "a_id")
    both = eaj.join(
        eb.select(
            "b_id",
            F.col("x1").alias("u1"), F.col("y1").alias("v1"),
            F.col("x2").alias("u2"), F.col("y2").alias("v2"),
        ),
        "b_id",
    )

    def cross(ox, oy, ax, ay, bx, by):
        return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

    d1 = cross(F.col("u1"), F.col("v1"), F.col("u2"), F.col("v2"),
               F.col("x1"), F.col("y1"))
    d2 = cross(F.col("u1"), F.col("v1"), F.col("u2"), F.col("v2"),
               F.col("x2"), F.col("y2"))
    d3 = cross(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
               F.col("u1"), F.col("v1"))
    d4 = cross(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
               F.col("u2"), F.col("v2"))
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    ex = both.groupBy("a_id", "b_id").agg(
        F.sum(proper.cast("int")).alias("n_edge_x")
    )

    out = (
        pairs.join(a_in_b, ["a_id", "b_id"], "left")
        .join(b_in_a, ["a_id", "b_id"], "left")
        .join(ex, ["a_id", "b_id"], "left")
        .select(
            "a_id",
            "b_id",
            F.coalesce("n_av_in_b", F.lit(0)).cast("bigint").alias("n_av_in_b"),
            F.coalesce("n_bv_in_a", F.lit(0)).cast("bigint").alias("n_bv_in_a"),
            F.coalesce("n_edge_x", F.lit(0)).cast("bigint").alias("n_edge_x"),
        )
    )
    return out.where(
        (F.col("n_av_in_b") > 0)
        | (F.col("n_bv_in_a") > 0)
        | (F.col("n_edge_x") > 0)
    )


def _ppoly_values_sql() -> tuple[str, str, str, str, str, str]:
    pa, pb = _ppoly_sets()

    def d(v: float) -> str:
        return f"cast({v!r} as double)"

    def edges(polys, idc):
        rows = []
        for pid, verts in polys:
            j = len(verts) - 1
            for i in range(len(verts)):
                rows.append(
                    f"({pid}, {d(verts[j][0])}, {d(verts[j][1])}, "
                    f"{d(verts[i][0])}, {d(verts[i][1])})"
                )
                j = i
        return (
            f"select * from (values {', '.join(rows)}) "
            f"t({idc}, x1, y1, x2, y2)"
        )

    def verts(polys, idc):
        rows = [
            f"({pid}, {i}, {d(x)}, {d(y)})"
            for pid, vs in polys
            for i, (x, y) in enumerate(vs)
        ]
        return f"select * from (values {', '.join(rows)}) t({idc}, vi, vx, vy)"

    def cover(polys, idc):
        from demeton_spark.zonal import _poly_tile_cover

        rows = [f"({pid}, {cx}, {cy})" for pid, cx, cy in _poly_tile_cover(polys)]
        return f"select * from (values {', '.join(rows)}) t({idc}, cx, cy)"

    return (
        edges(pa, "a_id"), edges(pb, "b_id"),
        verts(pa, "a_id"), verts(pb, "b_id"),
        cover(pa, "a_id"), cover(pb, "b_id"),
    )


def _sql_polygon_overlaps() -> str:
    ea, eb, va, vb, ca, cb = _ppoly_values_sql()
    return f"""
with ea as ({ea}), eb as ({eb}), va as ({va}), vb as ({vb}),
ca as ({ca}), cb as ({cb}),
pairs as (
  select distinct ca.a_id, cb.b_id from ca join cb using (cx, cy)
),
a_in_b as (
  select a_id, b_id, count(*) as n_av_in_b from (
    select p.a_id, p.b_id, v.vi,
           sum(case when ((e.y1 > v.vy) <> (e.y2 > v.vy))
                     and v.vx < (e.x2 - e.x1) * (v.vy - e.y1)
                                / (e.y2 - e.y1) + e.x1
                    then 1 else 0 end) as nc
    from pairs p join va v using (a_id) join eb e using (b_id)
    group by 1, 2, 3
  ) where nc % 2 = 1 group by 1, 2
),
b_in_a as (
  select a_id, b_id, count(*) as n_bv_in_a from (
    select p.a_id, p.b_id, v.vi,
           sum(case when ((e.y1 > v.vy) <> (e.y2 > v.vy))
                     and v.vx < (e.x2 - e.x1) * (v.vy - e.y1)
                                / (e.y2 - e.y1) + e.x1
                    then 1 else 0 end) as nc
    from pairs p join vb v using (b_id) join ea e using (a_id)
    group by 1, 2, 3
  ) where nc % 2 = 1 group by 1, 2
),
ex as (
  select p.a_id, p.b_id,
    sum(case when
      ((b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1))
      * ((b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1)) < 0
      and
      ((a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1))
      * ((a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1)) < 0
      then 1 else 0 end) as n_edge_x
  from pairs p join ea a using (a_id) join eb b using (b_id)
  group by 1, 2
)
select p.a_id, p.b_id,
       cast(coalesce(ab.n_av_in_b, 0) as bigint) as n_av_in_b,
       cast(coalesce(ba.n_bv_in_a, 0) as bigint) as n_bv_in_a,
       cast(coalesce(ex.n_edge_x, 0) as bigint) as n_edge_x
from pairs p
left join a_in_b ab using (a_id, b_id)
left join b_in_a ba using (a_id, b_id)
left join ex using (a_id, b_id)
where coalesce(ab.n_av_in_b, 0) > 0 or coalesce(ba.n_bv_in_a, 0) > 0
   or coalesce(ex.n_edge_x, 0) > 0
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "tile_assign_events": q_tile_assign_events,
    "geocell_assign": q_geocell_assign,
    "geocell_rollup": q_geocell_rollup,
    "geo_knn_cells": q_geo_knn_cells,
    "geo_knn_recall": q_geo_knn_recall,
    "geo_points_in_polygons": q_geo_points_in_polygons,
    "geo_zonal_stats": q_geo_zonal_stats,
    "geo_point_elevation": q_geo_point_elevation,
    "geo_polygon_overlaps": q_geo_polygon_overlaps,
    "bbox_cover": q_bbox_cover,
    "polygon_clip": q_polygon_clip,
    "pyramid_parents": q_pyramid_parents,
    "tile_mbr": q_tile_mbr,
    "value_histogram": q_value_histogram,
    "tile_metadata_join": q_tile_metadata_join,
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "region_rollup": q_region_rollup,
    "events_top_event": q_events_top_event,
    "events_sessionize": q_events_sessionize,
    "events_windowed_counts": q_events_windowed_counts,
    "events_session_windows": q_events_session_windows,
    "user_value_stats": q_user_value_stats,
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_token_stats": q_doc_token_stats,
    "doc_lang_quality": q_doc_lang_quality,
    "doc_repetition": q_doc_repetition,
    "doc_minhash": q_doc_minhash,
    "doc_near_dup_pairs": q_doc_near_dup_pairs,
    "doc_near_dup_recall": q_doc_near_dup_recall,
    "doc_dedup_clusters": q_doc_dedup_clusters,
    "doc_dedup_keep_best": q_doc_dedup_keep_best,
    "doc_simhash": q_doc_simhash,
    "doc_simhash_near_dup": q_doc_simhash_near_dup,
    "doc_simhash_recall": q_doc_simhash_recall,
    "doc_ngram_near_dup": q_doc_ngram_near_dup,
    "doc_decontaminate": q_doc_decontaminate,
    "doc_filter_pipeline": q_doc_filter_pipeline,
    "doc_stratified_sample": q_doc_stratified_sample,
    "events_value_quantiles": q_events_value_quantiles,
    "image_phash_dedup": q_image_phash_dedup,
    "image_phash_near_dup": q_image_phash_near_dup,
    "pair_dedup_clusters": q_pair_dedup_clusters,
    "image_dhash": q_image_dhash,
    "audio_features": q_audio_features,
    "doc_fingerprint": q_doc_fingerprint,
    "knn_bruteforce": q_knn_bruteforce,
    "knn_ivf_bucketed": q_knn_ivf_bucketed,
    "knn_ivf_recall": q_knn_ivf_recall,
    "kmeans_centroids": q_kmeans_centroids,
    "knn_ivf_kmeans": q_knn_ivf_kmeans,
    "knn_ivf_kmeans_recall": q_knn_ivf_kmeans_recall,
    "emb_near_dup_pairs": q_emb_near_dup_pairs,
    "emb_dedup_clusters": q_emb_dedup_clusters,
    "emb_near_dup_recall": q_emb_near_dup_recall,
    "embedding_label_stats": q_embedding_label_stats,
}

ORACLES = {
    "tile_assign_events": SQL_TILE_ASSIGN_EVENTS,
    "geocell_assign": SQL_GEOCELL_ASSIGN,
    "geocell_rollup": SQL_GEOCELL_ROLLUP,
    "geo_knn_cells": SQL_GEO_KNN_CELLS,
    "geo_knn_recall": SQL_GEO_KNN_RECALL,
    "geo_points_in_polygons": SQL_GEO_POINTS_IN_POLYGONS,
    "geo_zonal_stats": _sql_zonal_stats(),
    "geo_point_elevation": SQL_GEO_POINT_ELEVATION,
    "geo_polygon_overlaps": _sql_polygon_overlaps(),
    "bbox_cover": SQL_BBOX_COVER,
    "polygon_clip": SQL_POLYGON_CLIP,
    "pyramid_parents": SQL_PYRAMID_PARENTS,
    "tile_mbr": SQL_TILE_MBR,
    "value_histogram": SQL_VALUE_HISTOGRAM,
    "tile_metadata_join": SQL_TILE_METADATA_JOIN,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "top_revenue_orders": SQL_TOP_REVENUE_ORDERS,
    "region_rollup": SQL_REGION_ROLLUP,
    "events_top_event": SQL_EVENTS_TOP_EVENT,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "events_windowed_counts": SQL_EVENTS_WINDOWED_COUNTS,
    "events_session_windows": SQL_EVENTS_SESSION_WINDOWS,
    "user_value_stats": SQL_USER_VALUE_STATS,
    "doc_exact_dedup": SQL_DOC_EXACT_DEDUP,
    "doc_token_stats": SQL_DOC_TOKEN_STATS,
    "doc_lang_quality": SQL_DOC_LANG_QUALITY,
    "doc_repetition": SQL_DOC_REPETITION,
    "doc_minhash": SQL_DOC_MINHASH,
    "doc_near_dup_pairs": SQL_DOC_NEAR_DUP_PAIRS,
    "doc_near_dup_recall": SQL_DOC_NEAR_DUP_RECALL,
    "doc_dedup_clusters": SQL_DOC_DEDUP_CLUSTERS,
    "doc_dedup_keep_best": SQL_DOC_DEDUP_KEEP_BEST,
    "doc_simhash": SQL_DOC_SIMHASH,
    "doc_simhash_near_dup": SQL_DOC_SIMHASH_NEAR_DUP,
    "doc_simhash_recall": SQL_DOC_SIMHASH_RECALL,
    "doc_ngram_near_dup": SQL_DOC_NGRAM_NEAR_DUP,
    "doc_decontaminate": SQL_DOC_DECONTAMINATE,
    "doc_filter_pipeline": SQL_DOC_FILTER_PIPELINE,
    "doc_stratified_sample": SQL_DOC_STRATIFIED_SAMPLE,
    "events_value_quantiles": SQL_EVENTS_VALUE_QUANTILES,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "image_phash_near_dup": SQL_IMAGE_PHASH_NEAR_DUP,
    "image_phash_dedup": SQL_IMAGE_PHASH_DEDUP,
    "pair_dedup_clusters": SQL_PAIR_DEDUP_CLUSTERS,
    "image_dhash": SQL_IMAGE_DHASH,
    "audio_features": SQL_AUDIO_FEATURES,
    "knn_bruteforce": SQL_KNN_BRUTEFORCE,
    "knn_ivf_bucketed": SQL_KNN_IVF_BUCKETED,
    "knn_ivf_recall": SQL_KNN_IVF_RECALL,
    "kmeans_centroids": SQL_KMEANS_CENTROIDS,
    "knn_ivf_kmeans": SQL_KNN_IVF_KMEANS,
    "knn_ivf_kmeans_recall": SQL_KNN_IVF_KMEANS_RECALL,
    "emb_near_dup_pairs": SQL_EMB_NEAR_DUP_PAIRS,
    "emb_dedup_clusters": SQL_EMB_DEDUP_CLUSTERS,
    "emb_near_dup_recall": SQL_EMB_NEAR_DUP_RECALL,
    "embedding_label_stats": SQL_EMBEDDING_LABEL_STATS,
    # raster contract queries (defined in __spark_entry__) whose synthetic
    # world DuckDB regenerates from generate_series
    "hillshade_tiles": SQL_HILLSHADE_TILES,
    "hillshade_clip": SQL_HILLSHADE_CLIP,
    "tile_shade_xth": SQL_TILE_SHADE_XTH,
    "pyramid_downsample": SQL_PYRAMID_DOWNSAMPLE,
    "water_components": SQL_WATER_COMPONENTS,
    "tile_posterize": SQL_TILE_POSTERIZE,
    "tile_isoline_cases": SQL_TILE_ISOLINE_CASES,
    "tile_isolines": SQL_TILE_ISOLINES,
    "shade_raster": SQL_SHADE_RASTER,
    "shade_raster_lcc": SQL_SHADE_RASTER_LCC,
}
