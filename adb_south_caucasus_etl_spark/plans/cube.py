"""CubeQuery IR + compiler — the engine-native redesign of the reference's
query surface.

The reference's entire "logical plan" is a flat dict of query-string params
(reference oec.py:45-55: cube, comma-joined drilldowns/measures, one key per
cut) shipped to a remote OLAP server. Here the same vocabulary compiles to a
Spark DataFrame plan and Catalyst owns optimization (SURVEY §4: zero custom
rules; cuts become filters *before* the joins/agg so pushdown applies).

Semantics preserved from the reference:

- drilldown list + measure list + conjunctive member-equality cuts
  (reference oec.py:30-36,45-55; multi-cut conjunction util.py:1-9)
- cut values arrive as strings (reference oec.py:30-33) and may be
  comma-joined multi-member lists (OLAP-proxy convention) → ``isin``
- output column names normalized ``replace(' ','_').lower()``
  (reference oec.py:24,64)
- ``cuts`` optional (reference oec.py:45 ``cut == None`` check) and never
  mutated (reference oec.py:48 ``cut.copy()`` discipline)
- member enumeration sorted by key — the reference *intends* this but its
  ``sort_values`` result is discarded (reference oec.py:23); we implement
  the intended semantics (SURVEY §2.L.1)

Scale notes (100 TB): only joins required by the requested levels/cuts/
measures are performed (join pruning); dimension tables are broadcast when
flagged broadcast-safe (bounded cardinality), otherwise Catalyst/AQE picks
sort-merge; the final aggregation is a partial+final hash agg, so the only
full shuffle is keyed on the drilldown tuple.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.normalize import normalize_colname
from ..sources.registry import Catalog

# --------------------------------------------------------------------------
# schema objects


@dataclass(frozen=True)
class Level:
    """A dimension level: a (possibly derived) column of the joined star.

    ``key_expr`` is the member-ID expression used by cuts and member
    enumeration; ``label_expr`` is what a drilldown projects. For derived
    levels (e.g. Year) both are the same expression.
    """

    name: str
    label_expr: str
    key_expr: str | None = None  # defaults to label_expr
    requires: tuple[str, ...] = ()  # dim tables this level needs joined

    @property
    def key(self) -> str:
        return self.key_expr or self.label_expr

    @property
    def out_name(self) -> str:
        return normalize_colname(self.name)


@dataclass(frozen=True)
class Measure:
    """A named aggregate over a fact expression. ``agg`` mirrors the
    aggregator types an OLAP proxy exposes (SURVEY §2.A3)."""

    name: str
    expr: str
    agg: str = "sum"  # sum|count|avg|min|max|count_distinct|approx_count_distinct
    requires: tuple[str, ...] = ()

    @property
    def out_name(self) -> str:
        return normalize_colname(self.name)


@dataclass(frozen=True)
class Join:
    """One edge of the star: join ``table`` to the already-built star on
    ``left == right``. ``parent`` is the table that must be joined first
    (None ⇒ the column lives on the fact). ``broadcast`` marks dims whose
    cardinality is bounded in the real world (safe at any fact scale)."""

    table: str
    left: str
    right: str
    parent: str | None = None
    broadcast: bool = True


@dataclass(frozen=True)
class CubeSchema:
    name: str
    fact: str
    joins: tuple[Join, ...]
    levels: dict[str, Level] = field(default_factory=dict)
    measures: dict[str, Measure] = field(default_factory=dict)
    #: runtime-registered cubes (``infer_cube``) carry their own DataFrames;
    #: table names resolve here first, then through the parquet catalog —
    #: so a cube over an ad-hoc frame needs no catalog entry at all
    frames: dict[str, DataFrame] | None = None

    def level(self, name: str) -> Level:
        try:
            return self.levels[name]
        except KeyError:
            raise KeyError(
                f"cube {self.name!r} has no level {name!r}; "
                f"known: {sorted(self.levels)}"
            ) from None

    def measure(self, name: str) -> Measure:
        try:
            return self.measures[name]
        except KeyError:
            raise KeyError(
                f"cube {self.name!r} has no measure {name!r}; "
                f"known: {sorted(self.measures)}"
            ) from None


@dataclass(frozen=True)
class CubeQuery:
    """The typed replacement for the reference's payload dict
    (reference oec.py:45-55). ``cuts`` maps level name → member value or
    list of values (conjunctive across keys, disjunctive within a list —
    util.py:1-9 wire grammar)."""

    cube: str
    drilldowns: tuple[str, ...]
    measures: tuple[str, ...]
    cuts: dict[str, object] | None = None
    rollup: bool = False  # hierarchy subtotals (SURVEY §2.A4)


# --------------------------------------------------------------------------
# default cube registry (FIXTURES.md OLAP-layer mapping)


def _star_joins() -> tuple[Join, ...]:
    return (
        Join("orders", "l_orderkey", "o_orderkey", broadcast=False),
        Join("customer", "o_custkey", "c_custkey", parent="orders", broadcast=False),
        Join("nation", "c_nationkey", "n_nationkey", parent="customer"),
        Join("region", "n_regionkey", "r_regionkey", parent="nation"),
        Join("supplier", "l_suppkey", "s_suppkey", broadcast=False),
        Join("part", "l_partkey", "p_partkey", broadcast=False),
    )


DEFAULT_CUBES: dict[str, CubeSchema] = {
    # a second cube over the events table — the registry is plural like a
    # real OLAP server schema; degenerate (fact-column) levels only, no
    # joins, which exercises the compiler's join-pruning down to zero dims
    "events": CubeSchema(
        name="events",
        fact="events",
        joins=(),
        levels={
            "Event Type": Level("Event Type", "event_type"),
            "User": Level("User", "user_id"),
            "Day": Level("Day", "cast(date_trunc('day', ts) as date)"),
            "Hour": Level("Hour", "hour(ts)"),
        },
        measures={
            "Total Value": Measure("Total Value", "value"),
            "Avg Value": Measure("Avg Value", "value", agg="avg"),
            "Event Count": Measure("Event Count", "*", agg="count"),
            "Users": Measure("Users", "user_id", agg="count_distinct"),
        },
    ),
    "lineitem": CubeSchema(
        name="lineitem",
        fact="lineitem",
        joins=_star_joins(),
        levels={
            "Region": Level(
                "Region", "r_name", "r_regionkey", requires=("region",)
            ),
            "Nation": Level(
                "Nation", "n_name", "n_nationkey", requires=("nation",)
            ),
            "Customer": Level(
                "Customer", "c_name", "c_custkey", requires=("customer",)
            ),
            "Part": Level("Part", "p_name", "p_partkey", requires=("part",)),
            "Supplier": Level(
                "Supplier", "s_name", "s_suppkey", requires=("supplier",)
            ),
            "Year": Level(
                "Year", "year(o_orderdate)", requires=("orders",)
            ),
            "Month": Level(
                "Month", "month(o_orderdate)", requires=("orders",)
            ),
            "Segment": Level(
                "Segment", "c_mktsegment", requires=("customer",)
            ),
            "Order Status": Level(
                "Order Status", "o_orderstatus", requires=("orders",)
            ),
            "Return Flag": Level("Return Flag", "l_returnflag"),
            "Line Status": Level("Line Status", "l_linestatus"),
            "Brand": Level("Brand", "p_brand", requires=("part",)),
        },
        measures={
            "Quantity": Measure("Quantity", "l_quantity"),
            "Extended Price": Measure("Extended Price", "l_extendedprice"),
            "Revenue": Measure(
                "Revenue", "l_extendedprice * (1 - l_discount)"
            ),
            "Charge": Measure(
                "Charge", "l_extendedprice * (1 - l_discount) * (1 + l_tax)"
            ),
            "Avg Discount": Measure("Avg Discount", "l_discount", agg="avg"),
            "Line Count": Measure("Line Count", "*", agg="count"),
            "Order Count": Measure(
                "Order Count", "l_orderkey", agg="count_distinct"
            ),
        },
    ),
}

_AGG_FNS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "count_distinct": F.countDistinct,
    "approx_count_distinct": F.approx_count_distinct,
}


# --------------------------------------------------------------------------
# compiler


def _needed_tables(
    schema: CubeSchema, query: CubeQuery
) -> set[str]:
    """Join pruning: only dims referenced by drilldowns, cuts, or measures
    are joined, expanded transitively through join parents."""
    needed: set[str] = set()
    for d in query.drilldowns:
        needed.update(schema.level(d).requires)
    for m in query.measures:
        needed.update(schema.measure(m).requires)
    for c in query.cuts or {}:
        needed.update(schema.level(c).requires)
    by_table = {j.table: j for j in schema.joins}
    frontier = list(needed)
    while frontier:
        t = frontier.pop()
        parent = by_table[t].parent
        if parent and parent not in needed:
            needed.add(parent)
            frontier.append(parent)
    return needed


def _resolve_table(catalog: Catalog, schema: CubeSchema, name: str) -> DataFrame:
    """Cube-attached runtime frames (``infer_cube``) win over the parquet
    catalog, so ad-hoc cubes and catalog cubes compile through one path."""
    if schema.frames and name in schema.frames:
        return schema.frames[name]
    return catalog.table(name)


def _build_star(catalog: Catalog, schema: CubeSchema, needed: set[str]) -> DataFrame:
    star = _resolve_table(catalog, schema, schema.fact)
    for j in schema.joins:
        if j.table not in needed:
            continue
        dim = _resolve_table(catalog, schema, j.table)
        if j.broadcast:
            dim = F.broadcast(dim)
        star = star.join(dim, F.col(j.left) == F.col(j.right), "inner")
    return star


def _apply_cuts(
    star: DataFrame, schema: CubeSchema, cuts: dict[str, object] | None
) -> DataFrame:
    """Member-equality cuts, conjunctive across levels (reference
    oec.py:45-48). Values may be scalars, lists, or comma-joined strings
    (util.py:1-9 wire grammar). Inputs are never mutated (oec.py:48)."""
    if not cuts:
        return star
    for level_name, raw in cuts.items():
        key = F.expr(schema.level(level_name).key)
        if isinstance(raw, str) and "," in raw:
            values: list[object] = [v.strip() for v in raw.split(",")]
        elif isinstance(raw, (list, tuple, set)):
            values = list(raw)
        else:
            values = [raw]
        if len(values) == 1:
            star = star.filter(key == F.lit(values[0]))
        else:
            star = star.filter(key.isin(values))
    return star


def compile_query(
    spark: SparkSession,
    sf_dir: str,
    query: CubeQuery,
    cubes: dict[str, CubeSchema] | None = None,
) -> DataFrame:
    """Compile a CubeQuery to a DataFrame — the engine-native equivalent of
    ``OEC.get_data`` (reference oec.py:27-66): resolve cube → scan fact →
    cuts (filter, pushed down by Catalyst) → pruned star joins → group-by
    drilldowns → aggregate measures → normalized output names."""
    cubes = cubes or DEFAULT_CUBES
    if query.cube not in cubes:
        raise KeyError(f"unknown cube {query.cube!r}; known: {sorted(cubes)}")
    schema = cubes[query.cube]
    catalog = Catalog(spark, sf_dir)

    needed = _needed_tables(schema, query)
    star = _build_star(catalog, schema, needed)
    star = _apply_cuts(star, schema, query.cuts)

    dd_cols = [
        F.expr(schema.level(d).label_expr).alias(schema.level(d).out_name)
        for d in query.drilldowns
    ]
    aggs = []
    for m in query.measures:
        meas = schema.measure(m)
        fn = _AGG_FNS[meas.agg]
        col = F.lit(1) if meas.expr == "*" else F.expr(meas.expr)
        aggs.append(fn(col).alias(meas.out_name))

    grouped = star.rollup(*dd_cols) if query.rollup else star.groupBy(*dd_cols)
    return grouped.agg(*aggs)


def members(
    spark: SparkSession,
    sf_dir: str,
    cube: str,
    level: str,
    cubes: dict[str, CubeSchema] | None = None,
    full_payload: bool = False,
) -> DataFrame:
    """Member enumeration — the engine-native ``OEC.get_members``
    (reference oec.py:12-25): distinct (id, label) of a level, sorted by id.
    Implements the *intended* sort the reference drops on the floor
    (oec.py:23 discards the sort_values result; SURVEY §2.L.1).

    ``full_payload=False`` (default) projects exactly ``(id, label)`` — the
    columns every caller actually drills on. The reference instead returns
    *every* column the members endpoint sends (oec.py:22 builds the frame
    from the raw JSON payload); ``full_payload=True`` restores that parity
    by carrying ALL remaining columns of the level's source table as member
    attributes (names normalized, reference oec.py:24). Attribute rows are
    well-defined when the member key is a key of the source table (true for
    every dim-backed level — the shape the members endpoint serves); for
    degenerate/derived levels (Year, Return Flag) the distinct still
    collapses correctly but the "attributes" are whatever fact columns ride
    along, so the default stays (id, label).

    Scans ONLY the level's own table, never the fact: a level's key/label
    expressions reference columns of the last table in its ``requires``
    chain (or the fact for degenerate levels), so the member list comes
    from that one table — the OLAP-server semantics (all members of the
    level, fact-observed or not), and at 100 TB the difference between a
    metadata lookup and a full fact scan."""
    cubes = cubes or DEFAULT_CUBES
    schema = cubes[cube]
    lvl = schema.level(level)
    catalog = Catalog(spark, sf_dir)
    source = _resolve_table(
        catalog, schema, lvl.requires[-1] if lvl.requires else schema.fact
    )
    out_id = f"{lvl.out_name}_id"
    cols = [
        F.expr(lvl.key).alias(out_id),
        F.expr(lvl.label_expr).alias(lvl.out_name),
    ]
    if full_payload:
        claimed = {lvl.key, lvl.label_expr}
        cols += [
            F.col(c).alias(normalize_colname(c))
            for c in source.columns
            if c not in claimed
        ]
    return source.select(*cols).distinct().orderBy(out_id)


# --------------------------------------------------------------------------
# runtime cube registration


def _titleize(col: str) -> str:
    return " ".join(p.capitalize() for p in col.split("_") if p)


def infer_cube(
    name: str,
    fact: DataFrame,
    joins: tuple[Join, ...] = (),
    dim_frames: dict[str, DataFrame] | None = None,
    levels: dict[str, Level] | None = None,
    measures: dict[str, Measure] | None = None,
    exclude: tuple[str, ...] = (),
) -> CubeSchema:
    """Build a ``CubeSchema`` from DataFrames at runtime — the ad-hoc path
    the reference gets for free by addressing any server cube by name
    (reference oec.py:53 ``"cube": cube_name``): a user with a new fact
    table registers it here instead of editing ``DEFAULT_CUBES``.

    Inference walks the fact's schema plus each joined dim frame:

    - string columns → one degenerate level apiece ("event_type" →
      level "Event Type")
    - date/timestamp columns → derived Year and Month levels
    - numeric columns → a summed "Total X" measure
    - join-key columns (any side of a ``Join``) and ``exclude`` names are
      skipped — keys are plumbing, not analysis axes
    - a "Row Count" count(*) measure is always present

    ``levels``/``measures`` overlay the inferred dicts (same names replace,
    new names extend), so inference handles the long tail and the caller
    spells only the interesting derived expressions. Dim-frame levels get
    ``requires`` chains through the join graph, so join pruning works
    exactly as for the hand-built cubes. The returned schema carries its
    DataFrames in ``frames`` — ``compile_query``/``members`` resolve those
    before the parquet catalog, so the cube works with no catalog entry:

        schema = infer_cube("sales", fact_df,
                            joins=(Join("stores", "store_id", "id"),),
                            dim_frames={"stores": stores_df})
        compile_query(spark, sf_dir, q, cubes={**DEFAULT_CUBES,
                                               "sales": schema})
    """
    from pyspark.sql import types as T

    dim_frames = dict(dim_frames or {})
    key_cols = {j.left for j in joins} | {j.right for j in joins}
    skip = key_cols | set(exclude)

    by_table = {j.table: j for j in joins}

    def requires_chain(table: str | None) -> tuple[str, ...]:
        chain: list[str] = []
        while table is not None:
            chain.append(table)
            table = by_table[table].parent
        return tuple(reversed(chain))

    inf_levels: dict[str, Level] = {}
    inf_measures: dict[str, Measure] = {}

    sources: list[tuple[str | None, DataFrame]] = [(None, fact)]
    sources += [(t, df) for t, df in dim_frames.items() if t in by_table]
    for table, df in sources:
        req = requires_chain(table)
        for f in df.schema.fields:
            if f.name in skip:
                continue
            title = _titleize(f.name)
            dt = f.dataType
            if isinstance(dt, T.StringType):
                inf_levels[title] = Level(title, f.name, requires=req)
            elif isinstance(
                dt, (T.DateType, T.TimestampType, T.TimestampNTZType)
            ):
                for part in ("year", "month"):
                    lname = f"{title} {part.capitalize()}"
                    inf_levels[lname] = Level(
                        lname, f"{part}({f.name})", requires=req
                    )
            elif isinstance(dt, T.NumericType):
                mname = f"Total {title}"
                inf_measures[mname] = Measure(mname, f.name, requires=req)
    inf_measures["Row Count"] = Measure("Row Count", "*", agg="count")

    inf_levels.update(levels or {})
    inf_measures.update(measures or {})
    frames = {name: fact, **dim_frames}
    return CubeSchema(
        name=name,
        fact=name,
        joins=joins,
        levels=inf_levels,
        measures=inf_measures,
        frames=frames,
    )
