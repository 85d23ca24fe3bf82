"""Reference-parity client facade.

Mirrors the reference's two-method public API (class ``OEC``,
reference oec.py:8-66) — ``get_members(cube, level)`` and
``get_data(cube, drilldown, measure, cut)`` — but executes locally on Spark
through the CubeQuery compiler instead of delegating to a remote OLAP server.
A user of the reference can switch to this class and run the same calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .cube import DEFAULT_CUBES, CubeQuery, CubeSchema, compile_query, members


class CubeClient:
    """Drop-in local replacement for the reference ``OEC`` client.

    Differences, all deliberate (SURVEY §2.L):
    - results are Spark DataFrames (lazily planned), not pandas
    - member enumeration is actually sorted (the reference's sort is a
      silent no-op, oec.py:23)
    - drilldowns/measures are lists end-to-end — no comma-joined wire
      strings (oec.py:50-51 / util.py:21 inconsistency removed)
    """

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        cubes: dict[str, CubeSchema] | None = None,
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self.cubes = cubes or DEFAULT_CUBES

    def get_members(
        self, cube: str, level: str, full_payload: bool = False
    ) -> DataFrame:
        """Member table of ``(cube, level)`` — reference oec.py:12-25.
        ``full_payload=True`` returns every column of the level's source
        table (the reference keeps the endpoint's whole payload,
        oec.py:22); the default projects the (id, label) pair callers
        actually drill on."""
        return members(
            self.spark, self.sf_dir, cube, level, self.cubes,
            full_payload=full_payload,
        )

    def get_data(
        self,
        cube: str,
        drilldown: list[str],
        measure: list[str],
        cut: dict | None = None,
    ) -> DataFrame:
        """Aggregation query — reference oec.py:27-66. ``cut`` is optional
        (oec.py:45) and never mutated (oec.py:48)."""
        query = CubeQuery(
            cube=cube,
            drilldowns=tuple(drilldown),
            measures=tuple(measure),
            cuts=dict(cut) if cut else None,
        )
        return compile_query(self.spark, self.sf_dir, query, self.cubes)

    def sql(self, query: str) -> DataFrame:
        """Raw Spark SQL over the catalog tables (registered as temp views
        on first use). The escape hatch past the cube vocabulary: anything
        the DataFrame surface expresses is equally writable as SQL, and the
        resulting plan goes through the same Catalyst pipeline."""
        from ..sources.registry import Catalog

        Catalog(self.spark, self.sf_dir).register_views()
        return self.spark.sql(query)
