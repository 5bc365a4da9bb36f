"""Grid-blocked spatial joins (H3/S2 cell bucketing reduced to a square
grid) — the geospatial join family.

The scale story: a radius join is NEVER all-pairs. Each point lands in one
``cell x cell`` grid cell (cell edge >= radius), the left side explodes to
its 3x3 neighborhood, and a plain equi-join on the cell key produces
candidates — cost is density-bounded per cell, one shuffle on the cell key,
and the exact distance filter runs last inside codegen. Swap the square
grid for H3/S2 indexes on real geo coordinates; the plan shape is
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def radius_join_grid(
    pts: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    cell: int | None = None,
) -> DataFrame:
    """All point pairs (a_id < b_id) within L2 distance ``radius``, exact:
    integer coordinates, integer squared-distance filter ``d2 <= radius^2``.
    A pair is found exactly once — b's home cell occurs once in a's 3x3
    neighborhood (requires ``cell >= radius``, the blocking soundness
    condition: two points within ``radius`` differ by < cell per axis, so
    their cell indices differ by at most 1). Returns (a_id, b_id, d2)."""
    cell = cell or radius + 1
    if cell < radius:
        raise ValueError("cell edge must be >= radius (else neighbors are missed)")
    cx = (F.col(x_col) / cell).cast("long")
    cy = (F.col(y_col) / cell).cast("long")
    a = (
        pts.select(
            F.col(id_col).alias("a_id"),
            F.col(x_col).alias("ax"),
            F.col(y_col).alias("ay"),
            cx.alias("cx0"),
            cy.alias("cy0"),
        )
        .withColumn("dx", F.expr("explode(array(-1, 0, 1))"))
        .withColumn("dy", F.expr("explode(array(-1, 0, 1))"))
        .select(
            "a_id",
            "ax",
            "ay",
            (F.col("cx0") + F.col("dx")).alias("cx"),
            (F.col("cy0") + F.col("dy")).alias("cy"),
        )
    )
    b = pts.select(
        F.col(id_col).alias("b_id"),
        F.col(x_col).alias("bx"),
        F.col(y_col).alias("by"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        a.join(b, ["cx", "cy"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("d2", d2)
        .filter(F.col("d2") <= radius * radius)
        .select("a_id", "b_id", "d2")
    )
