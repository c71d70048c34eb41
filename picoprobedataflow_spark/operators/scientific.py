"""Scientific kernels (reference pillar 2): hyperspectral cube
reductions and temporal-stack frame normalization, operating on the
long-form tables produced by :mod:`..io.emd`.

Once the cube is long-form, the reference's numpy axis-sums
(``hs_image.sum(axis=2)`` / ``sum(axis=(0,1))``,
tools/hyperspectral.py:96,104) are plain groupBy aggregates —
map-side-combined, shuffle on the (small) output key space, fully
Catalyst-optimized. Frame normalization (tools/temporal.py:21-35) is a
grouped min/max + the uint8 scale expression; the YOLO inference stage
of temporal.py is modeled in :mod:`.multimodal` as a batched model UDF
stub.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from picoprobedataflow_spark.functions.scalar import (
    energy_axis_kev,
    normalize_to_uint8,
)


def spectral_image(cube: DataFrame,
                   keys: tuple[str, ...] = ("path",)) -> DataFrame:
    """A12 — image = Σ over channel axis: one pixel row per (x, y)."""
    return (cube.groupBy(*keys, "x", "y")
                .agg(F.sum("counts").alias("intensity")))


def spectrum(cube: DataFrame, keys: tuple[str, ...] = ("path",),
             x_offset: float = -479.0021,
             x_increment: float = 5.0) -> DataFrame:
    """A13 + F11 — spectrum = Σ over spatial axes, with the calibrated
    energy axis attached (hyperspectral.py:69-74,104)."""
    return (cube.groupBy(*keys, "channel")
                .agg(F.sum("counts").alias("counts"))
                .withColumn("energy_kev",
                            energy_axis_kev(F.col("channel"),
                                            x_offset, x_increment)))


def normalize_frames(frames: DataFrame,
                     keys: tuple[str, ...] = ("path", "t")) -> DataFrame:
    """A14 + F10 — per-frame min/max normalization to uint8 px
    (temporal.py:21-35). Grouped bounds join back by broadcast (the
    bounds table is tiny: one row per frame)."""
    bounds = (frames.groupBy(*keys)
                    .agg(F.min("intensity").alias("lo"),
                         F.max("intensity").alias("hi")))
    joined = frames.join(F.broadcast(bounds), list(keys))
    return joined.select(
        *keys, "x", "y",
        normalize_to_uint8(F.col("intensity"),
                           F.col("lo"), F.col("hi")).alias("px"))


def synthetic_cube(spark, nx: int = 32, ny: int = 32, ns: int = 16) -> DataFrame:
    """Deterministic range-generated cube (both engines can reproduce
    it exactly — the oracle twin is DuckDB ``range``): counts follow a
    Weyl-sequence-ish integer recurrence so values are exact doubles."""
    n = nx * ny * ns
    df = spark.range(n)
    return df.select(
        F.expr(f"CAST(id % {nx} AS INT)").alias("x"),
        F.expr(f"CAST((id div {nx}) % {ny} AS INT)").alias("y"),
        F.expr(f"CAST(id div {nx * ny} AS INT)").alias("channel"),
        F.expr("((id * 2654435761) % 100000) / CAST(10 AS DOUBLE)").alias("counts"),
    )


def synthetic_frames(spark, nt: int = 8, nx: int = 16, ny: int = 16) -> DataFrame:
    n = nt * nx * ny
    df = spark.range(n)
    return df.select(
        F.expr(f"CAST(id div {nx * ny} AS INT)").alias("t"),
        F.expr(f"CAST((id div {ny}) % {nx} AS INT)").alias("x"),
        F.expr(f"CAST(id % {ny} AS INT)").alias("y"),
        F.expr("((id * 1103515245 + 12345) % 65536) / CAST(256 AS DOUBLE)").alias("intensity"),
    )
