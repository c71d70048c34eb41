"""The two ingest flows (reference EP1+EP2) as single lazy DataFrame
programs.

Reference DAG (examples/hyperspectral_flow/main.py:28-33 and
examples/spatiotemporal_flow/main.py:29-34):

    Transfer → {Hyperspectral|Temporal}ImageTool
             → Publishv2(GatherMetadata + Ingest)

Spark mapping: the Transfer step is the binaryFile scan + checksum
manifest (the data is already where the executors are — Spark's
locality replaces Globus Transfer); the AnalysisTool is the EMD
extraction kernel + relational reductions; Publish is the DataCite doc
assembly + catalog append. One driver call materializes the whole DAG;
per-step timing lands in a telemetry table shaped like FIXTURES.md §2
so the analyzer queries run on it unchanged.
"""

from __future__ import annotations

import time

from pyspark.storagelevel import StorageLevel
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from picoprobedataflow_spark.io import binary_files as BF
from picoprobedataflow_spark.io import emd as EMD
from picoprobedataflow_spark.operators import scientific as SC


@dataclass
class FlowResult:
    """Materialized outputs of one flow run + its step-event telemetry
    (step_events rows shaped like FIXTURES.md §2: run_id, code,
    state_name, time)."""

    run_id: str
    manifest: DataFrame
    publish_docs: DataFrame
    analysis: dict[str, DataFrame]
    step_events: list[tuple[str, int, str, str, float]] = field(
        default_factory=list)

    def step_events_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            self.step_events,
            "run_id string, entry_index int, code string, "
            "state_name string, time double")


class _StepLog:
    def __init__(self, run_id: str):
        self.run_id = run_id
        self.rows: list[tuple[str, int, str, str, float]] = []
        self._i = 0

    def __call__(self, state_name: str):
        log = self

        class _Ctx:
            def __enter__(self_inner):
                log.rows.append((log.run_id, log._i, "ActionStarted",
                                 state_name, time.time()))
                log._i += 1
                return self_inner

            def __exit__(self_inner, *exc):
                log.rows.append((log.run_id, log._i, "ActionCompleted",
                                 state_name, time.time()))
                log._i += 1
                return False

        return _Ctx()


def _ingest(spark: SparkSession, input_dir: str, glob: str,
            processed: DataFrame | None, log: _StepLog) -> DataFrame:
    from picoprobedataflow_spark.plans.common import prep

    prep(spark)  # AQE/UTC; avoids the default-200-partition shuffles
    with log("Transfer"):
        files = BF.scan_binary_dir(spark, input_dir, glob=glob)
        manifest = BF.incremental_ingest(files, processed)
        manifest = manifest.persist(StorageLevel.MEMORY_ONLY)
        manifest.count()  # materialize inside the step boundary
    return manifest


def hyperspectral_flow(spark: SparkSession, input_dir: str,
                       catalog_path: str | None = None,
                       processed: DataFrame | None = None,
                       run_id: str = "hyper-run-0") -> FlowResult:
    """PicoProbeMetadataFlow twin: ingest .emd files, extract the 3-D
    signal, reduce to image + spectrum, publish."""
    log = _StepLog(run_id)
    manifest = _ingest(spark, input_dir, "*.emd", processed, log)
    files = BF.scan_binary_dir(spark, input_dir, glob="*.emd").join(
        manifest.select("path"), "path", "left_semi")

    with log("HyperspectralImageTool"):
        cube = EMD.extract_cube_longform(files).persist(StorageLevel.MEMORY_ONLY)
        image = SC.spectral_image(cube)
        spect = SC.spectrum(cube)
        image.count(), spect.count()

    with log("Publishv2GatherMetadata"):
        signals = EMD.extract_signals(files)
        docs = BF.publish_documents(files, exp_type="hyperspectral_imaging")
        docs = docs.persist(StorageLevel.MEMORY_ONLY)
        docs.count()

    with log("Publishv2Ingest"):
        if catalog_path is not None:
            BF.write_catalog(docs, catalog_path)

    return FlowResult(run_id=run_id, manifest=manifest, publish_docs=docs,
                      analysis={"image": image, "spectrum": spect,
                                "signals": signals},
                      step_events=log.rows)


def spatiotemporal_flow(spark: SparkSession, input_dir: str,
                        catalog_path: str | None = None,
                        processed: DataFrame | None = None,
                        run_id: str = "spatio-run-0") -> FlowResult:
    """PicoProbeTemporalImaging twin: ingest, per-frame normalize (the
    MP4-encode precursor, temporal.py:21-35), publish. The YOLO stage
    is the batched-inference stub in operators.multimodal."""
    log = _StepLog(run_id)
    manifest = _ingest(spark, input_dir, "*.emd", processed, log)
    files = BF.scan_binary_dir(spark, input_dir, glob="*.emd").join(
        manifest.select("path"), "path", "left_semi")

    with log("TemporalImageTool"):
        cube = EMD.extract_cube_longform(files)
        # (T, X, Y) stack: channel ≙ frame index t (time-major layout)
        frames = cube.select("path", F.col("x").alias("t"),
                             F.col("y").alias("x"),
                             F.col("channel").alias("y"),
                             F.col("counts").alias("intensity"))
        px = SC.normalize_frames(frames, keys=("path", "t")).persist(StorageLevel.MEMORY_ONLY)
        px.count()

    with log("Publishv2GatherMetadata"):
        docs = BF.publish_documents(files, exp_type="spatiotemporal_imaging")
        docs = docs.persist(StorageLevel.MEMORY_ONLY)
        docs.count()

    with log("Publishv2Ingest"):
        if catalog_path is not None:
            BF.write_catalog(docs, catalog_path)

    return FlowResult(run_id=run_id, manifest=manifest, publish_docs=docs,
                      analysis={"frames_px": px}, step_events=log.rows)
