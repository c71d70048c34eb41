"""The reference's flows as end-to-end DataFrame programs.

A user of the reference runs three things (SURVEY §3): the
hyperspectral ingest flow, the spatiotemporal ingest flow, and the
flow-analytics CLI. Each has a Spark-native twin here with the same
step semantics (Transfer → AnalysisTool → Publish) and the same
telemetry outputs.
"""

from picoprobedataflow_spark.flows.analyzer import FlowAnalyzer  # noqa: F401
from picoprobedataflow_spark.flows.crawl import (  # noqa: F401
    prioritize_frontier,
)
from picoprobedataflow_spark.flows.curation import (  # noqa: F401
    CurationResult,
    curate_documents,
)
from picoprobedataflow_spark.flows.pipelines import (  # noqa: F401
    hyperspectral_flow,
    spatiotemporal_flow,
)
