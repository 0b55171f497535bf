"""Streaming observability: a StreamingQueryListener that turns every
micro-batch's progress event into a metrics ROW — the streaming
counterpart of monitoring.py's batch PipelineMonitor (SURVEY M1-M4).
The reference monitors batch pipelines only; a production lakehouse
ingest is a streaming query, and its health signals (rows/batch,
batch duration, state size, watermark lag) exist only in the progress
events this listener captures.

Design notes:

* Events arrive on the engine's listener thread — the handler only
  APPENDS to an in-memory buffer (no Spark calls: issuing jobs from
  the listener thread can deadlock availableNow termination).
  ``flush_to_table`` converts the buffer to a DataFrame from the
  caller's thread.
* Rows carry (query_id, batch_id) so replays/restarts are
  disambiguated downstream the same way foreach_batch_cdf keys its
  changelog.
* ``progress.numInputRows`` etc. come from the engine's own
  accounting, making this the cheap cross-check for sink-side row
  counts (a mismatch = rows lost between source and sink).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

METRICS_SCHEMA = (
    "query_id string, run_id string, batch_id long, name string, "
    "input_rows long, rows_per_sec double, batch_duration_ms long, "
    "state_rows long, watermark string"
)


@dataclass
class StreamMetricsListener(StreamingQueryListener):
    """Buffers one metrics row per micro-batch progress event."""

    rows: list[tuple] = field(default_factory=list)
    started: list[str] = field(default_factory=list)
    terminated: list[str] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        batch_duration = (p.get("durationMs") or {}).get("triggerExecution")
        state_rows = sum(
            s.get("numRowsTotal", 0) for s in p.get("stateOperators") or []
        )
        self.rows.append(
            (
                str(p.get("id")),
                str(p.get("runId")),
                int(p.get("batchId", -1)),
                p.get("name"),
                int(p.get("numInputRows", 0)),
                float(p.get("processedRowsPerSecond") or 0.0),
                int(batch_duration) if batch_duration is not None else -1,
                int(state_rows),
                (p.get("eventTime") or {}).get("watermark"),
            )
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.terminated.append(str(event.id))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def flush_to_table(self, spark: SparkSession) -> DataFrame:
        """Materialize the buffered metrics as a DataFrame (call from a
        normal thread, never from the listener callback)."""
        buffered, self.rows = self.rows, []
        return spark.createDataFrame(buffered, METRICS_SCHEMA)
