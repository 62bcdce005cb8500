"""Structured Streaming surface (SURVEY.md §2.11 + task brief).

The reference is pure batch — incremental runs are snapshot-resume — so the
streaming surface here is the engine capability layer for the graft's
training-data use case:

* :func:`stream_events` — file-source ingest -> event-time watermark ->
  tumbling-window aggregation (the streamed twin of the batch
  ``window_tumbling`` query; equality asserted in tests);
* :func:`dedupe_stream` — **custom stateful operator** via
  ``applyInPandasWithState``: incremental exact-dedupe by key across
  micro-batches (first occurrence wins, later arrivals dropped), the
  streaming form of the pipeline's exact-dedup stage.  State is one byte per
  key; at scale the key should be the content fingerprint (md5), so state
  size is bounded by distinct-document count exactly like the batch
  ``dropDuplicates``.

Both run under ``availableNow`` triggers for deterministic tests and under
continuous micro-batch triggers in production unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def stream_events(
    spark, src_path: str, schema, ts_col: str = "ts",
    window: str = "1 hour", watermark: str = "2 hours",
):
    """File-source stream -> watermark -> tumbling count/sum per event_type."""
    return (
        spark.readStream.schema(schema)
        .parquet(src_path)
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("start"), "event_type", "n", "sum_value")
    )


def dedupe_stream(stream_df: DataFrame, key_col: str, payload_cols: list[str]):
    """Stateful streaming exact-dedupe: emit the first row seen for each key,
    drop every later arrival (across micro-batches — the state store carries
    the seen-flag between triggers and across restarts via the checkpoint).

    Arrow-batched per-group processing (``applyInPandasWithState``); no
    per-row Python outside the grouped kernel."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [T.StructField(key_col, T.StringType())]
        + [T.StructField(c, T.StringType()) for c in payload_cols]
    )
    state_schema = T.StructType([T.StructField("seen", T.IntegerType())])

    def first_wins(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            # key already emitted in an earlier micro-batch: drop everything
            for _ in pdf_iter:
                pass
            yield pd.DataFrame(columns=[key_col] + payload_cols)
            return
        first = None
        for pdf in pdf_iter:
            if first is None and len(pdf):
                first = pdf.iloc[[0]][[key_col] + payload_cols].astype(str)
        state.update((1,))
        if first is not None:
            yield first
        else:
            yield pd.DataFrame(columns=[key_col] + payload_cols)

    return stream_df.groupBy(key_col).applyInPandasWithState(
        first_wins,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
