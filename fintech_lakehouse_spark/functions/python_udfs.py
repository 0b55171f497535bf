"""The complete Python-function surface (SURVEY §2.13): the reference
has zero UDFs (good — built-ins first, which this engine follows), but
a complete engine must offer every escape hatch, each Arrow-vectorized:

* scalar pandas UDF  → functions/vectors.py::cosine_to_query_pandas_udf
* mapInPandas        → functions/multimodal.py (feature extraction)
* applyInPandasWithState → streaming/events.py::stateful_user_totals
* grouped applyInPandas (UDAF shape) → label_centroids here
* Python UDTF (table function)       → SentenceSplitter here
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_centroids(emb: DataFrame, vec: str = "embedding") -> DataFrame:
    """Per-label embedding centroid via grouped applyInPandas — the
    UDAF shape: each group's rows arrive as ONE pandas DataFrame, numpy
    reduces them vectorized, one row returns per group.

    Built-ins cannot express element-wise array means without an
    explode (shuffling dim× the data); here each group reduces locally
    after a single shuffle on the group key. At 100 TB add a salt
    pre-aggregation for hot labels (operators/skew.py pattern)."""
    import numpy as np

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf[vec].to_numpy())
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "centroid": [np.asarray(mat, dtype=np.float64).mean(axis=0).tolist()],
                "n_vectors": [len(pdf)],
            }
        )

    return emb.groupBy("label").applyInPandas(
        centroid, "label int, centroid array<double>, n_vectors long"
    )


def split_sentences(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Python UDTF (table function, Spark 4): one input document row →
    N output sentence rows with positions. The UDTF shape fits
    parsers/tokenizers that emit a variable number of typed rows per
    input — the lateral-join escape hatch when explode(expr) can't
    express the split logic."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="sentence_no int, sentence string, n_tokens int")
    class SentenceSplitter:
        def eval(self, text: str):  # noqa: ANN001
            if not text:
                return
            # '.'-less synthetic corpus → fall back to fixed-width
            # 12-token pseudo-sentences; a real corpus would use a
            # sentence segmenter here.
            parts = (
                [p.strip() for p in text.split(".") if p.strip()]
                if "." in text
                else [
                    " ".join(text.split(" ")[i : i + 12])
                    for i in range(0, len(text.split(" ")), 12)
                ]
            )
            for no, part in enumerate(parts):
                yield no, part, len(part.split(" "))

    splitter = SentenceSplitter
    return documents.lateralJoin(
        splitter(F.col("text").outer())
    ).select("doc_id", "sentence_no", "sentence", "n_tokens")
