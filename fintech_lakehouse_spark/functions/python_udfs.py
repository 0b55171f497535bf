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
    carry = [c for c in documents.columns if c != text_col]
    return documents.lateralJoin(
        splitter(F.col(text_col).outer())
    ).select(*carry, "sentence_no", "sentence", "n_tokens")


def make_bpe_encoder(merges: list[tuple[str, str]]):
    """Arrow-batched BPE APPLICATION — the other half of the tokenizer
    loop whose induction step is plans/curation.py::bpe_merge_candidates:
    given the learned merge list (rank = learning order), greedily
    merge the lowest-rank adjacent pair until none applies, exactly
    the classic BPE encode (merged units join with a space, matching
    the induction query's pair representation).

    Returns a scalar pandas UDF over an array<string> token column.
    Why a UDF and not DataFrame ops: each merge REWRITES the sequence
    the next iteration scans (data-dependent loop bound, positions
    shift) — not expressible with higher-order functions without
    building an interpreter in expressions. The merge table rides into
    the closure and broadcasts with the serialized UDF (a production
    50k-merge vocab is ~1 MB — broadcast-variable scale); batches
    cross via Arrow, and the per-doc loop is pure Python only over
    the doc's own tokens."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def encode(tokens):
        toks = list(tokens) if tokens is not None else []
        while len(toks) >= 2:
            best_rank = None
            best_i = -1
            for i in range(len(toks) - 1):
                r = ranks.get((toks[i], toks[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            toks[best_i : best_i + 2] = [f"{toks[best_i]} {toks[best_i + 1]}"]
        return toks

    @pandas_udf(ArrayType(StringType()))
    def bpe_encode(col: pd.Series) -> pd.Series:
        return col.map(encode)

    return bpe_encode


def json_fields_udtf():
    """ARGUMENT-POLYMORPHIC UDTF (Spark 4 ``analyze()``): project JSON
    fields into columns whose NAMES AND COUNT come from the call site —
    ``JsonFields(col("js").outer(), lit("a"), lit("b"))`` yields
    columns (a, b). The static ``analyze`` runs at PLAN time with the
    literal arguments and returns the output schema, so each call site
    gets its own resolved shape — the dynamic-projection capability
    neither a fixed-schema UDTF (split_sentences above) nor from_json
    (schema declared in full, not per-field) expresses. Values come
    back as strings (JSON scalars rendered verbatim), missing keys as
    NULL; typed casts compose downstream."""
    import json as _json

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class JsonFields:
        @staticmethod
        def analyze(
            js: AnalyzeArgument, *fields: AnalyzeArgument
        ) -> AnalyzeResult:
            if not fields or any(f.value is None for f in fields):
                raise ValueError(
                    "JsonFields needs literal field-name arguments"
                )
            st = StructType()
            for f in fields:
                st = st.add(str(f.value), StringType())
            return AnalyzeResult(schema=st)

        def eval(self, js, *fields):  # noqa: ANN001
            # quarantine semantics like every other parser in this
            # repo: malformed or non-object JSON yields a null row, it
            # never kills the task; nested values render as JSON
            # (json.dumps), not Python repr — str() turned true into
            # 'True' and dicts into single-quoted repr, both of which
            # defeat downstream typed casts (review finding r6s5).
            try:
                obj = _json.loads(js) if js else {}
            except ValueError:
                obj = None
            if not isinstance(obj, dict):
                yield tuple(None for _ in fields)
                return

            def render(v):
                if v is None:
                    return None
                if isinstance(v, str):
                    return v
                return _json.dumps(v)

            yield tuple(render(obj.get(f)) for f in fields)

    return JsonFields
