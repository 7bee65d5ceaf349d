"""Document chunking for training pipelines: split each document into
overlapping token windows (the standard pre-tokenization step before
sequence packing — cf. pack_sequences in the catalog).

Pure column math: tokenize once, generate chunk indices with
``sequence``, ``slice`` out each window, explode.  No UDF, no shuffle —
a narrow map stage safe at any corpus size; chunk counts are a closed
form of the token count so the operator is oracle-able.

Contract (shared with the DuckDB oracle):
* tokens = lowercased whitespace split (functions.text.tokens);
* chunk i covers 1-based token span [i*stride+1, i*stride+chunk_tokens]
  with stride = chunk_tokens - overlap;
* a document with n > 0 tokens yields floor((n-1)/stride)+1 chunks (the
  last may be short); n = 0 yields none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from curw_mike_data_handler_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """→ (doc_id, chunk_no, tok_start, chunk_len, chunk_text).

    ``overlap`` tokens are shared between consecutive chunks so no
    training window straddles a chunk boundary unseen."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    w = tokens(text_col)
    n = F.size(w)
    # guard: sequence(0, -1) DESCENDS in Spark — empty docs get an
    # empty index array instead
    idx = F.when(n > 0, F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int"))).otherwise(
        F.array().cast("array<int>")
    )
    return (
        docs.select(F.col(id_col), w.alias("__w"), n.alias("__n"), F.explode(idx).alias("chunk_no"))
        .select(
            F.col(id_col),
            F.col("chunk_no").cast("bigint").alias("chunk_no"),
            (F.col("chunk_no") * stride + 1).cast("bigint").alias("tok_start"),
            F.least(F.lit(chunk_tokens), F.col("__n") - F.col("chunk_no") * stride)
            .cast("bigint")
            .alias("chunk_len"),
            F.concat_ws(
                " ", F.slice(F.col("__w"), F.col("chunk_no") * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
        )
    )
