"""Streaming BPE token accounting: the continuous twin of the
tokenize half of ``pack_sequences_bpe`` — per-document token counts
under a FROZEN tokenizer-of-record, maintained as documents arrive.

The embed_stream design transplanted to the tokenizer: given a frozen
merge table, a document's BPE token count is a PURE FUNCTION of its
own text (the codegen replace-chain — zero Python), so each delivery
tokenizes only itself and the fold is idempotent LAST-WRITER-WINS by
doc_id (bit-identical replays rewrite identical rows; text-edit
re-deliveries REPLACE the stale count; the anti-join keys on the
DELIVERY's doc_ids). What makes idempotence real is the model pin:
counts produced by two different tokenizers must never fold into one
state, so ``init_bpe_counts`` persists the merge list as a
fingerprint-pinned modelstore artifact BESIDE the state (outside the
version-GC namespace — the embed_stream ``.__tokmodel__`` lesson) and
pins its fingerprint in the manifest; a swapped artifact refuses at
both layers (the artifact's own fingerprint check + the manifest pin).

``read_packed_bins`` then serves the packing artifact from the folded
counts through the SAME ``pack_bins_from_counts`` the batch queries
run — literal shared code, so streamed packing equals
``pack_sequences_bpe`` bit-for-bit whenever the state covers the
corpus (tests/test_bpe_stream.py).

State size = one row per document (doc_id, n_bpe_tokens) — the
accounting table a packing/pricing stage keeps anyway; never raw
text history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BPE_COUNT_STATE_SCHEMA = "doc_id long, n_bpe_tokens long"

_TOKENIZER_NAME = "tokenizer_of_record"


def _tokenizer_dir(state_path: str) -> str:
    # outside the ".__v*__" version-GC namespace (state.py's
    # _gc_stale_versions glob), like embed_stream's ".__tokmodel__"
    return state_path.rstrip("/") + ".__tokenizer__"


def init_bpe_counts(
    spark: SparkSession, state_path: str, merges: list[tuple[str, str]]
) -> None:
    """Freeze the merge table beside the state (a modelstore bpe
    artifact — fingerprint-pinned, tamper-refusing) and pin its
    fingerprint in the manifest; the count state starts EMPTY."""
    from bigdatasmallprice_spark.modelstore import (
        bpe_merges_fingerprint,
        save_bpe_merges,
    )
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        state_version_dir,
    )

    save_bpe_merges(_tokenizer_dir(state_path), _TOKENIZER_NAME, merges)
    version = next_state_version(state_path)
    spark.createDataFrame([], BPE_COUNT_STATE_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(state_version_dir(state_path, version))
    publish_state(
        state_path,
        version,
        batch_id=None,
        config={"bpe_merges_md5": bpe_merges_fingerprint(merges)},
    )


def update_bpe_counts(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    batch_id: int | None = None,
) -> None:
    """foreachBatch body: tokenize ONLY the delivery with the pinned
    frozen tokenizer (codegen replace-chain, zero Python) and fold the
    (doc_id, n_bpe_tokens) rows last-writer-wins by the DELIVERY's
    doc_ids (a document re-delivered with empty text keeps a 0-count
    row — the batch tokenizer's own value for empty text)."""
    from bigdatasmallprice_spark.modelstore import (
        bpe_merges_fingerprint,
        latest_bpe_merges,
    )
    from bigdatasmallprice_spark.operators.bpe import (
        bpe_symbols_sql,
        bpe_token_count_from_symbols_sql,
    )
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        read_state_manifest,
        resolve_state_dir,
        state_version_dir,
        validate_state_config,
        versioned_already_applied,
    )

    manifest = read_state_manifest(state_path)
    if manifest is None:
        raise FileNotFoundError(
            f"no BPE count state at {state_path}; run init_bpe_counts first"
        )
    if versioned_already_applied(state_path, batch_id):
        return
    # double pin: the artifact verifies its own fingerprint on load
    # (tamper/torn-write refusal), and the manifest pin refuses a
    # swapped-but-internally-consistent artifact
    merges = latest_bpe_merges(_tokenizer_dir(state_path), _TOKENIZER_NAME)
    validate_state_config(
        state_path, {"bpe_merges_md5": bpe_merges_fingerprint(merges)}
    )
    sym = bpe_symbols_sql("text", merges, "spark")
    cnt = bpe_token_count_from_symbols_sql("m", "text")
    part = (
        batch.select("doc_id", "text")
        .withColumn("m", F.expr(sym))
        .selectExpr("doc_id", f"{cnt} AS n_bpe_tokens")
    )
    prior = spark.read.schema(BPE_COUNT_STATE_SCHEMA).parquet(
        resolve_state_dir(state_path)
    )
    delivered = batch.select("doc_id").distinct()
    new = part.unionByName(prior.join(delivered, "doc_id", "left_anti"))
    version = next_state_version(state_path)
    new.coalesce(1).write.mode("overwrite").parquet(
        state_version_dir(state_path, version)
    )
    publish_state(state_path, version, batch_id, config=manifest["config"])


def read_bpe_counts(spark: SparkSession, state_path: str) -> DataFrame:
    """(doc_id, n_bpe_tokens): the continuously maintained accounting
    table."""
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no BPE count state at {state_path}")
    return spark.read.schema(BPE_COUNT_STATE_SCHEMA).parquet(state_dir)


def read_packed_bins(spark: SparkSession, state_path: str) -> DataFrame:
    """The packing artifact SERVED from the streamed counts — the
    batch chain (pack_bins_from_counts, literal shared code) over the
    folded state, so streamed packing == pack_sequences_bpe whenever
    the state covers the corpus."""
    from bigdatasmallprice_spark.queries.textq import pack_bins_from_counts

    return pack_bins_from_counts(
        read_bpe_counts(spark, state_path).select(
            "doc_id", F.col("n_bpe_tokens").alias("nt")
        )
    )
