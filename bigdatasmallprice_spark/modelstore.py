"""Model/metrics file registry + serving splice (S17 / O8 / D5 glue).

Reference semantics:
- src/modelling/train.py:101-118 saves the fitted model plus a metrics
  JSON beside it, stamped with a sortable timestamp version;
- src/modelling/predict.py:40-57 resolves "the model" as newest-by-name
  via filename sort (O8) and loads it for scoring;
- src/modelling/evaluate.py:98-145 persists metrics and applies the
  MAPE<8% quality gate.

Here an artifact is a JSON document holding the closed-form linear
coefficients (operators/linreg.py) plus their training metrics, so
train → save → find-latest → score round-trips entirely inside the
engine: scoring joins the (tiny, broadcast) coefficient frame back onto
any fact table — no collect of the scored data, scales to any row
count. The artifact store is driver-side file glue by design (models
are KBs; the DATA never leaves the cluster).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION_RE = re.compile(r"_v(\d{8}T\d{6})\.json$")


def _version_stamp(when: dt.datetime | None = None) -> str:
    when = when or dt.datetime.now(dt.timezone.utc)
    return when.strftime("%Y%m%dT%H%M%S")


def save_model(
    model_dir: str,
    name: str,
    coefficients: DataFrame,
    metrics: DataFrame | None = None,
    version: str | None = None,
) -> str:
    """Persist a fitted model (per-key coefficient frame from
    ``linear_coefficients``/``fit_linear_hour_dow``) + optional metrics
    frame (``mape_gate`` output) as one versioned JSON artifact.

    Collecting here is correct, not a scale smell: coefficients are one
    row per key (KBs), the reference's joblib dump analog."""
    return _write_artifact(
        model_dir,
        name,
        version,
        metrics,
        {"coefficients": [r.asDict() for r in coefficients.collect()]},
    )


def _write_artifact(
    model_dir: str,
    name: str,
    version: str | None,
    metrics: DataFrame | None,
    extra: dict,
) -> str:
    """Shared artifact-write tail: version stamping/validation, doc
    assembly, tmp-write + atomic os.replace (readers never see a
    partial artifact). Both model kinds publish through here so the
    write protocol cannot fork."""
    os.makedirs(model_dir, exist_ok=True)
    version = version or _version_stamp()
    if not re.fullmatch(r"\d{8}T\d{6}", version):
        raise ValueError(f"version {version!r} must be a YYYYMMDDTHHMMSS stamp")
    doc = {
        "name": name,
        "version": version,
        "metrics": [r.asDict() for r in metrics.collect()] if metrics is not None else None,
        **extra,
    }
    path = os.path.join(model_dir, f"{name}_v{version}.json")
    tmp = os.path.join(model_dir, f".{name}_v{version}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(doc, f, sort_keys=True)
    os.replace(tmp, path)
    return path


def save_gbt_model(
    model_dir: str,
    name: str,
    model,
    metrics: DataFrame | None = None,
    version: str | None = None,
) -> str:
    """Persist a fitted boosted-tree model (operators/gbt.py::GbtModel)
    as a versioned artifact with ``kind: "gbt"`` — the registry analog
    of the reference's XGBoost joblib dump (train.py:101-118). The
    document holds base + per-round trees (a few hundred bytes);
    scoring reconstitutes them as one literal column expression."""
    from bigdatasmallprice_spark.operators.gbt import model_to_artifact

    return _write_artifact(
        model_dir,
        name,
        version,
        metrics,
        {
            "kind": "gbt",
            "model": model_to_artifact(model),
            # keeps load_model's artifact shape check satisfied
            "coefficients": [],
        },
    )


def save_gbt_full_model(
    model_dir: str,
    name: str,
    model,
    mae: dict | None = None,
    metrics: DataFrame | None = None,
    version: str | None = None,
    feature_cols: list[str] | None = None,
) -> str:
    """Persist a general boosted model (operators/gbt.py::GbtFullModel)
    as a ``kind: "gbt_full"`` artifact: base + depth + per-tree split
    paths/leaf values + the val-MAE early-stopping round. Scoring
    reconstitutes it as one literal column over the caller's feature
    columns (score_latest with feature_cols, or
    operators.gbt.predict_full_cents_column directly).

    ``feature_cols`` makes the artifact self-describing: the RAW view
    column names, in training order, whose exact-cents featurization
    (queries.core.cents — the transform every fit frame applies)
    reproduces x0..xN. A self-describing artifact scores through
    score_latest with no caller-side feature knowledge, which is what
    lets /api/models/validation serve a boosted model the way the
    reference charts its XGB (main.py:1018-1036)."""
    from bigdatasmallprice_spark.operators.gbt import full_model_to_artifact

    return _write_artifact(
        model_dir,
        name,
        version,
        metrics,
        {
            "kind": "gbt_full",
            "model": full_model_to_artifact(model, mae),
            "feature_cols": list(feature_cols) if feature_cols else None,
            "coefficients": [],
        },
    )


def save_mean_model(
    model_dir: str,
    name: str,
    mean: float,
    metrics: DataFrame | None = None,
    version: str | None = None,
) -> str:
    """Persist the naive baseline — always predict the training-split
    target mean — as a ``kind: "mean"`` artifact (the reference's
    DummyRegressor(strategy="mean"), train.py:36-41, saved as
    naive/naive_load joblibs). One float; scoring is a literal
    column."""
    return _write_artifact(
        model_dir,
        name,
        version,
        metrics,
        {"kind": "mean", "mean": float(mean), "coefficients": []},
    )


def find_latest(model_dir: str, name: str) -> str | None:
    """O8 — newest artifact for ``name`` by version-sortable filename
    (predict.py:40-57's glob + max). Returns None when nothing matches."""
    prefix = f"{name}_v"
    try:
        entries = os.listdir(model_dir)
    except FileNotFoundError:
        return None
    candidates = sorted(
        e for e in entries if e.startswith(prefix) and _VERSION_RE.search(e)
    )
    return os.path.join(model_dir, candidates[-1]) if candidates else None


def load_model(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "coefficients" not in doc or "name" not in doc:
        raise ValueError(f"{path} is not a model artifact")
    return doc


def score_latest(
    spark: SparkSession,
    model_dir: str,
    name: str,
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """Serving splice: resolve newest model by name, emit per-row
    predictions (the latest_features → predict path the reference
    serves). Linear artifacts broadcast-join their per-key coefficient
    frame; gbt artifacts score through a literal tree expression (no
    join at all — ``key`` is ignored, the boosted model is global like
    the reference's); gbt_full artifacts additionally need
    ``feature_cols`` naming df's x-columns in training order."""
    path = find_latest(model_dir, name)
    if path is None:
        raise FileNotFoundError(f"no artifact for model {name!r} in {model_dir}")
    doc = load_model(path)
    if doc.get("kind") == "gbt_full":
        from bigdatasmallprice_spark.operators.gbt import predict_full_cents_column
        from bigdatasmallprice_spark.queries.core import cents

        if feature_cols:
            # caller-side featurization: columns already in training
            # units (the exact-cents x{i} the fit frame carried)
            xcols = [F.col(c) for c in feature_cols]
        elif doc.get("feature_cols"):
            # self-describing artifact: raw view columns, re-featurized
            # with the same cents transform training applied
            xcols = [cents(F.col(c)) for c in doc["feature_cols"]]
        else:
            raise ValueError("gbt_full scoring needs feature_cols in training order")
        pred = predict_full_cents_column(doc["model"], xcols)
        return df.withColumn(
            "prediction", F.round(pred.cast("double") / 100.0, 6)
        ).withColumn("model_version", F.lit(doc["version"]))
    if doc.get("kind") == "mean":
        return df.withColumn(
            "prediction", F.lit(round(float(doc["mean"]), 6))
        ).withColumn("model_version", F.lit(doc["version"]))
    if doc.get("kind") == "gbt":
        from bigdatasmallprice_spark.operators.gbt import predict_cents_column

        pred = predict_cents_column(doc["model"], ts_col)
        return df.withColumn(
            "prediction", F.round(pred.cast("double") / 100.0, 6)
        ).withColumn("model_version", F.lit(doc["version"]))
    coef = spark.createDataFrame(
        [(c[key], c["b0c"], c["b1c"], c["b2c"]) for c in doc["coefficients"]],
        f"{key} string, b0c double, b1c double, b2c double",
    )
    pred_c = (
        F.col("b0c")
        + F.col("b1c") * F.hour(F.col(ts_col))
        + F.col("b2c") * F.dayofweek(F.col(ts_col))
    )
    return (
        df.join(F.broadcast(coef), key)
        .withColumn("prediction", F.round(pred_c / 100.0, 6))
        .drop("b0c", "b1c", "b2c")
        .withColumn("model_version", F.lit(doc["version"]))
    )


# ---------------------------------------------------------------------------
# text-model serving: langid + quality classifier from the registry
# ---------------------------------------------------------------------------
# VERDICT r8 ask #5: the trained langid and quality-classifier fits are
# oracle-paired REFIT queries (they must replay in DuckDB, so the
# training chain runs inside the query). The DEPLOYMENT shape is
# train-once / score-everywhere: persist the fitted integer weights as
# a versioned artifact and score any frame from literals — the
# predict_full_cents_column pattern applied to the text models. Each
# artifact carries an md5 fingerprint of its canonical weight
# serialization (the langid_stream manifest pin); loading verifies it,
# so a tampered or torn artifact refuses to score rather than silently
# misclassifying a corpus.


def save_langid_model(
    model_dir: str,
    name: str,
    w: dict[str, list[int]],
    metrics: DataFrame | None = None,
    version: str | None = None,
) -> str:
    """Persist trained language-ID weights (operators/langid.py::
    langid_fit output: {cls: [w_bucket0..w_bias]} micro-units) as a
    ``kind: "langid"`` artifact with a fingerprint pin."""
    from bigdatasmallprice_spark.streaming.langid_stream import model_fingerprint

    weights = {cls: [int(x) for x in ws] for cls, ws in sorted(w.items())}
    return _write_artifact(
        model_dir,
        name,
        version,
        metrics,
        {
            "kind": "langid",
            "weights": weights,
            "fingerprint": model_fingerprint(weights),
            "coefficients": [],
        },
    )


def load_langid_weights(path: str) -> dict[str, list[int]]:
    """Load + fingerprint-verify a langid artifact. Raises on kind
    mismatch or fingerprint divergence (the langid_stream rule: counts
    or scores from two different models must never mix silently)."""
    from bigdatasmallprice_spark.streaming.langid_stream import model_fingerprint

    doc = load_model(path)
    if doc.get("kind") != "langid":
        raise ValueError(f"{path} is not a langid artifact")
    w = {cls: [int(x) for x in ws] for cls, ws in doc["weights"].items()}
    if model_fingerprint(w) != doc.get("fingerprint"):
        raise ValueError(
            f"{path}: weight fingerprint mismatch — refusing to score "
            "with tampered or corrupted weights"
        )
    return w


def score_langid_latest(
    docs: DataFrame, model_dir: str, name: str
) -> DataFrame:
    """(doc_id, lang, pred_lang): score a document frame with the
    NEWEST persisted langid model — one codegen projection from
    literal weights, no refit, no join. Proven equal to the in-query
    refit path in tests/test_modelstore.py."""
    from bigdatasmallprice_spark.operators.langid import (
        doc_feature_arrays,
        lang_features,
        langid_score,
    )

    path = find_latest(model_dir, name)
    if path is None:
        raise FileNotFoundError(f"no artifact for model {name!r} in {model_dir}")
    w = load_langid_weights(path)
    return langid_score(doc_feature_arrays(lang_features(docs)), w)


def save_quality_model(
    model_dir: str,
    name: str,
    w: list[int],
    metrics: DataFrame | None = None,
    version: str | None = None,
) -> str:
    """Persist distilled quality-classifier weights (operators/
    distill.py::fit_quality_classifier's final iteration, micro-units)
    as a ``kind: "quality_linear"`` artifact with a fingerprint pin."""
    from bigdatasmallprice_spark.streaming.langid_stream import model_fingerprint

    weights = [int(x) for x in w]
    return _write_artifact(
        model_dir,
        name,
        version,
        metrics,
        {
            "kind": "quality_linear",
            "weights": weights,
            "fingerprint": model_fingerprint({"_": weights}),
            "coefficients": [],
        },
    )


def load_quality_weights(path: str) -> list[int]:
    """Load + fingerprint-verify a quality_linear artifact."""
    from bigdatasmallprice_spark.streaming.langid_stream import model_fingerprint

    doc = load_model(path)
    if doc.get("kind") != "quality_linear":
        raise ValueError(f"{path} is not a quality_linear artifact")
    w = [int(x) for x in doc["weights"]]
    if model_fingerprint({"_": w}) != doc.get("fingerprint"):
        raise ValueError(
            f"{path}: weight fingerprint mismatch — refusing to score "
            "with tampered or corrupted weights"
        )
    return w


def quality_keep_latest(
    docs: DataFrame, model_dir: str, name: str
) -> DataFrame:
    """(doc_id, source, keep): filter verdict for every document from
    the NEWEST persisted quality model — the filter-at-scan-speed
    deployment path (one pure-integer codegen expression over the
    feature projection; nothing shuffles)."""
    from bigdatasmallprice_spark.operators.distill import (
        quality_features,
        score_keep_expr,
    )

    path = find_latest(model_dir, name)
    if path is None:
        raise FileNotFoundError(f"no artifact for model {name!r} in {model_dir}")
    w = load_quality_weights(path)
    feats = quality_features(docs, extra_cols=("doc_id",))
    return feats.select(
        "doc_id",
        "source",
        F.expr(score_keep_expr(w)).cast("boolean").alias("keep"),
    )


# ---------------------------------------------------------------------------
# word-embedding serving: train-once / embed-everywhere for the bridge
# ---------------------------------------------------------------------------
# The three bridge queries (doc_embedding_topk / doc_embedding_ivf_topk
# / text_semantic_dedup) are oracle-paired REFIT queries, so each runs
# the full word2vec trajectory inside the query. The deployment shape
# persists the trained token vectors once and pools any document frame
# from the artifact — the score_langid_latest pattern applied to the
# embedding model, sharing embed_stream's fingerprint pin so the
# artifact, the stream state and the live fit all verify against the
# SAME canonical serialization. Collecting here is vocabulary-sized
# (vocab x D rows); past driver-friendly vocabularies the parquet
# frozen-model dir of streaming/embed_stream.py is the artifact.


def save_word_vectors(
    model_dir: str,
    name: str,
    emb: DataFrame,
    version: str | None = None,
) -> str:
    """Persist trained token INPUT vectors (word_embedding_train's
    (word, dim, u_micro, ...) frame) as a ``kind: "word2vec"``
    artifact with a fingerprint pin."""
    from bigdatasmallprice_spark.streaming.embed_stream import (
        token_vector_fingerprint,
    )

    rows = sorted(
        (r.word, int(r.dim), int(r.u_micro))
        for r in emb.select("word", "dim", "u_micro").collect()
    )
    return _write_artifact(
        model_dir,
        name,
        version,
        None,
        {
            "kind": "word2vec",
            "coefficients": [list(t) for t in rows],
            "fingerprint": token_vector_fingerprint(rows),
        },
    )


def load_word_vectors(spark: SparkSession, path: str) -> DataFrame:
    """Load + fingerprint-verify a word2vec artifact into the
    (word, dim, u_micro) frame doc_embeddings consumes. Raises on kind
    mismatch or fingerprint divergence (a tampered/torn artifact must
    refuse to embed a corpus, not silently shift its vector space)."""
    from bigdatasmallprice_spark.streaming.embed_stream import (
        token_vector_fingerprint,
    )

    with open(path) as f:
        doc = json.load(f)
    if doc.get("kind") != "word2vec":
        raise ValueError(f"{path} is not a word2vec artifact")
    rows = [(w, int(d), int(u)) for w, d, u in doc["coefficients"]]
    if token_vector_fingerprint(rows) != doc.get("fingerprint"):
        raise ValueError(f"{path} fingerprint mismatch — refusing to embed")
    return spark.createDataFrame(
        rows, "word string, dim long, u_micro long"
    )


def embed_documents_latest(
    spark: SparkSession, docs: DataFrame, model_dir: str, name: str
) -> DataFrame:
    """(doc_id, xu): mean-pooled document vectors for any document
    frame from the NEWEST persisted word2vec model — the deployment
    half of the bridge (the pooling is the same doc_embeddings the
    refit queries and the stream twin run; only the model source
    differs)."""
    from bigdatasmallprice_spark.operators.word2vec import doc_embeddings

    path = find_latest(model_dir, name)
    if path is None:
        raise FileNotFoundError(f"no artifact for model {name!r} in {model_dir}")
    return doc_embeddings(docs, load_word_vectors(spark, path))


def bpe_merges_fingerprint(merges: list[tuple[str, str]]) -> str:
    """md5 of the rank-ordered merge serialization - order IS the
    model (BPE applies merges by rank), so the canonical form is the
    ranked list, not a sorted set."""
    canon = ";".join(f"{a} {b}" for a, b in merges)
    return hashlib.md5(canon.encode()).hexdigest()


def save_bpe_merges(
    model_dir: str,
    name: str,
    merges: list[tuple[str, str]],
    version: str | None = None,
) -> str:
    """Persist a ranked BPE merge list as a ``kind: "bpe"`` artifact
    with a fingerprint pin - the tokenizer-of-record (a production
    vocab.bpe): trained once (bpe_train_merges / trained_merges),
    consumed by every packing/accounting stage forever after. The
    list is the MODEL (vocabulary-sized); persisting it whole is the
    reference's joblib-dump analog."""
    return _write_artifact(
        model_dir,
        name,
        version,
        None,
        {
            "kind": "bpe",
            "merges": [[a, b] for a, b in merges],
            "fingerprint": bpe_merges_fingerprint(merges),
        },
    )


def load_bpe_merges(path: str) -> list[tuple[str, str]]:
    """Load + fingerprint-verify a BPE artifact into the apply-ready
    ranked merge list (bpe_segment / bpe_encode_tokens /
    bpe_symbols_sql all consume this shape). Raises on kind mismatch
    or fingerprint divergence - a tampered/torn tokenizer artifact
    must refuse, not silently re-segment the corpus differently."""
    with open(path) as f:
        doc = json.load(f)
    if doc.get("kind") != "bpe":
        raise ValueError(f"{path} is not a bpe artifact")
    merges = [(a, b) for a, b in doc["merges"]]
    if bpe_merges_fingerprint(merges) != doc.get("fingerprint"):
        raise ValueError(f"{path} fingerprint mismatch - refusing to tokenize")
    return merges


def latest_bpe_merges(model_dir: str, name: str) -> list[tuple[str, str]]:
    """The newest persisted merge list for ``name`` - the serve-side
    half (predict.py:40-57's newest-artifact rule for the tokenizer)."""
    path = find_latest(model_dir, name)
    if path is None:
        raise FileNotFoundError(f"no artifact for model {name!r} in {model_dir}")
    return load_bpe_merges(path)
