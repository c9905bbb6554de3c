"""Optional ML surface (SURVEY.md §2.13 — PPTX slides 13-16 only; no
code survives in the reference).

Reference pipeline: label-encode Flair, features (num_comments,
upvotes, post_hour, post_day, post_month, title_length), SMOTE
rebalancing, SGD classifier, 0.75 validation accuracy.

Spark-first: `pyspark.ml` Pipeline — StringIndexer + VectorAssembler +
LogisticRegression. SMOTE has no Spark builtin (SURVEY.md: "nearest
idiomatic: class weighting"), so we weight classes inversely to their
frequency via a broadcast-joined weight column — same rebalancing
intent, fully distributed, no synthetic-sample generation.

Everything runs on executors; model fit is the only iterative stage
(L-BFGS over cached features — Spark's design center for this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_training_frame(events: DataFrame) -> DataFrame:
    """Feature engineering analog of PPTX slide 14 on the events
    fixture: time parts + value + JSON k; label = event_type."""
    k = F.from_json("props", "k INT").getField("k")
    return events.select(
        F.col("event_type").alias("label_str"),
        F.hour("ts").cast("double").alias("hour"),
        F.dayofmonth("ts").cast("double").alias("day"),
        F.month("ts").cast("double").alias("month"),
        F.col("value"),
        F.coalesce(k, F.lit(0)).cast("double").alias("k"),
    )


def with_class_weights(df: DataFrame, label_col: str = "label_str") -> DataFrame:
    """Inverse-frequency class weights (the idiomatic distributed
    stand-in for SMOTE, slide 13): weight = total / (n_classes · n_c),
    broadcast-joined back (the stats side is |classes| rows)."""
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n_c"))
    total = df.count()
    n_classes = counts.count()
    weights = counts.withColumn(
        "weight", F.lit(float(total)) / (F.lit(float(n_classes)) * F.col("n_c"))
    ).drop("n_c")
    return df.join(F.broadcast(weights), label_col)


def kmeans_assignments(
    emb: DataFrame,
    k: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Semantic clustering over an embedding column — the backbone of
    cluster-based dedup / topic balancing in training pipelines
    (e.g. SemDeDup-style pruning works inside such clusters).

    `pyspark.ml.clustering.KMeans` with a fixed seed: the fit is
    iterative Lloyd's over a cached feature frame (Spark's design
    center for iterative ML), assignment is a single broadcast of k
    centroids + one narrow projection. Returns (id, cluster).

    Deterministic for a fixed (data, k, seed) triple, but the cluster
    LABELS are an artifact of init order — consumers must treat them
    as opaque ids (tests assert partition structure, not label values).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(
        F.col(id_col), array_to_vector(F.col(emb_col)).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=20).fit(feats)
    return model.transform(feats).select(
        F.col(id_col), F.col("prediction").alias("cluster")
    )


def kmeans_centers(
    emb: DataFrame,
    k: int = 8,
    seed: int = 7,
    emb_col: str = "embedding",
) -> list[list[float]]:
    """Fitted KMeans cluster centers as plain vectors — the coarse
    quantizer a production IVF index trains offline (the centers are
    k small vectors: driver-side by nature, broadcast into the search
    plan as literals)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(array_to_vector(F.col(emb_col)).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=20).fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def train_event_type_classifier(events: DataFrame, seed: int = 42):
    """Fit the §2.13 pipeline; returns (model, accuracy on a held-out
    30% split). Import of pyspark.ml is local so the core engine has
    no hard dependency on the ML package."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.feature import StringIndexer, VectorAssembler

    frame = with_class_weights(build_training_frame(events))
    train, test = frame.randomSplit([0.7, 0.3], seed=seed)
    pipeline = Pipeline(
        stages=[
            StringIndexer(inputCol="label_str", outputCol="label"),
            VectorAssembler(
                inputCols=["hour", "day", "month", "value", "k"],
                outputCol="features",
            ),
            LogisticRegression(
                maxIter=30, weightCol="weight", family="multinomial"
            ),
        ]
    )
    model = pipeline.fit(train)
    preds = model.transform(test)
    acc = MulticlassClassificationEvaluator(
        metricName="accuracy", labelCol="label", predictionCol="prediction"
    ).evaluate(preds)
    return model, acc
