"""§2.13 optional ML pipeline: runs end-to-end, produces predictions
for every test row, class weighting balances inverse to frequency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_engineering_project_spark.ml import (
    build_training_frame,
    train_event_type_classifier,
    with_class_weights,
)
from big_data_engineering_project_spark.sources.catalog import load_table


def test_class_weights_inverse_frequency(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    weighted = with_class_weights(build_training_frame(ev))
    rows = (
        weighted.groupBy("label_str")
        .agg(F.count(F.lit(1)).alias("n"), F.first("weight").alias("w"))
        .collect()
    )
    # weight * n is the same constant for every class (total/n_classes).
    products = [r["n"] * r["w"] for r in rows]
    assert max(products) - min(products) < 1e-6


def test_pipeline_trains_and_scores(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    model, acc = train_event_type_classifier(ev)
    assert 0.0 <= acc <= 1.0
    preds = model.transform(with_class_weights(build_training_frame(ev)))
    assert preds.filter(F.col("prediction").isNull()).count() == 0
    # 5 event types → predictions land in [0, 5)
    assert preds.agg(F.max("prediction")).first()[0] <= 4.0
