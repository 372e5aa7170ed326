"""Trained document-quality classifier — the CCNet / fastText-style
pattern (Wenzek et al. 2020, "CCNet: Extracting high quality
monolingual datasets from web crawl data"; Joulin et al. 2017 — both
public papers): learn a tiny linear model on a BOUNDED labeled sample,
then distill it into a pure JVM-side column expression so scoring the
full corpus is whole-stage-codegen — zero Python, zero shuffle, one
scan.

Why this shape at 100 TB: the expensive part of quality filtering is
never the model (6 weights), it is touching every document. Training
is O(max_sample) on the driver (same bounded-sample discipline as
``ivf_train_centroids`` / ``pq_train_codebooks``); applying is a
``withColumn`` — the score rides along whatever scan the pipeline
already does, exactly like ``quality_score_expr``.

Every feature is defined ONCE as a pair of SQL templates (Spark SQL /
DuckDB SQL) over the same math — integer counts, fixed ``1 + n``
denominators, shared regex character classes — so a DuckDB oracle can
re-score the corpus with the published weights and match the Spark
side to float precision (tests/test_classify.py asserts < 1e-9).

upstream parity note: the reference library (funkyfuture/inxs) has no
classifier surface; this operator exists for the training-data-
pipeline brief (SURVEY §2 extras), not for reference parity.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from pyspark.sql import Column, DataFrame, functions as F

from .text import STOPWORDS

_STOP_IN = ",".join(f"'{w}'" for w in STOPWORDS["en"])

# (name, spark_sql_template, duckdb_sql_template) — {t} is the text
# column. Both engines compute IDENTICAL double arithmetic: counts are
# exact integers, denominators are 1 + count (never zero), and the
# regex classes below behave the same under Java regex and RE2.
# DuckDB's regexp_replace needs the explicit 'g' flag to replace all
# occurrences (Spark's always does).
FEATURES: tuple = (
    (
        "log_words",
        "ln(1 + size(split({t}, ' ')))",
        "ln(1 + len(string_split({t}, ' ')))",
    ),
    (
        "mean_word_len",
        "length({t}) / (1.0 + size(split({t}, ' ')))",
        "length({t}) / (1.0 + len(string_split({t}, ' ')))",
    ),
    (
        "stop_ratio",
        f"size(filter(split({{t}}, ' '), x -> x in ({_STOP_IN})))"
        " / (1.0 + size(split({t}, ' ')))",
        f"len(list_filter(string_split({{t}}, ' '), x -> x in ({_STOP_IN})))"
        " / (1.0 + len(string_split({t}, ' ')))",
    ),
    (
        "punct_ratio",
        r"length(regexp_replace({t}, '[a-zA-Z0-9 ]', ''))"
        " / (1.0 + length({t}))",
        r"length(regexp_replace({t}, '[a-zA-Z0-9 ]', '', 'g'))"
        " / (1.0 + length({t}))",
    ),
    (
        "digit_ratio",
        r"(length({t}) - length(regexp_replace({t}, '[0-9]', '')))"
        " / (1.0 + length({t}))",
        r"(length({t}) - length(regexp_replace({t}, '[0-9]', '', 'g')))"
        " / (1.0 + length({t}))",
    ),
    (
        "upper_ratio",
        r"(length({t}) - length(regexp_replace({t}, '[A-Z]', '')))"
        " / (1.0 + length({t}))",
        r"(length({t}) - length(regexp_replace({t}, '[A-Z]', '', 'g')))"
        " / (1.0 + length({t}))",
    ),
)

FEATURE_NAMES = tuple(name for name, _, _ in FEATURES)


def feature_exprs(text_col: str = "text") -> list[Column]:
    """The feature vector as Spark Column expressions (JVM-side)."""
    return [
        F.expr(spark_t.format(t=text_col)).cast("double").alias(name)
        for name, spark_t, _ in FEATURES
    ]


def feature_sql_duckdb(text_col: str = "text") -> list[str]:
    """The SAME features as DuckDB SQL fragments (oracle side)."""
    return [duck_t.format(t=text_col) for _, _, duck_t in FEATURES]


def _fmt(x: float) -> str:
    """repr round-trips doubles exactly — the weights embedded in the
    SQL string are bit-identical to the Python floats."""
    return repr(float(x))


@dataclass(frozen=True)
class QualityClassifier:
    """A trained linear quality model: standardization constants from
    the training sample plus logistic-regression weights. Frozen and
    JSON-serializable — train once, version the JSON next to the
    ruleset hash, score any corpus reproducibly."""

    mu: tuple
    sigma: tuple
    weights: tuple
    bias: float
    n_train: int

    def z_terms(self) -> list[tuple[str, float, float, float]]:
        return [
            (name, self.weights[i], self.mu[i], self.sigma[i])
            for i, name in enumerate(FEATURE_NAMES)
        ]

    def score_expr(self, text_col: str = "text") -> Column:
        """P(good) as a single JVM expression:
        sigmoid(b + sum_i w_i * (f_i - mu_i) / sd_i). Terms are summed
        in feature order — the DuckDB oracle builds the identical
        chain, so cross-engine drift is bounded by exp()'s last-ulp."""
        z: Column = F.lit(float(self.bias))
        for expr, (_, w, mu, sd) in zip(
            feature_exprs(text_col), self.z_terms()
        ):
            z = z + F.lit(float(w)) * ((expr - F.lit(float(mu))) / F.lit(float(sd)))
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    def score_sql_duckdb(self, text_col: str = "text") -> str:
        """The SAME score as one DuckDB SQL expression (oracle side)."""
        frags = feature_sql_duckdb(text_col)
        terms = [
            f"{_fmt(w)} * ((({frag}) - {_fmt(mu)}) / {_fmt(sd)})"
            for frag, (_, w, mu, sd) in zip(frags, self.z_terms())
        ]
        z = " + ".join([_fmt(self.bias)] + terms)
        return f"1.0 / (1.0 + exp(-({z})))"

    def to_json(self) -> str:
        return json.dumps({
            "features": list(FEATURE_NAMES),
            "mu": list(self.mu),
            "sigma": list(self.sigma),
            "weights": list(self.weights),
            "bias": self.bias,
            "n_train": self.n_train,
        })

    @classmethod
    def from_json(cls, blob: str) -> "QualityClassifier":
        d = json.loads(blob)
        if tuple(d["features"]) != FEATURE_NAMES:
            raise ValueError(
                f"model features {d['features']} != library {FEATURE_NAMES}"
            )
        return cls(
            mu=tuple(d["mu"]), sigma=tuple(d["sigma"]),
            weights=tuple(d["weights"]), bias=float(d["bias"]),
            n_train=int(d["n_train"]),
        )


def collect_training_sample(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    max_sample: int = 4096,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Bounded deterministic labeled sample, features computed IN
    SPARK (the exact expressions scoring will use — no train/serve
    skew). Hash-ordered global top-k on xxhash64 of the text:
    position-independent, never a corpus prefix (the ivf_train
    discipline). One scan, map-side heaps."""
    rows = (
        df.select(
            *feature_exprs(text_col),
            F.col(label_col).cast("double").alias("__y"),
            F.xxhash64(F.col(text_col), F.lit(seed)).alias("__h"),
        )
        .filter(F.col("__y").isNotNull())
        .orderBy("__h")
        .limit(max_sample)
        .drop("__h")
        .collect()
    )
    X = np.asarray([[r[i] for i in range(len(FEATURES))] for r in rows],
                   dtype=np.float64)
    y = np.asarray([r["__y"] for r in rows], dtype=np.float64)
    return X, y


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    max_sample: int = 4096,
    iters: int = 300,
    lr: float = 0.5,
    l2: float = 1e-3,
    seed: int = 42,
) -> QualityClassifier:
    """Full-batch logistic regression on the bounded sample —
    deterministic by construction (zeros init, fixed iteration count,
    no RNG anywhere), so retraining on the same corpus yields the
    same bits. O(max_sample * iters) driver work; the corpus is
    touched exactly once, for the sample scan."""
    X, y = collect_training_sample(df, label_col, text_col, max_sample, seed)
    if len(X) == 0:
        raise ValueError("no labeled rows to train on")
    if len(set(y.tolist())) < 2:
        raise ValueError("training sample has a single class")
    mu = X.mean(axis=0)
    sd = np.maximum(X.std(axis=0), 1e-12)
    Xs = (X - mu) / sd
    w = np.zeros(Xs.shape[1])
    b = 0.0
    n = len(Xs)
    for _ in range(iters):
        z = Xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (Xs.T @ g / n + l2 * w)
        b -= lr * float(g.mean())
    return QualityClassifier(
        mu=tuple(float(v) for v in mu),
        sigma=tuple(float(v) for v in sd),
        weights=tuple(float(v) for v in w),
        bias=float(b),
        n_train=n,
    )


def quality_classifier_scores(
    df: DataFrame,
    model: QualityClassifier,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document: ``(id, quality_prob)``. Pure column
    expression — composes with any pipeline stage for free."""
    return df.select(
        F.col(id_col),
        model.score_expr(text_col).alias("quality_prob"),
    )
