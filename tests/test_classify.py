"""Trained quality classifier: determinism, separation on a planted
corpus, JVM-only scoring plan, and float-level cross-engine parity of
the distilled score formula (Spark expression vs DuckDB re-scoring
with the published weights)."""

import pytest

from pyspark.sql import functions as F


def _planted_corpus(spark, n=400):
    """Deterministic two-mode corpus: even ids are English-like prose
    (stopwords, lowercase, light punctuation), odd ids are junk
    (digit/caps-heavy, no stopwords). Label = 1 for prose."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            words = []
            for j in range(30 + i % 17):
                # every 3rd word is doc-unique so prose docs are NOT
                # near-duplicates of each other (pairwise Jaccard well
                # under curate()'s 0.85 default — the corpus must
                # exercise the quality gate, not collapse at dedup)
                if j % 3 == 2:
                    words.append(f"tale{i}part{j}")
                else:
                    words.append(
                        ["the", "cat", "sat", "and", "dog", "ran", "to",
                         "house", "it", "was", "warm", "in", "sun"][(i + j) % 13]
                    )
            text = " ".join(words) + "."
            rows.append((i, text, 1))
        else:
            frags = []
            for j in range(10 + i % 7):
                frags.append(f"X{(i * 7 + j) % 100}#A{j}B!!")
            rows.append((i, " ".join(frags), 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


class TestQualityClassifier:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return _planted_corpus(spark)

    @pytest.fixture(scope="class")
    def model(self, corpus):
        from inxs_spark.operators.classify import train_quality_classifier

        return train_quality_classifier(corpus, "label", max_sample=200)

    def test_training_is_deterministic(self, corpus, model):
        from inxs_spark.operators.classify import train_quality_classifier

        again = train_quality_classifier(corpus, "label", max_sample=200)
        assert again == model

    def test_separates_planted_modes_held_out(self, corpus, model):
        """Trained on a 200-doc hash-ordered sample, the model must
        classify the FULL 400-doc corpus (so >=200 unseen docs) at
        >=95% accuracy, and the stopword-ratio weight must be the
        dominant positive signal (prose has stopwords, junk has
        none)."""
        from inxs_spark.operators.classify import (
            FEATURE_NAMES,
            quality_classifier_scores,
        )

        scored = quality_classifier_scores(corpus, model).join(
            corpus.select("doc_id", "label"), "doc_id"
        )
        agree = scored.filter(
            ((F.col("quality_prob") >= 0.5) & (F.col("label") == 1))
            | ((F.col("quality_prob") < 0.5) & (F.col("label") == 0))
        ).count()
        assert agree >= 0.95 * corpus.count(), agree
        w = dict(zip(FEATURE_NAMES, model.weights))
        assert w["stop_ratio"] > 0

    def test_single_class_sample_rejected(self, corpus):
        from inxs_spark.operators.classify import train_quality_classifier

        with pytest.raises(ValueError):
            train_quality_classifier(
                corpus.filter(F.col("label") == 1), "label", max_sample=50
            )

    def test_scoring_is_jvm_side(self, corpus, model):
        from inxs_spark.operators.classify import quality_classifier_scores

        plan = quality_classifier_scores(corpus, model)._jdf \
            .queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Arrow" not in plan, plan

    def test_cross_engine_score_parity(self, corpus, model):
        """DuckDB re-scores the corpus from the distilled SQL formula
        (same weights, same feature math, same term order); every
        document's probability matches Spark to < 1e-9 — the same
        shared-formula discipline as the url/doc-signal oracles."""
        import duckdb

        from inxs_spark.operators.classify import quality_classifier_scores

        pdf = corpus.select("doc_id", "text").toPandas()
        con = duckdb.connect()
        con.register("docs", pdf)
        duck = dict(con.execute(
            f"SELECT doc_id, {model.score_sql_duckdb('text')} FROM docs"
        ).fetchall())
        got = {
            r.doc_id: r.quality_prob
            for r in quality_classifier_scores(corpus, model).collect()
        }
        assert set(duck) == set(got)
        worst = max(abs(duck[i] - got[i]) for i in duck)
        assert worst < 1e-9, worst

    def test_json_roundtrip_and_feature_pinning(self, model):
        from inxs_spark.operators.classify import QualityClassifier

        clone = QualityClassifier.from_json(model.to_json())
        assert clone == model
        blob = model.to_json().replace("stop_ratio", "bogus_feature")
        with pytest.raises(ValueError):
            QualityClassifier.from_json(blob)

    def test_sample_is_position_independent(self, spark, corpus):
        """Reordering the corpus must not change the trained model
        (hash-ordered sampling, not a partition prefix)."""
        from inxs_spark.operators.classify import train_quality_classifier

        shuffled = corpus.orderBy(F.desc("doc_id")).repartition(7)
        a = train_quality_classifier(corpus, "label", max_sample=200)
        b = train_quality_classifier(shuffled, "label", max_sample=200)
        assert a == b

    def test_curate_with_trained_model_gate(self, spark, corpus, model):
        """curate(quality_model=...) swaps the heuristic gate for the
        trained probability: junk documents (label 0) are filtered at
        the quality stage, prose survives, and the stage attrition is
        recorded. The gate must stay a pure column expression."""
        from inxs_spark.jobs.curate import curate

        small = corpus.filter(F.col("doc_id") < 80).select("doc_id", "text")
        curated, stats = curate(
            small, min_quality=0.5, quality_model=model, normalize=False
        )
        kept = {r.doc_id for r in curated.select("doc_id").collect()}
        spark.catalog.clearCache()
        assert stats["input"] == 80
        # every survivor is prose (even id); every prose doc survives
        # (the planted modes are linearly separable at 0.5)
        assert kept == {i for i in range(80) if i % 2 == 0}, kept
        assert stats["after_quality_lang_gate"] == 40
