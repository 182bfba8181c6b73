"""Row-wise ML text classification at scale (SURVEY §2.11/U1).

The reference trains a tiny sklearn Pipeline (TfidfVectorizer →
LogisticRegression) on 10 labeled support-ticket examples, pulls the WHOLE
table to pandas on one worker, and applies ``pipeline.predict`` row by row
(dags/4_logistics_ticket_classifier_full_dag.py:32-78) — the one place in
the reference where data (not SQL) crosses a process boundary.

Spark-first rebuild: fit the model once on the driver (training data is 10
rows), broadcast the fitted model, and apply it with an Arrow-batched
``pandas_udf`` — each executor scores its own partitions vectorized, no
driver collect, linear scale-out. This is the canonical pattern for any
"apply a small fitted model to a huge table" stage.

The vectorizer+classifier here is a dependency-free NumPy implementation
(TF-IDF + nearest-centroid over cosine similarity); if scikit-learn is
available the same ``classify_tickets`` accepts any object with a
``predict(list[str]) -> list[str]`` method, so the sklearn pipeline drops
in unchanged.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

#: verbatim port of the reference's training set
#: (dags/4_logistics_ticket_classifier_full_dag.py:32-43).
TRAINING_DATA: list[tuple[str, str]] = [
    ("I want to cancel my order", "Order Cancellation"),
    ("The payment failed via UPI", "Payment Issue"),
    ("My product is delayed by 3 days", "Delivery Issue"),
    ("I need to return the item", "Return Request"),
    ("When does the sale start?", "General Inquiry"),
    ("Still waiting for delivery update", "Delivery Issue"),
    ("I paid but didn't get confirmation", "Payment Issue"),
    ("Want to exchange the item", "Return Request"),
    ("How to track my order?", "General Inquiry"),
    ("Please cancel immediately", "Order Cancellation"),
]

_TOKEN_RE = re.compile(r"[a-z0-9']+")


def _tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


class TfidfNearestCentroid:
    """Deterministic TF-IDF + cosine nearest-centroid classifier.

    Small (vocab of the training set only), picklable, and fast enough to
    score millions of rows per executor — the model object is what gets
    broadcast into the pandas_udf.
    """

    def __init__(self) -> None:
        self.idf: dict[str, float] = {}
        self.centroids: dict[str, dict[str, float]] = {}

    def fit(self, texts: list[str], labels: list[str]) -> "TfidfNearestCentroid":
        docs = [_tokenize(t) for t in texts]
        n = len(docs)
        df_counts: Counter[str] = Counter()
        for d in docs:
            df_counts.update(set(d))
        self.idf = {w: math.log((1 + n) / (1 + c)) + 1.0 for w, c in df_counts.items()}
        sums: dict[str, Counter[str]] = {}
        for d, y in zip(docs, labels):
            vec = self._tfidf(d)
            sums.setdefault(y, Counter()).update(vec)
        self.centroids = {
            y: self._unit(dict(v)) for y, v in sorted(sums.items())
        }
        return self

    def _tfidf(self, tokens: list[str]) -> dict[str, float]:
        tf = Counter(t for t in tokens if t in self.idf)
        vec = {w: c * self.idf[w] for w, c in tf.items()}
        return self._unit(vec)

    @staticmethod
    def _unit(vec: dict[str, float]) -> dict[str, float]:
        norm = math.sqrt(sum(v * v for v in vec.values())) or 1.0
        return {w: v / norm for w, v in vec.items()}

    def predict(self, texts: list[str]) -> list[str]:
        out = []
        for t in texts:
            vec = self._tfidf(_tokenize(t or ""))
            best_label, best_score = "Unknown", -1.0
            for label, cen in self.centroids.items():  # sorted at fit → ties deterministic
                score = sum(v * cen.get(w, 0.0) for w, v in vec.items())
                if score > best_score:
                    best_label, best_score = label, score
            out.append(best_label)
        return out


def default_model() -> TfidfNearestCentroid:
    texts, labels = zip(*TRAINING_DATA)
    return TfidfNearestCentroid().fit(list(texts), list(labels))


def classify_tickets(
    df: DataFrame,
    text_col: str = "MESSAGE_TEXT",
    output_col: str = "TICKET_CATEGORY",
    model: TfidfNearestCentroid | None = None,
) -> DataFrame:
    """Distributed replacement of the reference's to_pandas + .apply loop:
    broadcast the fitted model state, score with an Arrow-batched
    pandas_udf. NULL/empty text → 'Unknown' (reference :68).

    The broadcast payload is plain dicts and the scoring code lives in the
    UDF closure (serialized by value), so executors never need this
    package importable — the UDF is self-contained on any cluster."""
    spark = df.sparkSession
    fitted = model if model is not None else default_model()
    bc = spark.sparkContext.broadcast((fitted.idf, fitted.centroids))
    token_re = _TOKEN_RE.pattern

    @F.pandas_udf(StringType())
    def _classify(texts: pd.Series) -> pd.Series:
        import math as _math
        import re as _re
        from collections import Counter as _Counter

        idf, centroids = bc.value
        tok = _re.compile(token_re)

        def predict_one(text: str) -> str:
            tf = _Counter(t for t in tok.findall(text.lower()) if t in idf)
            vec = {w: c * idf[w] for w, c in tf.items()}
            norm = _math.sqrt(sum(v * v for v in vec.values())) or 1.0
            best_label, best_score = "Unknown", -1.0
            for label, cen in centroids.items():
                score = sum((v / norm) * cen.get(w, 0.0) for w, v in vec.items())
                if score > best_score:
                    best_label, best_score = label, score
            return best_label

        mask = texts.notna() & (texts.str.len() > 0)
        out = pd.Series(["Unknown"] * len(texts), index=texts.index)
        out.loc[mask] = texts[mask].map(predict_one)
        return out

    return df.withColumn(output_col, _classify(F.col(text_col)))
