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


class TfidfLogisticRegression:
    """TF-IDF → multinomial logistic regression — the reference's exact
    model CLASS (sklearn `TfidfVectorizer → LogisticRegression`,
    dags/4_logistics_ticket_classifier_full_dag.py:32-52) rebuilt on
    NumPy since sklearn is absent here.

    Fidelity choices mirror sklearn defaults: token_pattern
    ``\\b\\w\\w+\\b`` (2+ word chars), smooth idf ``ln((1+n)/(1+df))+1``,
    raw tf, L2 row normalization; softmax cross-entropy with L2 penalty
    ``1/(2C)·‖W‖²`` (C=1.0). Training is full-batch gradient descent from
    zero init with a fixed step/iteration budget — deterministic, no RNG,
    so the fitted weights (and the golden-test predictions) are
    bit-reproducible across runs and machines. On 10 training rows the
    optimum is reached to well past prediction precision."""

    def __init__(self, C: float = 1.0, lr: float = 1.0, n_iter: int = 500):
        self.C, self.lr, self.n_iter = C, lr, n_iter
        self.vocab: dict[str, int] = {}
        self.idf: list[float] = []
        self.classes: list[str] = []
        self.W: list[list[float]] = []  # (K, V)
        self.b: list[float] = []

    _SK_TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")

    def _featurize(self, texts: list[str]):
        import numpy as np

        X = np.zeros((len(texts), len(self.vocab)))
        for r, t in enumerate(texts):
            for tok in self._SK_TOKEN_RE.findall((t or "").lower()):
                j = self.vocab.get(tok)
                if j is not None:
                    X[r, j] += 1.0
        X *= np.asarray(self.idf)
        norms = np.sqrt((X * X).sum(axis=1, keepdims=True))
        norms[norms == 0.0] = 1.0
        return X / norms

    def fit(self, texts: list[str], labels: list[str]) -> "TfidfLogisticRegression":
        import numpy as np

        docs = [self._SK_TOKEN_RE.findall(t.lower()) for t in texts]
        vocab = sorted({tok for d in docs for tok in d})
        self.vocab = {w: j for j, w in enumerate(vocab)}
        n = len(docs)
        df_counts = Counter(w for d in docs for w in set(d))
        self.idf = [
            math.log((1 + n) / (1 + df_counts[w])) + 1.0 for w in vocab
        ]
        self.classes = sorted(set(labels))
        y = np.array([self.classes.index(label) for label in labels])
        X = self._featurize(texts)
        K, V = len(self.classes), len(vocab)
        W = np.zeros((K, V))
        b = np.zeros(K)
        Y = np.eye(K)[y]
        for _ in range(self.n_iter):
            Z = X @ W.T + b
            Z -= Z.max(axis=1, keepdims=True)
            P = np.exp(Z)
            P /= P.sum(axis=1, keepdims=True)
            G = P - Y
            W -= self.lr * ((G.T @ X) / n + W / (self.C * n))
            b -= self.lr * G.mean(axis=0)
        self.W, self.b = W.tolist(), b.tolist()
        return self

    def predict(self, texts: list[str]) -> list[str]:
        import numpy as np

        X = self._featurize(texts)
        Z = X @ np.asarray(self.W).T + np.asarray(self.b)
        # argmax takes the FIRST maximum; classes are sorted at fit, so
        # ties break to the alphabetically-first label (sklearn's rule)
        return [self.classes[int(i)] for i in Z.argmax(axis=1)]


def default_model() -> TfidfLogisticRegression:
    """The reference's fitted pipeline: TF-IDF → logistic regression on
    the verbatim 10-example training set. Golden-tested to reproduce the
    training labels exactly (tests/test_shipments_tickets.py)."""
    texts, labels = zip(*TRAINING_DATA)
    return TfidfLogisticRegression().fit(list(texts), list(labels))


def centroid_model() -> TfidfNearestCentroid:
    """Dependency-free fallback classifier (round-1 model), kept for
    environments without NumPy and as a differential baseline."""
    texts, labels = zip(*TRAINING_DATA)
    return TfidfNearestCentroid().fit(list(texts), list(labels))


def classify_tickets(
    df: DataFrame,
    text_col: str = "MESSAGE_TEXT",
    output_col: str = "TICKET_CATEGORY",
    model: TfidfLogisticRegression | TfidfNearestCentroid | None = None,
) -> DataFrame:
    """Distributed replacement of the reference's to_pandas + .apply loop:
    broadcast the fitted model state, score with an Arrow-batched
    pandas_udf. NULL/empty text → 'Unknown' (reference :68).

    The broadcast payload is plain dicts/lists and the scoring code lives
    in the UDF closure (serialized by value), so executors never need this
    package importable — the UDF is self-contained on any cluster. The
    logistic-regression path scores each Arrow batch as ONE numpy matmul
    (sparse bag-of-words × dense Wᵀ), not a per-row Python loop."""
    spark = df.sparkSession
    fitted = model if model is not None else default_model()

    if isinstance(fitted, TfidfLogisticRegression):
        bc = spark.sparkContext.broadcast(
            (fitted.vocab, fitted.idf, fitted.classes, fitted.W, fitted.b)
        )
        token_re = TfidfLogisticRegression._SK_TOKEN_RE.pattern

        @F.pandas_udf(StringType())
        def _classify(texts: pd.Series) -> pd.Series:
            import re as _re

            import numpy as _np

            vocab, idf, classes, W, b = bc.value
            tok = _re.compile(token_re)
            Wt = _np.asarray(W).T
            bv = _np.asarray(b)
            idf_a = _np.asarray(idf)

            vals = texts.fillna("").tolist()
            X = _np.zeros((len(vals), len(vocab)))
            for r, t in enumerate(vals):
                for w in tok.findall(t.lower()):
                    j = vocab.get(w)
                    if j is not None:
                        X[r, j] += 1.0
            X *= idf_a
            norms = _np.sqrt((X * X).sum(axis=1, keepdims=True))
            norms[norms == 0.0] = 1.0
            Z = (X / norms) @ Wt + bv
            pred = [classes[int(i)] for i in Z.argmax(axis=1)]
            mask = texts.notna() & (texts.str.len() > 0)
            out = pd.Series(["Unknown"] * len(texts), index=texts.index)
            out.loc[mask] = pd.Series(pred, index=texts.index)[mask]
            return out

        return df.withColumn(output_col, _classify(F.col(text_col)))

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
