"""Query registry: one place where Spark implementation + DuckDB oracle SQL
are declared together so they cannot drift apart.

Engine-wide determinism policy (why every query here hash-matches DuckDB):

1. Money/metric sums go through DECIMAL (exact, order-independent) and are
   cast to DOUBLE only at the end — results cannot depend on Spark's
   partitioning or AQE's runtime re-planning.
2. All ratio math happens in DOUBLE on both engines (oracle SQL casts
   explicitly) so IEEE-754 gives bit-identical results.
3. Window/top-k queries always carry a unique tiebreaker in the ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver runs rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 operator ids


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco
