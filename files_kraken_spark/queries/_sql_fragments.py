"""Canonical DuckDB SQL fragments shared across oracle strings.

These mirror ``functions/text.py`` / ``functions/vectors.py`` exactly;
the oracle-determinism contract depends on every module using THE SAME
fragment, so they live once here — a fix applied to a private copy
would silently diverge the other modules' oracles.
"""

from __future__ import annotations

from ..functions import text as T

#: whitespace tokenization, empties dropped — mirrors text.tokens
SQL_TOKENS = (
    "list_filter(regexp_split_to_array(trim({col}), '\\s+'), x -> x <> '')"
)

#: cosine similarity over float lists, double-cast per element in
#: fixed order — mirrors functions/vectors.cosine evaluation order
SQL_COS = (
    "(list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))"
)

#: per-row L2 normalization — mirrors functions/vectors.unit: the
#: squared-norm sum is sequential in index order, and each element is
#: MULTIPLIED by the reciprocal 1/sqrt(n2) (not divided by sqrt(n2) —
#: Spark's unit() uses array_repeat of the reciprocal to keep the row
#: cost O(d), and x*(1/s) differs from x/s in the last bit), so the
#: unit vectors match Spark's bit-for-bit. Pair-join oracles compute
#: this once per row in a CTE and compare SQL_DOT of the unit columns
#: (never SQL_COS per pair). Mirrors unit()'s degenerate-input guard
#: too (round-5 advice): a zero-norm vector OR one containing a NULL
#: element maps to an all-zero vector — Spark's fold propagates NULL
#: into n2 and `n2 > 0` fails, while DuckDB's list_sum SKIPS NULLs, so
#: the NULL-element case needs the explicit list_filter check; without
#: the norm check a zero vector yields 1/sqrt(0) -> inf/NaN, and NaN
#: compares greater than any threshold in DuckDB.
SQL_UNIT = (
    "(CASE WHEN list_sum(list_transform({a}, "
    "y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) > 0 "
    "AND len(list_filter({a}, y -> y IS NULL)) = 0 "
    "THEN list_transform({a}, x -> CAST(x AS DOUBLE) * (1.0 / "
    "sqrt(list_sum(list_transform({a}, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))) "
    "ELSE list_transform({a}, x -> 0.0) END)"
)

#: plain dot product of two double lists in index order — mirrors
#: functions/vectors.dot over pre-normalized (unit) columns
SQL_DOT = "list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"

#: English stopword alternation — mirrors text.EN_STOPWORDS
SQL_STOPWORD_PAT = r"\b(?:" + "|".join(T.EN_STOPWORDS) + r")\b"
