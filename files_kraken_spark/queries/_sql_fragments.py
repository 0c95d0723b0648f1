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

#: English stopword alternation — mirrors text.EN_STOPWORDS
SQL_STOPWORD_PAT = r"\b(?:" + "|".join(T.EN_STOPWORDS) + r")\b"
