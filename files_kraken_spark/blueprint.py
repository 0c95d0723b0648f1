"""Blueprint: the engine's declarative schema system (reference parity:
§1.3, ``blueprint/_blueprint.py:10-78`` + ``fields/_fields.py``).

A blueprint declares how file names map to typed entity records:

- ``required``: field → regex spec; ALL must match a file name for the
  file to contribute to this blueprint (A2); their values joined by
  ``'__'`` in declaration order form the entity id (A3).
- ``optional``: field → spec, list of fallback specs (F7), or a
  ``Template`` whose pattern interpolates required-field values —
  the correlated per-entity pattern (F8).
- Field types (the reference's five, ``README.md:156-167``):
  STR — scalar identifier, set-if-unset, conflict → quarantine;
  PATH — the matched file's own path as the value;
  LIST_STR / LIST_PATH — growing dedup'd collections;
  PARSER — computed by a user parser, either from matched file
  content (``pattern=``) or from other fields once all are set
  (``dependent_fields=``), a topologically-ordered derived column (A9/A10).

Unlike the reference there is no dataclass inheritance or
``__post_init__`` contract — a Blueprint is plain declarative data the
planner compiles into Catalyst column expressions.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field as dc_field
from enum import Enum

from pyspark.sql import Column
from pyspark.sql import functions as F

from .functions import retools as rt


class FieldType(Enum):
    STR = "str"
    PATH = "path"
    LIST_STR = "list_str"
    LIST_PATH = "list_path"
    PARSER = "parser"

    @property
    def is_list(self) -> bool:
        return self in (FieldType.LIST_STR, FieldType.LIST_PATH)

    @property
    def takes_path_value(self) -> bool:
        return self in (FieldType.PATH, FieldType.LIST_PATH)


@dataclass(frozen=True)
class Template:
    """F8 — correlated pattern: ``"{run}.sample_{sample}.results.txt"``
    interpolates required-field *columns* at match time. Like the
    reference, interpolated values are not regex-escaped.

    The built pattern is ANCHORED (``\\A(?:…)\\z``): the reference
    matches interpolated template patterns as SchemeMatcher string
    specs, i.e. ``re.fullmatch`` (``retools/_retools.py:135``,
    ``examples/easy_example.py:61-67``) — substring semantics would
    wrongly capture names like ``old_<id>_results.txt.bak``."""

    fmt: str

    def to_column(self, cols: dict[str, Column]) -> Column:
        import re as _re

        parts: list = [r"\A(?:"]
        pos = 0
        for m in _re.finditer(r"\{(\w+)\}", self.fmt):
            if m.start() > pos:
                parts.append(self.fmt[pos : m.start()])
            parts.append(cols[m.group(1)])
            pos = m.end()
        if pos < len(self.fmt):
            parts.append(self.fmt[pos:])
        parts.append(r")\z")
        return rt.correlated_pattern(*parts)


@dataclass(frozen=True)
class ParserSpec:
    """A10 (pattern) XOR A9 (dependent_fields) — mirrors ParserField
    (``fields/_fields.py:19-43``). ``fn`` is the user parser; it runs
    as an Arrow-batched pandas UDF with ``returns`` as its Spark type.

    ``content_mode``: the parser receives the matched file's BYTES
    (binaryFile-source join — the 100 TB path, SURVEY §7.4) instead of
    its path; pair with content parsers like
    ``parsers.parse_float_content``."""

    returns: str = "string"
    pattern: str | None = None
    dependent_fields: tuple[str, ...] = ()
    fn: Callable | None = None
    content_mode: bool = False

    def __post_init__(self):
        if bool(self.pattern) == bool(self.dependent_fields):
            raise ValueError(
                "ParserSpec needs exactly one of pattern / dependent_fields "
                "(reference fields/_fields.py:27-34)"
            )


@dataclass(frozen=True)
class Blueprint:
    name: str
    required: dict[str, object]  # field -> spec (str | (pat, grp) | list of those)
    optional: dict[str, object] = dc_field(default_factory=dict)
    types: dict[str, FieldType] = dc_field(default_factory=dict)
    parsers: dict[str, ParserSpec] = dc_field(default_factory=dict)

    def field_type(self, f: str) -> FieldType:
        if f in self.parsers:
            return FieldType.PARSER
        return self.types.get(f, FieldType.STR)

    @property
    def all_fields(self) -> list[str]:
        return list(self.required) + [f for f in self.optional if f not in self.required] + [
            f for f in self.parsers if f not in self.optional and f not in self.required
        ]

    # ---------------------------------------------------------- matching

    def required_columns(self, name_col: Column) -> dict[str, Column]:
        """F7 over the required scheme; all non-null = the file belongs."""
        return rt.scheme_match(name_col, self.required)

    def required_gate(self, cols: dict[str, Column]) -> Column:
        """A2 — every required field matched."""
        gate = F.lit(True)
        for f in self.required:
            gate = gate & cols[f].isNotNull()
        return gate

    def entity_id(self, cols: dict[str, Column]) -> Column:
        """A3 — required values joined by '__' in declaration order."""
        return F.concat_ws("__", *[cols[f] for f in self.required])

    def optional_columns(
        self, name_col: Column, path_col: Column, required_cols: dict[str, Column]
    ) -> dict[str, Column]:
        """A5/F9 — per-field match value with post-match type shaping:
        STR → matched text; PATH/LIST_PATH → the file's path;
        LIST_* wrapped later at aggregation; Template specs build the
        correlated predicate from required columns (F8)."""
        out: dict[str, Column] = {}
        for f, spec in self.optional.items():
            ftype = self.field_type(f)
            if isinstance(spec, Template):
                hit = F.regexp_like(name_col, spec.to_column(required_cols))
                matched = F.when(hit, name_col)
            else:
                alts = spec if isinstance(spec, list) else [spec]
                matched = rt.scheme_match(name_col, {f: alts})[f]
            if ftype.takes_path_value:
                out[f] = F.when(matched.isNotNull(), path_col)
            else:
                out[f] = matched
        for f, ps in self.parsers.items():
            if ps.pattern is not None:  # A10: match the file that feeds the parser
                hit = rt.scheme_match(name_col, {f: (ps.pattern, 0)})[f]
                out[f + "__src"] = F.when(hit.isNotNull(), path_col)
        return out
