"""Translator — the reference's ``<regex>~<format>`` extract-and-format DSL.

Semantics per client/datalake/translator.py:24-99: an expression is a regex
with named groups, ``~``, and a format template referencing those groups,
e.g. ``.*job-(?P<job_id>[0-9]+)\\.log$~job{job_id}``.  Applied to a file path
it yields a slug (used to derive where/what/work_id at push time).

Engine mapping: numbered-group cases compile to pure Column expressions
(``regexp_extract`` + ``format_string`` — JVM-side, codegen'd); the general
named-group form rewrites named groups to numbered ones so it stays on the
fast path and needs no Python UDF.
"""

from __future__ import annotations

import re
import string

from pyspark.sql import Column
from pyspark.sql import functions as F


class TranslatorError(ValueError):
    pass


class Translator:
    """Parse a ``<regex>~<format>`` expression once; apply to paths."""

    def __init__(self, expression: str) -> None:
        if "~" not in expression:
            raise TranslatorError(f"missing '~' in translation {expression!r}")
        pattern, self.template = expression.split("~", 1)
        try:
            self.regex = re.compile(pattern)
        except re.error as e:
            raise TranslatorError(f"bad regex in {expression!r}: {e}") from e
        # map each template field to the regex group index it references
        self._fields: list[tuple[str, str | None]] = []  # (literal, field)
        self._group_index: dict[str, int] = dict(self.regex.groupindex)
        for literal, field, spec, conv in string.Formatter().parse(self.template):
            if field is not None and field not in self._group_index:
                if field.isdigit():
                    self._group_index[field] = int(field)
                else:
                    raise TranslatorError(
                        f"format field {{{field}}} not a group of {pattern!r}"
                    )
            self._fields.append((literal, field))

    # -- driver-side (ingest path) ------------------------------------------
    def translate(self, path: str) -> str:
        m = self.regex.search(path)
        if m is None:
            raise TranslatorError(f"{self.regex.pattern!r} does not match {path!r}")
        out = []
        for literal, field in self._fields:
            out.append(literal)
            if field is not None:
                g = m.group(self._group_index[field])
                out.append("" if g is None else g)
        return "".join(out)

    # -- column expression (distributed path) -------------------------------
    @property
    def _jvm_pattern(self) -> str:
        """Java-regex form: Python's ``(?P<name>`` becomes a plain anonymous
        group (names are already resolved to indices, and named groups share
        the numbered sequence, so numbering is unchanged; Java group names
        also reject underscores, so keeping them named is not an option)."""
        return re.sub(r"\(\?P<[^>]+>", "(", self.regex.pattern)

    def column(self, col: Column | str) -> Column:
        """Pure-Column equivalent: regexp_extract per referenced group,
        concatenated with the template literals (stays in codegen).

        Unlike :meth:`translate` (which raises on non-matching input, per the
        reference CLI behavior), non-matching rows produce the template with
        empty group substitutions — Column expressions cannot raise per-row;
        filter with ``regexp_like`` first if strictness is needed."""
        c = F.col(col) if isinstance(col, str) else col
        parts: list[Column] = []
        for literal, field in self._fields:
            if literal:
                parts.append(F.lit(literal))
            if field is not None:
                parts.append(F.regexp_extract(c, self._jvm_pattern, self._group_index[field]))
        if not parts:
            return F.lit("")
        return F.concat(*parts)
