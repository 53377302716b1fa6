"""Seeded random-query grammar over the gate tables — portable ANSI SQL
that parses identically in Spark SQL and DuckDB.

Two consumers:

- ``tests/test_fuzz_differential.py`` generates 150 plans, runs both
  engines, and SHRINKS mismatches to a minimal failing spec (the
  exploratory harness);
- ``queries/fuzz_q.py`` freezes a gate-safe subset of seeds into a
  driver-verified digest query, so every correctness round re-proves
  that randomized plans — not just the hand-written surface — agree
  across engines.

Grammar: scans, equi-join chains (nation/customer/orders/lineitem/
documents; INNER / LEFT / RIGHT since r6), filter stacks (comparisons,
BETWEEN, IN lists over frozen real values, LIKE/SUBSTR, OR
combinations, correlated EXISTS / IN / NOT IN / scalar-aggregate
subqueries along the join graph — scalar since r7, MIN/MAX under
COALESCE so the empty-group NULL is pinned identically in both
engines; since r8 COUNT scalars too, COALESCE(..., 0)-canonicalized so
each engine's decorrelation answer — the classic COUNT-bug surface —
folds to the standard's 0), grouped aggregates (COUNT/SUM-int/COUNT
DISTINCT/MIN/MAX/conditional SUM, optional ROLLUP, HAVING over real
aggregates since r8 — every form NULL-or-false on an empty group, so
the r6 empty-input rollup divergence stays collapsed), window
functions with total-order NULLS FIRST tiebreaks (plus peer-inclusive
RANGE BETWEEN frames since r8 — ties need no tiebreak), LATERAL
correlated scalar-aggregate derived tables (r8.5 — always exactly one
row per outer row, so multiplicity-neutral; COALESCE-pinned NULLs),
set operations
(over join results too since r7; INSIDE derived tables since r9 — the
base scan becomes a filtered-self UNION [ALL] filtered-self aliased
back to the table name; MULTI-LEVEL nesting since r10 — (left OP mid)
OP2 right with explicit parens), uncorrelated scalar-aggregate
subqueries in WHERE and EXISTS under OR (r9 — disjunction blocks the
semi-join rewrite, exercising ExistenceJoin/mark-join decorrelation),
rank windows INSIDE derived tables (r10 — top-keep-per-partition
self-scans the outer spec aggregates/windows over), correlated scalar
subqueries in HAVING (r10 — correlation key forced into GROUP BY,
empty-group-safe forms; correlated EXISTS there since r11, a semi-join
under the Aggregate), FULL OUTER joins inside derived tables (r11 —
base-columns-only projection makes the unmatched-right rows identical
and digest-safe while every downstream clause runs over NULL keys),
explicit GROUPING SETS (r11 — rollup's guards generalized), IN over
NULL-BEARING inner lists (r11 — the three-valued-logic trap, on
purpose), LAG / NTILE windows (r11), WITH-CTEs shadowing the base
table and referenced 2-3 times (r12 — the CTE-inlining / plan-reuse
surface; setop branches and uncorrelated WHERE scalars re-read the one
named relation), aggregate FILTER clauses (r12 — the aggregate-level
twin of the conditional-SUM CASE), correlated scalar subqueries as the
ORDER BY lead (r12 — per-row evaluation inside the sort, a
decorrelation site the projection/WHERE/HAVING forms never reach),
INTERSECT ALL / EXCEPT ALL at every set-op site incl. inside derived
tables under windows (r12), top-k LATERAL joins (r13 — the lateral
derived table returns up to k ordered rows per outer row, REAL join
multiplicity, with lat_0 folded into the total-order tiebreak so
windows/LIMIT stay deterministic; the scalar-agg one-row form stays in
the grammar), DISTINCT-aggregated derived tables (r13 — the base scan
becomes a GROUP BY aggregate whose outputs alias back to the base
column names, COUNT(DISTINCT)/MIN/MAX per column, so outer windows and
aggregations compose over an aggregated input — the "windows over
DISTINCT-aggregated derived tables" planner path), correlated EXISTS
in set-op branches correlating through the NULL-PADDED side of an
outer join (r13 — the correlation key is NULL on padded rows, so each
engine's decorrelation must agree with three-valued semantics under
set-op dedup), GROUP BY ALL (r13 — both engines infer the group from
the non-aggregate select items; emitted only for plain groups, never
under ROLLUP/GROUPING SETS), nested LATERAL chains (r14 — a second
scalar-agg lateral correlating on lat_0, strictly through its WHERE:
Spark 4.1 refuses outer refs in a lateral's projection while DuckDB
answers, asymmetry #9), correlated scalars inside CASE branches in
both WHERE and the projection (r14 — decorrelation must outer-join
the scalar for every row even though only some rows take its branch),
set ops inside correlated EXISTS bodies (r14 — decorrelation pushed
into a UNION/UNION ALL/INTERSECT subtree), COUNT(DISTINCT) FILTER
(r14 — filter-then-dedup, composable with ROLLUP/GROUPING SETS), CASE /
integer-arithmetic / GREATEST-LEAST projections (r7), and
ORDER BY ... LIMIT tails with explicit direction + null ordering.
NOT in the grammar for portability: window frame GROUPS mode and
frame EXCLUDE clauses — Spark 4.1 parses neither (probed r14), so
there is no cross-engine surface to test.  Exactness discipline:
integer aggregates pinned to BIGINT; doubles appear raw, through one
exact IEEE add, or under MIN/MAX (value selection — never accumulated),
with their output aliases tracked in ``Spec.dbl_out`` so digest
consumers canonicalize them (FLOOR(x*1e6+0.5)).  ROLLUP plans carry an
identity HAVING COUNT(*) >= 1 guard — see Spec.sql() for the real
engine divergence (empty-input grouping sets) it collapses.
"""

from __future__ import annotations

import random

# table -> (unique key, int cols, varchar cols, double cols)
TABLES = {
    "nation": ("n_nationkey", ["n_nationkey", "n_regionkey"], ["n_name"], []),
    "customer": (
        "c_custkey",
        ["c_custkey", "c_nationkey"],
        ["c_name", "c_mktsegment"],
        ["c_acctbal"],
    ),
    "orders": (
        "o_orderkey",
        ["o_orderkey", "o_custkey"],
        ["o_orderstatus", "o_orderpriority"],
        ["o_totalprice"],
    ),
    "lineitem": (
        "l_orderkey",  # not unique alone; see UNIQUE_KEY
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        ["l_returnflag", "l_linestatus"],
        ["l_quantity", "l_extendedprice", "l_discount"],
    ),
    "documents": (
        "doc_id",
        ["doc_id", "n_chars"],
        ["lang", "source"],
        [],
    ),
}
# join graph: (left table, right table, ON clause)
JOINS = {
    "customer": [("nation", "c_nationkey = n_nationkey")],
    "orders": [("customer", "o_custkey = c_custkey")],
    "lineitem": [("orders", "l_orderkey = o_orderkey")],
    "nation": [],
    "documents": [],
}
# total-order tiebreaker per table (for window determinism).  NB the
# synthetic lineitem has DUPLICATE (l_orderkey, l_linenumber) pairs —
# the fuzzer found that out (r5, seeds 63/93) — but full rows are
# distinct, so its tiebreaker is the whole row.
UNIQUE_KEY = {
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "lineitem": (
        "l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        "l_shipdate"
    ),
    "documents": "doc_id",
}

# Real distinct values per varchar column, frozen from the sf0.01 gate
# tables (generator seeds must not depend on a live connection).  The
# generator only needs plausible literals — the same frozen list works
# at every SF because both engines filter the same parquet.
STR_VALUES = {
    "c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                     "MACHINERY"],
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                        "4-NOT SPECIFIED", "5-LOW"],
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
    "lang": ["de", "en", "es", "fr", "zh"],
    "source": ["src0", "src1", "src10", "src11", "src12"],
    "n_name": None,   # high-cardinality names add nothing
    "c_name": None,
}


class Spec:
    """A generated query plan: table [+ join] + preds + projection or
    aggregation [+ window / having / setop / order].  Mutable so the
    shrinker can drop clauses."""

    def __init__(self):
        self.table = "nation"
        self.join = None          # (right_table, on_sql) | None
        self.join_type = "JOIN"   # JOIN | LEFT JOIN | RIGHT JOIN
        self.join2 = None         # second hop off join's right table
        self.join2_type = "JOIN"
        self.distinct = False     # project mode: SELECT DISTINCT
        self.derived = None       # tagged derived-table form replacing
        #   the base scan, aliased back to the table name (join-free
        #   specs only so every downstream column reference resolves
        #   through the alias):
        #   ("setop", op, pred_a, pred_b) — set operation of two
        #     filtered self-scans (r9);
        #   ("win", part_col, pred, keep_n) — a PARTITION BY rank window
        #     INSIDE the derived table, keeping each partition's first
        #     keep_n rows by the total-order tiebreak (r10 — windows in
        #     derived tables feed whatever aggregation/windowing the
        #     outer spec layers on top, a planner path the top-level
        #     window site never reaches)
        #   ("fjoin", right, on, rpred) — FULL OUTER JOIN against a
        #     filtered join partner, projecting ONLY the base table's
        #     columns (r11): unmatched right rows collapse to identical
        #     all-NULL base rows, which are digest-safe by the
        #     interchangeable-identical-rows argument (the lineitem
        #     full-row tiebreak / UNION ALL precedent), and unmatched
        #     base rows exercise every downstream predicate/group/window
        #     over genuinely NULL key columns
        #   ("dagg", group_col, pred) — DISTINCT-aggregated derived
        #     table (r13): GROUP BY one varchar column, every other
        #     column re-emitted under its own name as an aggregate
        #     (MIN for the unique key — still unique per group —
        #     COUNT(DISTINCT) for ints, MIN/MAX selection for
        #     strs/dbls), so the derived relation has the base schema
        #     and the outer spec's windows/aggregations run over an
        #     aggregated input.  Join-free, non-lineitem specs (the
        #     tiebreak must be the single MIN-key column).
        self.offset = 0           # with order: LIMIT n OFFSET m
        self.dbl_out: set[str] = set()  # output aliases that are doubles
        self.preds: list[str] = []
        self.mode = "project"     # project | agg | setop
        self.cols: list[str] = []         # project/setop: "expr AS alias"
        self.group: list[str] = []        # agg mode
        self.aggs: list[str] = []         # agg mode: "expr AS alias"
        self.having: str | None = None
        self.windows: list[str] = []      # project mode: "expr AS alias"
        self.lateral: str | None = None   # project mode: correlated
        #   lateral scalar-agg subquery SQL (emits exactly one row per
        #   outer row as column lat_0 — multiplicity-neutral)
        self.lateral_multi = False        # r13: the lateral is the
        #   top-k form (up to k rows per outer row — REAL lateral-join
        #   multiplicity); _tiebreak then appends lat_0 so windows and
        #   ordered LIMITs stay deterministic (rows tying on the base
        #   key differ in lat_0, or are identical whole rows)
        self.lateral2: str | None = None  # r14: second lateral in the
        #   chain, correlating on lat_0 (strictly in its WHERE — Spark
        #   refuses projection-site outer refs, asymmetry #9).  Always
        #   the scalar-agg one-row form (column lat_1), so it is
        #   multiplicity-neutral over whatever the first lateral emits.
        self.setop: str | None = None     # setop mode: the operator
        self.preds_b: list[str] = []      # setop mode: right-side WHERE
        self.setop2: str | None = None    # r10: second-level set op —
        #   (left setop mid) setop2 right, explicit parens so precedence
        #   (INTERSECT binds tighter in both engines) never decides
        self.preds_c: list[str] = []      # setop mode: third-branch WHERE
        self.group_all = False            # agg mode (r13): emit
        #   GROUP BY ALL — both engines infer the grouping from the
        #   non-aggregate select items, which are exactly self.group
        #   (plain columns).  Plain groups only, never with
        #   ROLLUP/GROUPING SETS.
        self.rollup = False               # agg mode: GROUP BY ROLLUP
        self.gsets = None                 # agg mode (r11): explicit
        #   GROUPING SETS as a list of column-name lists (always
        #   includes the full group; may include the empty set).  Same
        #   portability guards as rollup: the identity HAVING
        #   COUNT(*) >= 1 collapses DuckDB's standard empty-input rows,
        #   the join-equality propagation trap skips the shape, and
        #   correlated HAVING never pairs with it (the Expand node under
        #   the Aggregate is the same one that breaks outer grouping-
        #   column resolution under ROLLUP — r10 asymmetry)
        self.order: tuple[str, int] | None = None  # (ORDER BY sql, LIMIT n)
        self.cte = None           # r12: WITH {table} AS (SELECT * FROM
        #   {table} WHERE pred) — the CTE SHADOWS the base table (both
        #   engines' standard scoping), so every other clause reads it;
        #   setop mode re-references it 2-3 times and project mode may
        #   add an uncorrelated scalar against it (see generate), the
        #   plan-reuse / CTE-inlining divergence surface.  Mutually
        #   exclusive with derived (both rewrite the base scan).

    def sql(self) -> str:
        # r12: the CTE replaces the base scan and is aliased BACK to the
        # table name, so setop branches and uncorrelated scalars
        # re-reference one named relation — the CTE-inlining/plan-reuse
        # divergence surface.  The CTE gets its own name (base_c): a
        # CTE named like the table it reads is a RESOLUTION DIVERGENCE
        # this grammar round found — Spark resolves the inner reference
        # to the catalog table, DuckDB raises a circular-CTE binder
        # error.
        pre = (
            f"WITH base_c AS "
            f"(SELECT * FROM {self.table} WHERE {self.cte}) "
            if self.cte else ""
        )
        frm = self.table if self.cte is None else f"base_c AS {self.table}"
        if self.derived is not None:
            if self.derived[0] == "setop":
                _tag, op, pa, pb = self.derived
                # UNION ALL can duplicate FULL rows (a row passing both
                # branches) — digest-safe: identical rows are
                # interchangeable under every window/order tiebreak, so
                # the value multiset is engine-independent (the lineitem
                # full-row argument)
                frm = (
                    f"(SELECT * FROM {self.table} WHERE {pa} {op} "
                    f"SELECT * FROM {self.table} WHERE {pb}) AS {self.table}"
                )
            elif self.derived[0] == "fjoin":
                # FULL OUTER JOIN derived table (r11): only the base
                # table's columns are projected, so unmatched right rows
                # become identical all-NULL rows (digest-safe — see the
                # __init__ note) and the right side stays filtered to
                # keep both unmatched populations non-empty
                _tag, right, on, rpred = self.derived
                cols = ", ".join(_derived_cols(self.table))
                frm = (
                    f"(SELECT {cols} FROM {self.table} FULL OUTER JOIN "
                    f"(SELECT * FROM {right} WHERE {rpred}) AS {right} "
                    f"ON {on}) AS {self.table}"
                )
            elif self.derived[0] == "dagg":
                # DISTINCT-aggregated derived table (r13): the derived
                # relation keeps the base table's schema — the unique
                # key survives as MIN (still unique: distinct groups
                # have disjoint key sets), other ints become
                # COUNT(DISTINCT), strs/dbls become MIN/MAX value
                # selection (exact, no accumulation) — so every
                # downstream clause composes unchanged over an
                # aggregated, duplicate-free input.
                _tag, gcol, pred = self.derived
                key, ints, strs, dbls = TABLES[self.table]
                projs = [gcol, f"CAST(MIN({key}) AS BIGINT) AS {key}"]
                projs += [
                    f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {c}"
                    for c in ints if c != key
                ]
                projs += [f"MIN({c}) AS {c}" for c in strs if c != gcol]
                projs += [f"MAX({c}) AS {c}" for c in dbls]
                frm = (
                    f"(SELECT {', '.join(projs)} FROM {self.table} "
                    f"WHERE {pred} GROUP BY {gcol}) AS {self.table}"
                )
            else:
                # ("win", part, pred, keep): rank window INSIDE the
                # derived table — top-keep rows per partition by the
                # total-order tiebreak (deterministic in both engines;
                # PARTITION BY keeps the plan off the global-sort
                # single-partition shape the repo's hygiene sweep bans).
                # Columns are projected EXPLICITLY: _dw must not leak
                # (SELECT * would carry it) and the projection must
                # cover every column downstream clauses may reference —
                # TABLES cols plus the full tiebreak key.
                _tag, part, pred, keep = self.derived
                cols = ", ".join(_derived_cols(self.table))
                tb = ", ".join(
                    f"{c.strip()} NULLS FIRST"
                    for c in UNIQUE_KEY[self.table].split(",")
                )
                frm = (
                    f"(SELECT {cols} FROM (SELECT {cols}, ROW_NUMBER() "
                    f"OVER (PARTITION BY {part} ORDER BY {tb}) AS _dw "
                    f"FROM {self.table} WHERE {pred}) AS _dws "
                    f"WHERE _dw <= {keep}) AS {self.table}"
                )
        if self.join is not None:
            frm += f" {self.join_type} {self.join[0]} ON {self.join[1]}"
            if self.join2 is not None:
                frm += (
                    f" {self.join2_type} {self.join2[0]} ON {self.join2[1]}"
                )
        if self.lateral is not None:
            # comma + LATERAL: a correlated scalar-aggregate derived table
            # (always exactly one row, so outer multiplicity is untouched)
            frm += f", LATERAL ({self.lateral}) AS _lt"
            if self.lateral2 is not None:
                frm += f", LATERAL ({self.lateral2}) AS _lt2"
        where = f" WHERE {' AND '.join(self.preds)}" if self.preds else ""
        if self.mode == "agg":
            sel = ", ".join(self.group + self.aggs) or "COUNT(*) AS n"
            having = self.having
            if self.group and self.rollup:
                grp = f" GROUP BY ROLLUP({', '.join(self.group)})"
                # KNOWN ENGINE DIVERGENCE (found by this fuzzer, r6):
                # grouping sets over an EMPTY input yield one grand-
                # total row in DuckDB (per the standard) but ZERO rows
                # in Spark.  COUNT(*) >= 1 is an identity on every
                # non-empty group and collapses the divergent row, so
                # rollup plans stay portable without shrinking the
                # tested surface.
                if not having:
                    having = "COUNT(*) >= 1"
            elif self.group and self.gsets:
                # r11: explicit GROUPING SETS — the generalization
                # ROLLUP/CUBE are sugar for; carries the same empty-
                # input identity guard as rollup (DuckDB emits the
                # standard's rows for every empty grouping set where
                # Spark emits none)
                sets = ", ".join(
                    "(" + ", ".join(g) + ")" for g in self.gsets
                )
                grp = f" GROUP BY GROUPING SETS ({sets})"
                if not having:
                    having = "COUNT(*) >= 1"
            elif self.group and self.group_all:
                # r13: both engines infer the group from the
                # non-aggregate select items — exactly self.group, all
                # plain columns (aggregate-bearing items are excluded
                # by both engines' ALL rules)
                grp = " GROUP BY ALL"
            elif self.group:
                grp = (
                    " GROUP BY "
                    + ", ".join(str(i + 1) for i in range(len(self.group)))
                )
            else:
                grp = ""
            hav = f" HAVING {having}" if having else ""
            return f"{pre}SELECT {sel} FROM {frm}{where}{grp}{hav}"
        sel = ", ".join(self.cols + self.windows) or "1 AS one"
        dis = "DISTINCT " if self.distinct else ""
        tail = ""
        if self.order is not None:
            tail = f" ORDER BY {self.order[0]} LIMIT {self.order[1]}"
            if self.offset:
                tail += f" OFFSET {self.offset}"
        left = f"SELECT {dis}{sel} FROM {frm}{where}{tail}"
        if self.mode == "setop" and self.setop is not None:
            where_b = (
                f" WHERE {' AND '.join(self.preds_b)}" if self.preds_b else ""
            )
            two = f"{left} {self.setop} SELECT {sel} FROM {frm}{where_b}"
            if self.setop2 is not None:
                where_c = (
                    f" WHERE {' AND '.join(self.preds_c)}"
                    if self.preds_c else ""
                )
                # explicit parens: multi-level nesting must not depend on
                # the engines' set-op precedence rules
                return (
                    f"{pre}({two}) {self.setop2} SELECT {sel} FROM "
                    f"{frm}{where_c}"
                )
            return pre + two
        return pre + left

    def out_cols(self) -> list[str]:
        """Output column names, in SELECT order."""
        if self.mode == "agg":
            exprs = (self.group + self.aggs) or ["n"]
        else:
            exprs = (self.cols + self.windows) or ["one"]

        def alias(e: str) -> str:
            up = e.upper()
            if " AS " in up:
                return e[up.rindex(" AS ") + 4:].strip()
            return e.strip()

        return [alias(e) for e in exprs]

    def clauses(self):
        """(label, dropper) pairs for the shrinker, most-droppable first."""
        out = []
        for i, p in enumerate(self.preds):
            out.append((f"pred:{p}", lambda s, i=i: s.preds.pop(i)))
        for i, p in enumerate(self.preds_b):
            out.append((f"pred_b:{p}", lambda s, i=i: s.preds_b.pop(i)))
        for i, p in enumerate(self.preds_c):
            out.append((f"pred_c:{p}", lambda s, i=i: s.preds_c.pop(i)))
        if self.setop2 is not None:
            def drop_setop2(s):
                s.setop2, s.preds_c = None, []

            out.append(("setop2", drop_setop2))
        if self.mode == "setop":
            def collapse(s):
                s.mode, s.setop, s.preds_b = "project", None, []
                s.setop2, s.preds_c = None, []

            out.append(("setop", collapse))
        if self.having:
            out.append(("having", lambda s: setattr(s, "having", None)))
        if self.rollup:
            out.append(("rollup", lambda s: setattr(s, "rollup", False)))
        if self.group_all:
            out.append(
                ("group_all", lambda s: setattr(s, "group_all", False))
            )
        if self.gsets:
            out.append(("gsets", lambda s: setattr(s, "gsets", None)))
        if self.order is not None:
            out.append(("order", lambda s: setattr(s, "order", None)))
        if self.derived is not None:
            out.append(("derived", lambda s: setattr(s, "derived", None)))
        if self.cte is not None:
            def drop_cte(s):
                # the second-reference scalar reads base_c — it must
                # leave with the CTE or the shrunk spec won't parse
                s.cte = None
                s.preds = [p for p in s.preds if "base_c" not in p]

            out.append(("cte", drop_cte))
        if self.offset:
            out.append(("offset", lambda s: setattr(s, "offset", 0)))
        if self.distinct:
            out.append(("distinct", lambda s: setattr(s, "distinct", False)))
        for i, w in enumerate(self.windows):
            out.append((f"window:{w}", lambda s, i=i: s.windows.pop(i)))
        if self.mode == "agg" and len(self.aggs) > 1:
            for i, a in enumerate(self.aggs):
                out.append((f"agg:{a}", lambda s, i=i: s.aggs.pop(i)))
        if self.mode == "agg" and len(self.group) > 1 and not self.having:
            for i, g in enumerate(self.group):
                out.append((f"group:{g}", lambda s, i=i: s.group.pop(i)))
        if self.mode == "project" and len(self.cols) > 1:
            for i, c in enumerate(self.cols):
                if c.endswith(" AS ob_0") and self.order is not None:
                    # ORDER BY references the alias — the order clause
                    # must drop first (its own dropper), else the
                    # shrunk spec won't parse; once the order is gone
                    # the column is droppable like any other
                    continue
                out.append((f"col:{c}", lambda s, i=i: s.cols.pop(i)))
        if self.lateral2 is not None:
            def drop_lateral2(s):
                s.lateral2 = None
                s.cols = [c for c in s.cols if c != "lat_1"]

            out.append(("lateral2", drop_lateral2))
        if self.lateral is not None:
            def drop_lateral(s):
                s.lateral = None
                s.lateral_multi = False
                s.cols = [c for c in s.cols if c != "lat_0"]
                # the chained lateral correlates on lat_0 — it must
                # leave with it
                s.lateral2 = None
                s.cols = [c for c in s.cols if c != "lat_1"]
                # top-k laterals fold lat_0 into the tiebreak baked
                # into window/order strings — those must leave with it
                s.windows = [w for w in s.windows if "lat_0" not in w]
                if s.order is not None and "lat_0" in s.order[0]:
                    s.order = None

            out.append(("lateral", drop_lateral))
        if self.join2 is not None:
            out.append(("join2", lambda s: setattr(s, "join2", None)))
        if self.join is not None:
            def drop_join(s):
                s.join = s.join2 = None

            out.append(("join", drop_join))
        return out

    def copy(self) -> "Spec":
        s = Spec()
        s.__dict__.update(
            {
                k: (
                    list(v) if isinstance(v, list)
                    else set(v) if isinstance(v, set)
                    else v
                )
                for k, v in self.__dict__.items()
            }
        )
        return s


def _derived_cols(table: str) -> list[str]:
    """Explicit projection for windowed derived tables: every column the
    grammar can reference downstream (TABLES metadata plus the full
    tiebreak key — lineitem's tiebreak spans columns TABLES omits)."""
    _key, ints, strs, dbls = TABLES[table]
    tb = [c.strip() for c in UNIQUE_KEY[table].split(",")]
    return list(dict.fromkeys(list(ints) + list(strs) + list(dbls) + tb))


def _tiebreak(spec) -> str:
    """Total-order sort key for window/LIMIT determinism: the base
    table's unique key plus (under a join) the right table's — an outer
    join can NULL one side's key, so each component carries an explicit
    NULLS FIRST (Spark and DuckDB disagree on the default null order)."""
    keys = [UNIQUE_KEY[spec.table]]
    if spec.join is not None:
        keys.append(UNIQUE_KEY[spec.join[0]])
        if spec.join2 is not None:
            keys.append(UNIQUE_KEY[spec.join2[0]])
    cols = [c.strip() for k in keys for c in k.split(",")]
    if spec.lateral_multi:
        # the top-k lateral duplicates outer rows (one per lateral
        # row); lat_0 completes the total order — remaining ties are
        # identical whole rows (lat_0 is always projected)
        cols.append("lat_0")
    return ", ".join(f"{c} NULLS FIRST" for c in cols)


def _cols_in_scope(spec):
    _key, ints, strs, dbls = TABLES[spec.table]
    ints, strs, dbls = list(ints), list(strs), list(dbls)
    if spec.join is not None:
        _k2, i2, s2, d2 = TABLES[spec.join[0]]
        ints, strs, dbls = ints + list(i2), strs + list(s2), dbls + list(d2)
        if spec.join2 is not None:
            _k3, i3, s3, d3 = TABLES[spec.join2[0]]
            ints = ints + [c for c in i3 if c not in ints]
            strs = strs + [c for c in s3 if c not in strs]
            dbls = dbls + [c for c in d3 if c not in dbls]
    return ints, strs, dbls


def _int_expr(rng, ints):
    c = rng.choice(ints)
    return rng.choice(
        [
            c,
            f"{c} % {rng.randint(2, 13)}",
            f"ABS({c} - {rng.randint(0, 50)})",
            f"CASE WHEN {c} % {rng.randint(3, 9)} = 0 THEN NULL ELSE {c} END",
        ]
    )


def _pred(rng, spec, str_values, allow_subquery=True):
    ints, strs, dbls = _cols_in_scope(spec)
    kind = rng.randrange(10 if allow_subquery else 6)
    if kind == 9:
        # r9: UNCORRELATED scalar-aggregate subquery in WHERE — no
        # scoping constraint, so it fires under joins too (Spark plans a
        # one-row subquery broadcast, DuckDB folds it to an expression;
        # a genuinely different planner path from the correlated forms).
        # Inner columns resolve inner-first in both engines; the gate
        # tables' column names are table-prefixed anyway.
        t2 = rng.choice(list(TABLES))
        t_ints = TABLES[t2][1]
        inner = f"{rng.choice(t_ints)} % {rng.randint(2, 7)} = 0"
        if rng.random() < 0.4:
            # COUNT always yields exactly one non-NULL row — no pin needed
            return (
                f"{rng.choice(ints)} <= (SELECT CAST(COUNT(*) AS BIGINT) "
                f"FROM {t2} WHERE {inner})"
            )
        agg = rng.choice(["MIN", "MAX"])
        return (
            f"{rng.choice(ints)} {rng.choice(['<=', '>='])} "
            f"COALESCE((SELECT {agg}({rng.choice(t_ints)}) FROM {t2} "
            f"WHERE {inner}), {rng.randint(0, 30)})"
        )
    if kind >= 6:
        # correlated EXISTS / IN / SCALAR subquery along the join edge
        # (only when the spec has no explicit join, to keep column scopes
        # unambiguous)
        if spec.join is None and JOINS[spec.table]:
            right, on = rng.choice(JOINS[spec.table])
            r_ints = TABLES[right][1]
            inner = f"{rng.choice(r_ints)} % {rng.randint(2, 7)} = 0"
            if kind == 6:
                neg = "NOT " if rng.random() < 0.4 else ""
                # r14: set ops INSIDE the correlated EXISTS body — both
                # branches correlate through the same join edge, so each
                # engine's decorrelation must push the correlation into
                # a set-op subtree (UNION dedup / UNION ALL multiset /
                # INTERSECT both-sides).  EXISTS only cares about
                # emptiness, so the op's row multiplicity is invisible —
                # what's tested is whether decorrelation of the setop
                # body agrees, not the op arithmetic (all three probed
                # portable r14).
                if rng.random() < 0.25:
                    inner2 = (
                        f"{rng.choice(r_ints)} % {rng.randint(2, 7)} = 0"
                    )
                    op = rng.choice(["UNION", "UNION ALL", "INTERSECT"])
                    return (
                        f"{neg}EXISTS (SELECT 1 FROM {right} WHERE {on} "
                        f"AND {inner} {op} SELECT 1 FROM {right} "
                        f"WHERE {on} AND {inner2})"
                    )
                ex = (
                    f"{neg}EXISTS (SELECT 1 FROM {right} "
                    f"WHERE {on} AND {inner})"
                )
                # r9: EXISTS under OR — disjunctions block the simple
                # semi/anti-join rewrite, forcing each engine's general
                # decorrelation (Spark: ExistenceJoin; DuckDB: mark join)
                if rng.random() < 0.35:
                    simple = f"{rng.choice(ints)} % {rng.randint(2, 9)} = 0"
                    return f"({ex} OR {simple})"
                return ex
            if kind == 7:
                lk, rk = [s.strip() for s in on.split("=")]
                # r11: IN over a NULL-BEARING inner list — the classic
                # three-valued-logic trap, deliberately in the grammar:
                # x IN (S ∪ {NULL}) is NULL (WHERE-filtered) when x
                # matches nothing, and x NOT IN (S ∪ {NULL}) is never
                # TRUE — both by the standard, so the engines must agree
                # row-for-row or one of them short-circuits wrongly.
                if rng.random() < 0.3:
                    neg = "NOT " if rng.random() < 0.3 else ""
                    return (
                        f"{lk} {neg}IN (SELECT CASE WHEN {rk} % "
                        f"{rng.randint(2, 5)} = 0 THEN NULL ELSE {rk} END "
                        f"FROM {right} WHERE {inner})"
                    )
                # r8: NOT IN joins the grammar.  Safe three-valued-wise:
                # rk is the right table's JOIN KEY, non-null by
                # construction in every gate table, so NOT IN never goes
                # NULL-poisoned differently across engines.
                neg = "NOT " if rng.random() < 0.3 else ""
                return f"{lk} {neg}IN (SELECT {rk} FROM {right} WHERE {inner})"
            # r7: correlated SCALAR subquery comparison.  MIN/MAX/SUM are
            # NULL on an empty correlated group in BOTH engines;
            # COALESCE pins that row to a fixed verdict so the predicate
            # never goes three-valued differently.
            # r8: COUNT joins too — the classic COUNT-bug surface (a
            # decorrelating engine may surface the empty group as NULL
            # where the standard says 0); COALESCE(..., 0) CANONICALIZES
            # both answers to 0, so the plan tests each engine's
            # decorrelation machinery while staying gateable.
            if rng.random() < 0.3:
                return (
                    f"COALESCE((SELECT CAST(COUNT(*) AS BIGINT) FROM "
                    f"{right} WHERE {on} AND {inner}), 0) "
                    f"{rng.choice(['>=', '<='])} {rng.randint(0, 4)}"
                )
            agg = rng.choice(["MIN", "MAX"])
            # r14: the correlated scalar inside a CASE branch — the
            # scalar must still evaluate via an outer join under
            # decorrelation even though only some rows take its branch
            # (an engine that gates evaluation on the WHEN predicate
            # changes nothing semantically, but its NULL/COALESCE
            # plumbing is a different path; probed portable r14)
            if rng.random() < 0.25:
                return (
                    f"(CASE WHEN {rng.choice(ints)} % "
                    f"{rng.randint(2, 5)} = 0 THEN COALESCE((SELECT "
                    f"{agg}({rng.choice(r_ints)}) FROM {right} WHERE "
                    f"{on} AND {inner}), -1) ELSE {rng.randint(0, 30)} "
                    f"END) % {rng.randint(2, 6)} "
                    f"{rng.choice(['=', '<>'])} 0"
                )
            return (
                f"{rng.choice(ints)} <= COALESCE((SELECT "
                f"{agg}({rng.choice(r_ints)}) FROM {right} WHERE {on} "
                f"AND {inner}), {rng.randint(5, 40)})"
            )
        kind = rng.randrange(6)
    if kind == 0:
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{rng.choice(ints)} {op} {rng.randint(0, 60)}"
    if kind == 1:
        c = rng.choice(ints)
        lo = rng.randint(0, 40)
        return f"{c} BETWEEN {lo} AND {lo + rng.randint(0, 30)}"
    if kind == 2 and dbls:
        op = rng.choice(["<", ">="])
        return f"{rng.choice(dbls)} {op} {round(rng.uniform(0, 5000), 2)}"
    if kind == 3:
        c = rng.choice(strs)
        vals = str_values.get(c)
        if vals:
            picks = rng.sample(vals, k=min(len(vals), rng.randint(1, 3)))
            quoted = ", ".join("'" + v.replace("'", "''") + "'" for v in picks)
            neg = "NOT " if rng.random() < 0.3 else ""
            return f"{c} {neg}IN ({quoted})"
        return f"LENGTH({c}) > {rng.randint(1, 12)}"
    if kind == 4:
        c = rng.choice(strs)
        letter = rng.choice("ABCDEFGHIJKLMNOPRS")
        return rng.choice(
            [
                f"{c} LIKE '{letter}%'",
                f"UPPER({c}) LIKE '%{letter}%'",
                f"SUBSTR({c}, 1, 1) = '{letter}'",
            ]
        )
    left = f"{rng.choice(ints)} % {rng.randint(2, 7)} = 0"
    right = f"LENGTH({rng.choice(strs)}) <= {rng.randint(4, 15)}"
    return f"({left} OR {right})"


def generate(seed: int, str_values=STR_VALUES) -> Spec:
    rng = random.Random(seed)
    spec = Spec()
    spec.table = rng.choice(list(TABLES))
    if JOINS[spec.table] and rng.random() < 0.5:
        spec.join = rng.choice(JOINS[spec.table])
        # outer joins exercise the null-producing side of the planner;
        # both engines support the same LEFT/RIGHT JOIN ... ON grammar
        spec.join_type = rng.choice(
            ["JOIN", "JOIN", "LEFT JOIN", "RIGHT JOIN"]
        )
        # second hop along the join graph (lineitem->orders->customer
        # etc.): INNER only after an outer first hop — chaining an outer
        # join's null side into another ON clause is valid SQL but adds
        # no portable coverage worth the tie-analysis burden
        if JOINS[spec.join[0]] and rng.random() < 0.4:
            spec.join2 = rng.choice(JOINS[spec.join[0]])
            spec.join2_type = (
                rng.choice(["JOIN", "JOIN", "LEFT JOIN"])
                if spec.join_type == "JOIN"
                else "JOIN"
            )
    # r9: set ops INSIDE a derived table — the base scan becomes
    # (filtered-self UNION [ALL] filtered-self) AS table; join-free specs
    # only so downstream references resolve through the alias.  UNION's
    # dedup and UNION ALL's duplicate multiplicity both feed whatever
    # aggregation/windowing the rest of the spec layers on top.
    if spec.join is None and rng.random() < 0.15:
        # r12 adds INTERSECT ALL to the derived ops: when the outer
        # spec then layers a window on top, the window runs over a
        # multiset-intersection input (the "INTERSECT ALL under
        # windows" planner path)
        spec.derived = (
            "setop",
            rng.choice(["UNION", "UNION ALL", "INTERSECT ALL"]),
            _pred(rng, spec, str_values, allow_subquery=False),
            _pred(rng, spec, str_values, allow_subquery=False),
        )
    # r10: rank window INSIDE a derived table — top-keep per partition by
    # the total-order tiebreak, so the derived relation is deterministic
    # in both engines and the outer spec's aggregation/windowing composes
    # over a window-produced input (a decorrelation/pushdown surface the
    # top-level window site never exercises)
    elif spec.join is None and rng.random() < 0.12:
        spec.derived = (
            "win",
            rng.choice(TABLES[spec.table][2]),
            _pred(rng, spec, str_values, allow_subquery=False),
            rng.randint(2, 40),
        )
    # r11: FULL OUTER JOIN inside a derived table — the one join type
    # the top-level join site skips (its null-on-EITHER-side rows break
    # the per-side tiebreak analysis there); here only base columns are
    # projected, so the all-NULL unmatched-right rows are identical and
    # digest-safe, and every downstream pred/group/window runs over
    # genuinely NULL key columns (the three-valued surface)
    elif spec.join is None and JOINS[spec.table] and rng.random() < 0.12:
        right, on = rng.choice(JOINS[spec.table])
        r_ints = TABLES[right][1]
        spec.derived = (
            "fjoin", right, on,
            f"{rng.choice(r_ints)} % {rng.randint(2, 7)} = 0",
        )
    # r13: DISTINCT-aggregated derived table — the base scan becomes a
    # GROUP BY aggregate re-emitting every column under its own name
    # (COUNT DISTINCT / MIN / MAX — see Spec.sql), so the outer spec's
    # windows and aggregations compose over an aggregated input.
    # lineitem is excluded: its tiebreak spans columns the aggregate
    # cannot keep unique.
    elif (
        spec.join is None and spec.table != "lineitem"
        and TABLES[spec.table][2] and rng.random() < 0.12
    ):
        probe = Spec()
        probe.table = spec.table
        spec.derived = (
            "dagg",
            rng.choice(TABLES[spec.table][2]),
            _pred(rng, probe, str_values, allow_subquery=False),
        )
    # r12: WITH-CTE shadowing the base table — in setop mode the one
    # named relation is referenced 2-3 times (the CTE-inlining /
    # plan-reuse surface: Spark inlines per reference, DuckDB may
    # materialize), and half the time a second reference rides an
    # uncorrelated scalar in WHERE.  Derived and CTE both rewrite the
    # base scan, so they stay mutually exclusive.
    if spec.derived is None and rng.random() < 0.15:
        # the CTE body sees ONLY the base table — a join-free probe
        # spec scopes the predicate (the outer spec may carry joins)
        probe = Spec()
        probe.table = spec.table
        spec.cte = _pred(rng, probe, str_values, allow_subquery=False)
        if rng.random() < 0.5:
            ints0 = TABLES[spec.table][1]
            spec.preds.append(
                f"{rng.choice(ints0)} * 2 <= COALESCE((SELECT "
                f"MAX({rng.choice(ints0)}) FROM base_c), 0) "
                f"+ {rng.randint(0, 60)}"
            )
    for _ in range(rng.randrange(3)):
        spec.preds.append(_pred(rng, spec, str_values))
    ints, strs, dbls = _cols_in_scope(spec)
    spec.mode = rng.choice(["project", "agg", "project", "agg", "setop"])
    if spec.mode == "setop":
        # r7: setops run over JOIN results too — both branches share the
        # identical FROM (same join chain), so the projected shape always
        # matches; only the WHERE stacks differ.  UNION ALL keeps
        # duplicate multiplicity, which the digest SUM verifies exactly.
        # r12: +ALL multiset forms (identical duplicate rows are
        # interchangeable, so multiset semantics are digest-safe)
        spec.setop = rng.choice(
            ["UNION", "UNION ALL", "EXCEPT", "INTERSECT",
             "INTERSECT ALL", "EXCEPT ALL"]
        )
        # plain columns only: both sides must project the same shape
        spec.cols = rng.sample(ints + strs, k=rng.randint(1, 3))
        for _ in range(rng.randint(1, 2)):
            spec.preds_b.append(_pred(rng, spec, str_values))
        # r13: correlated EXISTS in a set-op branch correlating through
        # the NULL-PADDED side of the outer join — the correlation key
        # is NULL on padded rows, where EXISTS is false and NOT EXISTS
        # true by three-valued semantics (NULL = k matches nothing), so
        # each engine's decorrelation must agree row-for-row under the
        # set op's dedup.  Single-hop outer joins only: the padded
        # side's own join edge supplies the correlated table (which may
        # shadow an outer FROM table — inner-first resolution, both
        # engines' standard scoping).
        if (
            spec.join is not None and spec.join_type != "JOIN"
            and spec.join2 is None and rng.random() < 0.5
        ):
            padded = (
                spec.join[0] if spec.join_type == "LEFT JOIN"
                else spec.table
            )
            if JOINS[padded]:
                right2, on2 = rng.choice(JOINS[padded])
                r2_ints = TABLES[right2][1]
                inner2 = f"{rng.choice(r2_ints)} % {rng.randint(2, 7)} = 0"
                neg = "NOT " if rng.random() < 0.5 else ""
                spec.preds_b.append(
                    f"{neg}EXISTS (SELECT 1 FROM {right2} "
                    f"WHERE {on2} AND {inner2})"
                )
        # r10: multi-level nesting — (left OP mid) OP2 right, explicit
        # parens (see Spec.sql); the third branch shares the FROM like
        # the second, only its WHERE stack differs
        if rng.random() < 0.35:
            spec.setop2 = rng.choice(
                ["UNION", "UNION ALL", "EXCEPT", "INTERSECT",
                 "INTERSECT ALL", "EXCEPT ALL"]
            )
            for _ in range(rng.randint(1, 2)):
                spec.preds_c.append(_pred(rng, spec, str_values))
        return spec
    if spec.mode == "agg":
        for g in rng.sample(strs + ints, k=rng.randint(1, 2)):
            spec.group.append(g)
        n_aggs = rng.randint(1, 3)
        for i in range(n_aggs):
            chosen = rng.choice(
                [
                    f"COUNT(*) AS agg{i}",
                    f"CAST(COUNT(DISTINCT {rng.choice(ints)}) AS BIGINT) AS agg{i}",
                    f"CAST(SUM(CAST({_int_expr(rng, ints)} AS BIGINT)) AS BIGINT) AS agg{i}",
                    f"CAST(MIN({rng.choice(ints)}) AS BIGINT) AS agg{i}",
                    f"CAST(MAX({rng.choice(ints)}) AS BIGINT) AS agg{i}",
                    f"MIN({rng.choice(strs)}) AS agg{i}",
                    f"MAX({rng.choice(dbls if dbls else ints)}) AS agg{i}",
                    f"MIN({rng.choice(dbls if dbls else ints)}) AS agg{i}",
                    f"CAST(SUM(CASE WHEN "
                    f"{_pred(rng, spec, str_values, allow_subquery=False)} "
                    f"THEN 1 ELSE 0 END) AS BIGINT) AS agg{i}",
                    # r12: aggregate FILTER clauses — the standard form
                    # of the conditional SUM above, but planned as an
                    # aggregate-level filter, not a projection CASE.
                    # COUNT FILTER is 0 on an empty filter set in both
                    # engines; SUM FILTER is NULL there (stringifies to
                    # the digest's <null> sentinel identically).
                    f"CAST(COUNT(*) FILTER (WHERE "
                    f"{_pred(rng, spec, str_values, allow_subquery=False)}"
                    f") AS BIGINT) AS agg{i}",
                    f"CAST(SUM(CAST({rng.choice(ints)} AS BIGINT)) "
                    f"FILTER (WHERE "
                    f"{_pred(rng, spec, str_values, allow_subquery=False)}"
                    f") AS BIGINT) AS agg{i}",
                    # r14: FILTER composed with DISTINCT aggregation —
                    # dedup-after-filter ordering is fixed by the
                    # standard; 0 on an empty filter set in both
                    # engines.  Free to co-occur with ROLLUP/GROUPING
                    # SETS like every agg form (probed portable r14).
                    f"CAST(COUNT(DISTINCT {rng.choice(ints)}) "
                    f"FILTER (WHERE "
                    f"{_pred(rng, spec, str_values, allow_subquery=False)}"
                    f") AS BIGINT) AS agg{i}",
                ]
            )
            # MIN/MAX over a double column is exact value SELECTION (no
            # arithmetic), but the output is double-typed: record the
            # alias so digests canonicalize it (FLOOR(x*1e6+0.5))
            head = chosen.split(" AS ")[0]
            if (
                head.startswith(("MIN(", "MAX("))
                and any(d in head for d in dbls)
            ):
                spec.dbl_out.add(f"agg{i}")
            spec.aggs.append(chosen)
        if rng.random() < 0.3:
            spec.rollup = True
        # KNOWN ENGINE DIVERGENCE (found by this fuzzer, r6 seed 375):
        # when BOTH sides of a join equality are rollup keys, DuckDB
        # propagates the equality and emits the VALUE for the rolled-up
        # column in subtotal rows where the standard (and Spark) emit
        # NULL.  Skip rollup for exactly that shape; plain GROUP BY on
        # the same columns stays in the grammar (engines agree there).
        if spec.rollup and spec.join is not None:
            ons = [spec.join[1]] + (
                [spec.join2[1]] if spec.join2 is not None else []
            )
            for on in ons:
                keys = {k.strip() for k in on.split("=")}
                if keys <= set(spec.group):
                    spec.rollup = False
        # r11: explicit GROUPING SETS — always the full group, plus a
        # prefix subset and/or the grand-total set.  Same portability
        # guards as rollup (see Spec.sql and the r6 seed-375 trap)
        if not spec.rollup and rng.random() < 0.15:
            subs = [list(spec.group)]
            if len(spec.group) > 1:
                subs.append(spec.group[:1])
            if rng.random() < 0.5:
                subs.append([])
            if len(subs) > 1:
                spec.gsets = subs
            if spec.gsets and spec.join is not None:
                ons = [spec.join[1]] + (
                    [spec.join2[1]] if spec.join2 is not None else []
                )
                for on in ons:
                    keys = {k.strip() for k in on.split("=")}
                    if keys <= set(spec.group):
                        spec.gsets = None
        # r13: GROUP BY ALL — plain groups only (under ROLLUP/GROUPING
        # SETS the clause doesn't apply).  Both engines infer the group
        # from the non-aggregate select items, which are exactly
        # spec.group; the ordinal form is the semantic identity, so any
        # digest divergence is an inference bug in one engine.
        if (
            not spec.rollup and spec.gsets is None
            and rng.random() < 0.25
        ):
            spec.group_all = True
        if rng.random() < 0.4:
            cmp_ = rng.choice([">", ">="])
            # r10: correlated scalar subquery in HAVING — the correlation
            # key must be a GROUP BY column (both engines' scoping rule),
            # so the join edge's left key is appended to the group when
            # absent.  Both forms stay NULL-or-false on an EMPTY group
            # (MIN of no rows is NULL; COUNT(*)=0 >= x+1 is false for the
            # COALESCE-pinned x >= 0), preserving the r6 empty-rollup
            # guard.  KNOWN ENGINE ASYMMETRY (found freezing this round's
            # gate, seed 251): under GROUP BY ROLLUP Spark 4.1 FAILS to
            # resolve the outer grouping-column reference inside the
            # HAVING subquery (UNRESOLVED_COLUMN — the Expand under the
            # Aggregate hides the grouping attribute) while plain GROUP
            # BY resolves in both engines; correlated HAVING therefore
            # skips rollup plans (pinned by test_fuzz_differential.py::
            # test_correlated_having_under_rollup_is_guarded).
            # group_all guard (r13): KNOWN ENGINE ASYMMETRY #8, found
            # building this round (hunt seed 12088) — DuckDB's binder
            # REFUSES a correlated grouping-column reference inside a
            # HAVING subquery under GROUP BY ALL ("Having clause cannot
            # reference column ... in correlated subquery and group by
            # all") while Spark 4.1 resolves it, and BOTH engines accept
            # the explicit-group twin — the mirror image of the r10
            # ROLLUP asymmetry (there Spark failed).  Correlated HAVING
            # therefore pairs only with the explicit ordinal GROUP BY;
            # pinned by test_fuzz_differential.py::
            # test_correlated_having_under_group_by_all_is_guarded.
            if (
                spec.join is None and JOINS[spec.table] and not spec.rollup
                and spec.gsets is None and not spec.group_all
                and rng.random() < 0.35
            ):
                # gsets guard (r11): GROUPING SETS plan through the same
                # Expand node as ROLLUP, where Spark 4.1 cannot resolve
                # outer grouping-column refs in HAVING subqueries (the
                # r10 seed-251 asymmetry) — correlated HAVING pairs with
                # plain GROUP BY only
                right, on = rng.choice(JOINS[spec.table])
                lk = on.split("=")[0].strip()
                if lk not in spec.group:
                    spec.group.append(lk)
                r_ints = TABLES[right][1]
                inner = f"{rng.choice(r_ints)} % {rng.randint(2, 7)} = 0"
                r = rng.random()
                if r < 0.34:
                    spec.having = (
                        f"MIN({rng.choice(ints)}) <= COALESCE((SELECT "
                        f"MAX({rng.choice(r_ints)}) FROM {right} WHERE "
                        f"{on} AND {inner}), {rng.randint(0, 40)})"
                    )
                elif r < 0.67:
                    spec.having = (
                        f"COUNT(*) >= COALESCE((SELECT "
                        f"MIN({rng.choice(r_ints)}) % {rng.randint(2, 5)} "
                        f"FROM {right} WHERE {on} AND {inner}), 0) + 1"
                    )
                else:
                    # r11: correlated EXISTS in HAVING — a semi-join
                    # under the Aggregate, a decorrelation site the
                    # scalar forms never reach.  The COUNT(*) >= 1
                    # conjunct keeps the NULL-or-false-on-empty-groups
                    # invariant every HAVING form carries (r6 guard).
                    neg = "NOT " if rng.random() < 0.3 else ""
                    spec.having = (
                        f"COUNT(*) >= 1 AND {neg}EXISTS (SELECT 1 FROM "
                        f"{right} WHERE {on} AND {inner})"
                    )
            else:
                # r8: HAVING over real aggregates, not just COUNT(*).
                # Every form is NULL-or-false on an EMPTY group
                # (SUM/MIN/MAX of no rows is NULL; COUNT >= k>=1 is false
                # at 0), so DuckDB's standard grand-total row over empty
                # rollup input — the r6 divergence — is filtered
                # identically whichever form fires.
                spec.having = rng.choice(
                    [
                        f"COUNT(*) {cmp_} {rng.randint(1, 5)}",
                        f"CAST(SUM(CAST({rng.choice(ints)} AS BIGINT)) "
                        f"AS BIGINT) {cmp_} {rng.randint(0, 200)}",
                        f"MIN({rng.choice(ints)}) <= {rng.randint(5, 60)}",
                        f"MAX({rng.choice(ints)}) >= {rng.randint(0, 30)}",
                        f"COUNT(DISTINCT {rng.choice(ints)}) >= "
                        f"{rng.randint(1, 4)}",
                    ]
                )
    else:
        picks = rng.sample(ints + strs + dbls, k=rng.randint(1, 3))
        for i, c in enumerate(picks):
            if c in dbls:
                # doubles project either raw or through one exact IEEE
                # add — both bit-identical across engines; record the
                # alias for digest canonicalization
                if rng.random() < 0.5:
                    spec.cols.append(c)
                    spec.dbl_out.add(c)
                else:
                    spec.cols.append(f"{c} + 1 AS p_{i}")
                    spec.dbl_out.add(f"p_{i}")
                continue
            # r7 additions: CASE / integer arithmetic / GREATEST-LEAST
            # projections (all int-typed -> portable stringify; % and *
            # agree across engines on the non-negative key domain)
            a, b = rng.choice(ints), rng.choice(ints)
            spec.cols.append(
                rng.choice(
                    [
                        c,
                        f"UPPER({c}) AS u_{i}" if c in strs else f"{c} + 1 AS p_{i}",
                        f"COALESCE(CASE WHEN LENGTH(CAST({c} AS VARCHAR(40))) > 3 "
                        f"THEN NULL ELSE CAST({c} AS VARCHAR(40)) END, 'x') AS z_{i}",
                        f"({a} * 2 - {b}) AS ar_{i}",
                        f"CASE WHEN {a} % {rng.randint(2, 7)} = 0 "
                        f"THEN {a} ELSE {b} END AS cs_{i}",
                        f"GREATEST({a}, {b}) AS gr_{i}",
                        f"LEAST({a} % {rng.randint(3, 11)}, {b}) AS ls_{i}",
                    ]
                )
            )
        # r7: correlated scalar subquery in the projection (join-free
        # specs only, same scoping rule as predicate subqueries);
        # COALESCE pins the empty-group NULL identically in both engines.
        # r9 guard (REAL ENGINE DIVERGENCE, hunt seed 3463): THIS exact
        # shape — a correlated scalar in the PROJECTION whose outer is a
        # set-op derived table — crashes Spark 4.1's decorrelation with
        # an internal planner error (NoSuchElementException: key not
        # found: n_nationkey#0) while DuckDB answers.  The same scalar in
        # WHERE, EXISTS/IN forms, LATERAL derived tables, and projection
        # scalars over UNION-dedup were each probed fine, so only this
        # site skips derived specs; pinned by test_fuzz_differential.py::
        # test_correlated_scalar_over_setop_derived_is_guarded — when a
        # Spark upgrade fixes the crash, drop the derived check.
        if (
            spec.join is None and spec.derived is None
            and JOINS[spec.table] and rng.random() < 0.25
        ):
            right, on = rng.choice(JOINS[spec.table])
            r_ints = TABLES[right][1]
            agg = rng.choice(["MIN", "MAX"])
            if rng.random() < 0.3:
                # r14: correlated scalar inside a projection CASE
                # branch — rows failing the WHEN never consume the
                # scalar, but decorrelation still outer-joins it for
                # every row (probed portable r14; same join-free +
                # derived-free guards as the bare form, r9 caution)
                spec.cols.append(
                    f"CASE WHEN {rng.choice(ints)} % "
                    f"{rng.randint(2, 5)} = 0 THEN COALESCE((SELECT "
                    f"{agg}({rng.choice(r_ints)}) FROM {right} "
                    f"WHERE {on}), -1) ELSE {rng.choice(ints)} END "
                    f"AS sc_0"
                )
            else:
                spec.cols.append(
                    f"COALESCE((SELECT {agg}({rng.choice(r_ints)}) "
                    f"FROM {right} WHERE {on}), -1) AS sc_0"
                )
        # r8.5: LATERAL correlated scalar-aggregate derived table — the
        # decorrelation path Spark and DuckDB plan very differently from
        # scalar-subquery projections, same pinned-NULL discipline
        # (COALESCE for MIN/MAX; COUNT is 0 on empty per the standard —
        # the scalar-agg lateral always emits exactly one row)
        if (
            spec.join is None and JOINS[spec.table]
            and rng.random() < 0.2
        ):
            right, on = rng.choice(JOINS[spec.table])
            r_ints = TABLES[right][1]
            inner = f"{rng.choice(r_ints)} % {rng.randint(2, 7)} = 0"
            if rng.random() < 0.4:
                # r13: top-k LATERAL — up to k ordered rows per outer
                # row, REAL lateral-join multiplicity (the scalar-agg
                # form below is multiplicity-neutral by construction).
                # Deterministic: ordered by the right table's
                # single-column unique key, and outer rows with no
                # match drop in both engines (comma join = CROSS APPLY
                # semantics).  lat_0 rides the tiebreak (_tiebreak).
                spec.lateral = (
                    f"SELECT {rng.choice(r_ints)} AS lat_0 FROM {right} "
                    f"WHERE {on} AND {inner} "
                    f"ORDER BY {UNIQUE_KEY[right]} "
                    f"{rng.choice(['ASC', 'DESC'])} "
                    f"LIMIT {rng.randint(1, 3)}"
                )
                spec.lateral_multi = True
            else:
                agg = rng.choice(["MIN", "MAX", "COUNT"])
                if agg == "COUNT":
                    expr = "CAST(COUNT(*) AS BIGINT)"
                else:
                    expr = f"COALESCE({agg}({rng.choice(r_ints)}), -1)"
                spec.lateral = (
                    f"SELECT {expr} AS lat_0 FROM {right} "
                    f"WHERE {on} AND {inner}"
                )
            spec.cols.append("lat_0")
            # r14: nested LATERAL chain — a second lateral correlating
            # on the FIRST lateral's output (and any table, reached
            # through a lat_0-modular predicate rather than a join
            # edge).  Scalar-aggregate only, so multiplicity is
            # untouched whatever the first lateral's form; correlation
            # strictly in WHERE — Spark 4.1 REFUSES outer references in
            # a lateral subquery's projection/aggregate expressions
            # (UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY.CORRELATED_
            # REFERENCE) while DuckDB answers — KNOWN ENGINE ASYMMETRY
            # #9, found building r14, pinned by
            # test_fuzz_differential.py::
            # test_lateral_projection_outer_ref_is_guarded.
            if rng.random() < 0.35:
                t2 = rng.choice(list(TABLES))
                t2_ints = TABLES[t2][1]
                agg2 = rng.choice(["MIN", "MAX", "COUNT"])
                expr2 = (
                    "CAST(COUNT(*) AS BIGINT)" if agg2 == "COUNT"
                    else f"COALESCE({agg2}({rng.choice(t2_ints)}), -1)"
                )
                spec.lateral2 = (
                    f"SELECT {expr2} AS lat_1 FROM {t2} WHERE "
                    f"{rng.choice(t2_ints)} % {rng.randint(2, 5)} = "
                    f"lat_0 % {rng.randint(2, 5)}"
                )
                spec.cols.append("lat_1")
        if rng.random() < 0.4:
            part = rng.choice(strs)
            tb = _tiebreak(spec)
            ic = rng.choice(ints)
            spec.windows.append(
                rng.choice(
                    [
                        f"ROW_NUMBER() OVER (PARTITION BY {part} "
                        f"ORDER BY {tb}) AS w0",
                        f"CAST(SUM(CAST({rng.choice(ints)} AS BIGINT)) OVER "
                        f"(PARTITION BY {part} ORDER BY {tb} ROWS BETWEEN "
                        f"UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS w0",
                        # explicit NULLS FIRST: outer joins can NULL the
                        # rank key and the engines' default null order
                        # differs
                        f"RANK() OVER (PARTITION BY {part} "
                        f"ORDER BY {rng.choice(ints)} NULLS FIRST) AS w0",
                        # r8: RANGE frames — peer-INCLUSIVE, so ties in the
                        # single numeric sort key need no tiebreak at all
                        # (every peer sees the identical frame); nulls sort
                        # first as one peer group in both engines
                        f"CAST(SUM(CAST({rng.choice(ints)} AS BIGINT)) OVER "
                        f"(PARTITION BY {part} ORDER BY {ic} NULLS FIRST "
                        f"RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                        f"AS BIGINT) AS w0",
                        f"CAST(COUNT(*) OVER (PARTITION BY {part} "
                        f"ORDER BY {ic} NULLS FIRST RANGE BETWEEN "
                        f"{rng.randint(1, 20)} PRECEDING AND CURRENT ROW) "
                        f"AS BIGINT) AS w0",
                        # r11: LAG over the total-order tiebreak — the
                        # partition-start NULL is COALESCE-pinned so the
                        # digest never stringifies an engine default;
                        # ties exist only between identical rows (the
                        # fjoin all-NULL population), where LAG reads an
                        # identical neighbor either way
                        f"CAST(COALESCE(LAG({ic}, 1) OVER (PARTITION BY "
                        f"{part} ORDER BY {tb}), -1) AS BIGINT) AS w0",
                        # r11: NTILE — bucket boundaries are a pure
                        # function of the deterministic total order; CAST
                        # unifies Spark's INT with DuckDB's BIGINT
                        f"CAST(NTILE({rng.randint(2, 5)}) OVER (PARTITION "
                        f"BY {part} ORDER BY {tb}) AS BIGINT) AS w0",
                    ]
                )
            )
        if rng.random() < 0.3 and not spec.windows:
            lead = rng.choice(ints + strs)
            # r12: correlated scalar subquery driving the ORDER BY — the
            # subquery must evaluate per row inside the sort.  KNOWN
            # ENGINE ASYMMETRY (found building this round, seed 216):
            # the scalar INLINE in ORDER BY is UNRESOLVED_COLUMN in
            # Spark 4.1 (the sort's subquery never binds the outer row)
            # while DuckDB answers — so the grammar emits the portable
            # twin: project the scalar as ob_0 and order by the alias
            # (same per-row evaluation, resolvable in both engines);
            # the inline form is pinned as a guarded divergence by
            # test_fuzz_differential.py::
            # test_correlated_scalar_in_order_by_is_guarded.  COALESCE
            # pins the empty-group NULL; the total-order tiebreak still
            # follows, so LIMIT stays deterministic.  Derived specs are
            # excluded (the r9 setop-derived decorrelation crash
            # surface — same caution as the projection site).
            if (
                spec.join is None and spec.derived is None
                and JOINS[spec.table] and rng.random() < 0.3
            ):
                right, on = rng.choice(JOINS[spec.table])
                r_ints = TABLES[right][1]
                spec.cols.append(
                    f"COALESCE((SELECT {rng.choice(['MIN', 'MAX'])}"
                    f"({rng.choice(r_ints)}) FROM {right} WHERE {on}), -1)"
                    " AS ob_0"
                )
                lead = "ob_0"
            direction = rng.choice(["ASC", "DESC"])
            nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
            spec.order = (
                f"{lead} {direction} {nulls}, {_tiebreak(spec)}",
                rng.randint(3, 40),
            )
            if rng.random() < 0.4:
                spec.offset = rng.randint(1, 15)
        elif not spec.windows and rng.random() < 0.25:
            # DISTINCT only without order/windows: the ORDER BY tiebreak
            # uses hidden columns, which SELECT DISTINCT forbids in both
            # engines
            spec.distinct = True
    return spec


def gate_safe(spec: Spec) -> bool:
    """True when the spec's digest is portable across engines.

    r6: the whole grammar is now digest-safe — window plans carry
    total-order NULLS FIRST tiebreaks (base + join-side unique keys),
    and double-typed outputs (raw columns / one exact IEEE add /
    MIN-MAX selection — never accumulation) are declared in
    ``spec.dbl_out`` so digests canonicalize them through the 'd'
    canon, FLOOR(x*1e6+0.5), instead of engine-specific double
    formatting.  Kept as a hook for future grammar growth that is not
    digest-safe."""
    return True
