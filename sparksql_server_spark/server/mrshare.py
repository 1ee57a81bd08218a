"""MRShare-style multi-aggregation merge — the work-sharing rewrite the
reference designed but could not make profitable.

Reference parity: ``MRShareOptimizer``
(SRV/optimizer/optimizers/MRShareOptimizer.scala:32-150) implements the
MRShare paper's greedy job-grouping (Nykiel et al., VLDB 2010): jobs
scanning the same file are merged into ONE job whose map output carries a
per-job tag, trading a single shared scan against inflated, tagged map
output; ``MRShareCM`` (costmodel/udcm/MRShareCM.scala) prices the trade
with the paper's sorting-pass formula (``computeSortingPasses``,
MRShareOptimizer.scala:44-46). The thesis measured the merged job SLOWER
than the caching rewrite on Spark 1.3.1 (report.pdf ch.5 Table 5.1) and
the strategy was dropped from the shipped pipeline — rounds 1-3 of this
build mirrored that as a documented drop (SURVEY.md §2 B8).

This module re-expresses the idea where modern Spark makes it a genuine
win. N single-table ``GROUP BY`` aggregation queries over the same
relation become ONE Catalyst plan:

- **identical grouping signature** (same table, same GROUP BY exprs;
  predicates and aggregates free to differ): merged plan = one scan +
  one partial/final hash aggregate. Per-query predicates fold into
  ``CASE WHEN (p) THEN expr END`` inside each aggregate, and a hidden
  ``count(CASE WHEN (p) THEN 1 END)`` presence counter restores exact
  per-query group membership at demux. Strictly less CLUSTER work than
  N scans + N shuffles (map output is NOT inflated — the regime where
  MRShare's GAIN is unconditionally positive); the per-batch fixed cost
  (blocking materialize + demux round-trips) is priced by the
  scheduler's byte-floor admission (BatchExecutor.mrshare_min_bytes —
  measured: merging tiny parquet scans LOST ~2x), not here.
- **differing signatures**: merged via ``GROUP BY GROUPING SETS``.
  Spark's Expand replicates every input row once per distinct grouping
  set BEFORE the shuffle — the exact map-output inflation MRShareCM
  prices. The cost model here is a hard bound: merge at most
  ``max_grouping_sets`` distinct sets (scan saving of N-1 jobs must
  amortize an Expand factor ≤ that bound; at 100 TB the scan is the
  dominant term for wide tables, so a small constant bound is the safe
  default). Demux filters on the deterministic ``grouping_id()`` of
  each query's set (bit k, MSB-first over the GROUP BY list, = 1 when
  expr k is aggregated away — verified empirically in
  tests/test_mrshare.py).

Parsing is deliberately conservative (prototype-parity with the
reference, which only ever merged WordCount-shaped jobs): the canonical
``SELECT keys+aggs FROM one_table [WHERE p] GROUP BY keys`` shape is
merged; anything else — joins, HAVING, ORDER BY, subqueries, window
functions, expressions we cannot alias stably — is DECLINED and runs
unchanged on the normal path. A declined merge costs nothing.

100 TB notes: the merged plan's aggregate is still partial+final
(map-side combine), the scan is read ONCE instead of N times (the whole
point at 100 TB), and the demux queries run against the persisted
merged aggregate — a relation the size of the result set, not the
input. The merged relation is unpersisted when the batch completes
(scheduler.py), so it cannot leak into the CacheManager's budget.
"""

from __future__ import annotations

import re
import uuid
from dataclasses import dataclass, field
from typing import Any, Optional

from sparksql_server_spark.server.model import QueryJob

AGG_FUNCS = ("sum", "count", "min", "max", "avg")

# statements containing these at top level are not mergeable shapes
_REJECT_TOP = (
    "having",
    "order",
    "limit",
    "join",
    "union",
    "intersect",
    "except",
    "over",
    "qualify",
    "distribute",
    "cluster",
    "sort",
    "window",
    "lateral",
    "pivot",
    "unpivot",
)

_SIMPLE_IDENT = re.compile(r"^[A-Za-z_]\w*$")


def _scan(sql: str) -> tuple[list[int], list[bool]]:
    """Per-character (paren depth, inside-string) for top-level parsing.

    Quote toggling handles doubled-quote escapes naturally ('it''s'
    closes and reopens — every quoted char still flags as in-string).
    Backslash inside a single/double-quoted literal is a C-style escape
    (Spark's default lexer, ``escapedStringLiterals=false``): ``'don\\'t'``
    stays one literal, so clause keywords after it slice correctly
    (ADVICE r4 medium — without this the in-string state flipped and
    WHERE/GROUP BY decomposition could mis-locate). Backticks take no
    backslash escapes, matching Spark.
    """
    depth: list[int] = [0] * len(sql)
    instr: list[bool] = [False] * len(sql)
    d = 0
    q: Optional[str] = None
    esc = False
    for i, c in enumerate(sql):
        if q is not None:
            instr[i] = True
            if esc:
                esc = False
            elif q in "'\"" and c == "\\":
                esc = True
            elif c == q:
                q = None
            continue
        if c in "'\"`":
            q = c
            instr[i] = True
            continue
        if c == "(":
            d += 1
            depth[i] = d  # '(' itself counts as inside
            continue
        if c == ")":
            depth[i] = d
            d -= 1
            continue
        depth[i] = d
    return depth, instr


def _canon(expr: str) -> str:
    """Comparison key for expression equality: case-folded OUTSIDE
    string literals (lowercasing inside quotes would wrongly equate
    ``= 'A'`` with ``= 'a'``), whitespace dropped except where it
    separates two word tokens (``substr(x, 1,2)`` ≡ ``SUBSTR(x,1, 2)``
    but ``a AND b`` keeps its separating spaces)."""
    _, instr = _scan(expr)
    folded = "".join(c if instr[i] else c.lower() for i, c in enumerate(expr))
    collapsed = re.sub(r"\s+", " ", folded).strip()
    out: list[str] = []
    for i, c in enumerate(collapsed):
        if c == " ":
            prev = out[-1] if out else ""
            nxt = collapsed[i + 1] if i + 1 < len(collapsed) else ""
            if not (re.match(r"\w", prev) and re.match(r"\w", nxt)):
                continue  # space not separating two word tokens — drop
        out.append(c)
    return "".join(out)


def _split_top(text: str, sep: str = ",") -> list[str]:
    depth, instr = _scan(text)
    parts: list[str] = []
    start = 0
    for i, c in enumerate(text):
        if c == sep and depth[i] == 0 and not instr[i]:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


def _find_top(sql: str, word: str, depth: list[int], instr: list[bool]):
    """First top-level, outside-string, whole-word match of ``word``."""
    for m in re.finditer(rf"\b{word}\b", sql, re.I):
        i = m.start()
        if not instr[i] and depth[i] == 0:
            return m
    return None


@dataclass
class ParsedAgg:
    """One mergeable aggregation query, decomposed."""

    table: str  # lowercased simple identifier
    where: Optional[str]  # raw predicate text (no trailing keywords)
    group_canon: tuple[str, ...]  # sorted canonical GROUP BY exprs
    group_raw: dict[str, str]  # canonical -> raw text (for SQL emission)
    # select items in original order:
    #   ("key", canon_expr, out_alias)
    #   ("agg", raw_expr, calls, out_alias) — calls = aggregate calls
    #   embedded in raw_expr: [(start, end, func, inner|None(star),
    #   is_distinct), ...]; the expression may wrap them in arbitrary
    #   scalar computation (CAST(sum(x) AS ...), sum(a)/sum(b), the
    #   TPC-H q1 shape)
    items: list[tuple] = field(default_factory=list)

    @property
    def signature(self) -> tuple[str, tuple[str, ...]]:
        return (self.table, self.group_canon)

    @property
    def n_distinct_aggs(self) -> int:
        return sum(
            1
            for it in self.items
            if it[0] == "agg"
            for call in it[2]
            if call[4]
        )


def _agg_calls(expr: str) -> Optional[list[tuple]]:
    """All aggregate calls inside a select expression, left to right:
    [(start, end_exclusive, func_lower, inner|None for ``*``,
    is_distinct), ...]. None = the expression is not mergeable (no
    calls, nested aggregates, subquery, or unbalanced parens)."""
    depth, instr = _scan(expr)
    calls: list[tuple] = []
    last_end = 0
    for m in re.finditer(rf"\b({'|'.join(AGG_FUNCS)})\s*\(", expr, re.I):
        i = m.start()
        if instr[i]:
            continue
        if i < last_end:
            return None  # aggregate nested inside another aggregate
        open_i = m.end() - 1
        d = 0
        j = open_i
        while j < len(expr):
            c = expr[j]
            if not instr[j]:
                if c == "(":
                    d += 1
                elif c == ")":
                    d -= 1
                    if d == 0:
                        break
            j += 1
        if j >= len(expr):
            return None  # unbalanced
        inner = expr[open_i + 1 : j].strip()
        func = m.group(1).lower()
        is_distinct = False
        m_di = re.match(r"distinct\b", inner, re.I)
        if m_di:
            is_distinct = True
            inner = inner[m_di.end() :].strip()
        if inner == "*":
            if func != "count" or is_distinct:
                return None
            inner_val: Optional[str] = None
        else:
            if not inner or re.search(r"\bselect\b", inner, re.I):
                return None
            if re.search(rf"\b({'|'.join(AGG_FUNCS)})\s*\(", inner, re.I):
                return None  # nested aggregate
            inner_val = inner
        calls.append((i, j + 1, func, inner_val, is_distinct))
        last_end = j + 1
    if not calls:
        return None
    return calls


def parse_agg_query(sql: str) -> Optional[ParsedAgg]:
    """Decompose a canonical single-table GROUP BY aggregation, or None.

    Declines (returns None) on anything outside the shape — the caller
    runs the query unchanged. Every decline is safe; a false ACCEPT is
    not, so each rule here errs conservative.
    """
    s = sql.strip().rstrip(";").strip()
    low = s.lower()
    if not low.startswith("select"):
        return None
    depth, instr = _scan(s)
    for word in _REJECT_TOP:
        if _find_top(s, word, depth, instr):
            return None
    # SELECT DISTINCT at top level (DISTINCT inside agg parens is fine)
    m_d = re.match(r"select\s+distinct\b", low)
    if m_d:
        return None
    m_from = _find_top(s, "from", depth, instr)
    if m_from is None:
        return None
    m_group = _find_top(s, "group", depth, instr)
    if m_group is not None and not re.match(r"group\s+by\b", low[m_group.start():]):
        return None
    m_where = _find_top(s, "where", depth, instr)

    select_list = s[len("select"): m_from.start()]
    table_end = (
        m_where.start()
        if m_where
        else (m_group.start() if m_group else len(s))
    )
    table = s[m_from.end(): table_end].strip()
    if not _SIMPLE_IDENT.match(table):
        return None
    where = None
    if m_where:
        where_end = m_group.start() if m_group else len(s)
        where = s[m_where.end(): where_end].strip()
        if not where or re.search(r"\bselect\b", where, re.I):
            return None  # subquery in predicate — decline
    group_raw: dict[str, str] = {}
    if m_group is not None:
        group_text = re.sub(r"^group\s+by\s*", "", s[m_group.start():], flags=re.I)
        if re.match(r"(all|grouping|rollup|cube)\b", group_text.strip(), re.I):
            return None
        group_raw_list = _split_top(group_text)
        if not group_raw_list:
            return None
        for g in group_raw_list:
            if re.fullmatch(r"\d+", g):  # ordinal GROUP BY — decline
                return None
            group_raw.setdefault(_canon(g), g)
    # no GROUP BY = global aggregation (GROUP BY ()): group_canon is
    # the empty tuple; the query must then be pure aggregates (checked
    # below — any non-agg item fails the key/agg classification)
    group_canon = tuple(sorted(group_raw))

    parsed = ParsedAgg(
        table=table.lower(), where=where, group_canon=group_canon, group_raw=group_raw
    )
    for item in _split_top(select_list):
        idepth, iinstr = _scan(item)
        alias = None
        m_as = None
        for m in re.finditer(r"\s+as\s+([A-Za-z_]\w*)\s*$", item, re.I):
            if not iinstr[m.start()] and idepth[m.start()] == 0:
                m_as = m
        if m_as:
            alias = m_as.group(1)
            expr = item[: m_as.start()].strip()
        else:
            expr = item.strip()
        c = _canon(expr)
        if c in group_raw:
            if alias is None:
                if not _SIMPLE_IDENT.match(expr):
                    return None  # unaliased computed key — no stable name
                alias = expr
            parsed.items.append(("key", c, alias))
            continue
        calls = _agg_calls(expr)
        if calls is None or alias is None:
            return None  # non-agg non-key item, or agg without AS alias
        parsed.items.append(("agg", expr, calls, alias))
    if not any(it[0] == "agg" for it in parsed.items):
        return None  # plain GROUP BY projection — nothing to share
    return parsed


# ---------------------------------------------------------------------------


@dataclass
class MergePlan:
    """One merged job standing in for N member jobs."""

    jobs: list[QueryJob]
    merged_sql: str
    demux_sql: dict[int, str]  # job_id -> rewritten SQL over the view
    view: str
    session: Any = None  # the member jobs' shared session (None = root)
    grouping_sets: int = 1  # distinct sets merged (1 = no Expand)
    df: Any = None  # persisted merged DataFrame, set at materialize time


def _agg_expr(func: str, inner: Optional[str], distinct: bool, pred: Optional[str]) -> str:
    d = "DISTINCT " if distinct else ""
    if pred is None:
        return f"{func}({d}{'*' if inner is None else inner})"
    body = "1" if inner is None else inner  # count(*) -> count(CASE..1..)
    return f"{func}({d}CASE WHEN ({pred}) THEN ({body}) END)"


def _rewrite_item(raw_expr: str, calls: list[tuple], pred: Optional[str]) -> str:
    """The select expression with every embedded aggregate call
    replaced by its predicate-folded form; surrounding scalar
    computation (CAST, arithmetic, round, …) is preserved verbatim —
    it evaluates post-aggregation exactly as in the original query."""
    out: list[str] = []
    last = 0
    for start, end, func, inner, distinct in calls:
        out.append(raw_expr[last:start])
        out.append(_agg_expr(func, inner, distinct, pred))
        last = end
    out.append(raw_expr[last:])
    return "".join(out)


def _build_merge(
    members: list[tuple[QueryJob, ParsedAgg]], *, grouping_sets: bool
) -> MergePlan:
    """Emit merged SQL + per-job demux SQL for one merge group.

    ``members`` all share a table (and, when not ``grouping_sets``, a
    grouping signature).
    """
    table = members[0][1].table
    raw_of: dict[str, str] = {}
    for _, p in members:
        for c, r in p.group_raw.items():
            raw_of.setdefault(c, r)
    # Spark derives the grouping-expression order (= grouping_id() bit
    # order, MSB first) from FIRST APPEARANCE across the grouping sets
    # as written. Emit sets in sorted order, each set's exprs in its own
    # (sorted-canonical) tuple order, and derive ``ordered`` from that
    # exact emission so the python-side gid matches Spark's
    # (empirically pinned in tests/test_mrshare.py).
    sets_list: list[tuple[str, ...]] = sorted({p.group_canon for _, p in members})
    ordered: list[str] = []
    for s in sets_list:
        for c in s:
            if c not in ordered:
                ordered.append(c)
    g_alias = {c: f"__g{k}" for k, c in enumerate(ordered)}

    sel: list[str] = [f"{raw_of[c]} AS {g_alias[c]}" for c in ordered]
    preds = [p.where for _, p in members]
    merged_where = ""
    if all(pr is not None for pr in preds):
        merged_where = " WHERE " + " OR ".join(f"({pr})" for pr in preds)

    demux: dict[int, str] = {}
    n = len(ordered)
    for i, (job, p) in enumerate(members):
        conds: list[str] = []
        if grouping_sets:
            gid = sum(
                1 << (n - 1 - k)
                for k, c in enumerate(ordered)
                if c not in p.group_canon
            )
            conds.append(f"__gid = {gid}")
        # presence counter: a grouped query's result contains a group
        # only if >=1 row matched its predicate. A GLOBAL aggregate
        # (empty signature) always returns exactly one row — count=0 /
        # NULL aggregates, never a missing row — so it must NOT be
        # presence-filtered.
        if p.where is not None and p.group_canon:
            sel.append(f"count(CASE WHEN ({p.where}) THEN 1 END) AS __m{i}_has")
            conds.append(f"__m{i}_has > 0")
        out_items: list[str] = []
        for j, it in enumerate(p.items):
            if it[0] == "key":
                out_items.append(f"{g_alias[it[1]]} AS {it[2]}")
            else:
                _, raw_expr, calls, alias = it
                sel.append(f"{_rewrite_item(raw_expr, calls, p.where)} AS __m{i}_{j}")
                out_items.append(f"__m{i}_{j} AS {alias}")
        view = "__MRSHARE_VIEW__"  # patched below once the name is known
        where = (" WHERE " + " AND ".join(conds)) if conds else ""
        demux[job.job_id] = f"SELECT {', '.join(out_items)} FROM {view}{where}"

    if grouping_sets:
        sel.insert(len(ordered), "grouping_id() AS __gid")
        sets_sql = ", ".join(
            "(" + ", ".join(raw_of[c] for c in s) + ")" for s in sets_list
        )
        group_clause = f"GROUP BY GROUPING SETS ({sets_sql})"
        n_sets = len(sets_list)
    else:
        # empty ordered = merged GLOBAL aggregation: no GROUP BY at all
        group_clause = (
            "GROUP BY " + ", ".join(raw_of[c] for c in ordered) if ordered else ""
        )
        n_sets = 1

    view = f"mrshare_{uuid.uuid4().hex[:10]}"
    merged_sql = (
        f"SELECT {', '.join(sel)} FROM {table}{merged_where} {group_clause}"
    )
    demux = {jid: q.replace("__MRSHARE_VIEW__", view) for jid, q in demux.items()}
    return MergePlan(
        jobs=[j for j, _ in members],
        merged_sql=merged_sql,
        demux_sql=demux,
        view=view,
        session=members[0][0].session,
        grouping_sets=n_sets,
    )


def plan_merges(
    jobs: list[QueryJob],
    *,
    max_grouping_sets: int = 4,
    max_distinct_aggs: int = 2,
) -> list[MergePlan]:
    """Group a batch's mergeable jobs into MergePlans.

    Regime 1: same (table, session, grouping signature), ≥2 jobs —
    always merged. Regime 2: leftover single-signature jobs on the same
    (table, session) merge via GROUPING SETS when 2 ≤ distinct sets ≤
    ``max_grouping_sets`` (the Expand-inflation bound standing in for
    MRShareCM's GAIN). ``max_distinct_aggs`` bounds DISTINCT aggregates
    per merged plan — each multi-distinct adds its own Expand in Spark.
    """
    parsed: dict[int, ParsedAgg] = {}
    by_sig: dict[tuple, list[tuple[QueryJob, ParsedAgg]]] = {}
    for job in jobs:
        p = parse_agg_query(job.sql)
        if p is None:
            continue
        parsed[job.job_id] = p
        by_sig.setdefault((id(job.session), p.signature), []).append((job, p))

    plans: list[MergePlan] = []
    leftovers: dict[tuple, list[tuple[QueryJob, ParsedAgg]]] = {}
    for (sess_key, sig), members in sorted(
        by_sig.items(), key=lambda kv: kv[1][0][0].job_id
    ):
        if len(members) >= 2:
            if sum(p.n_distinct_aggs for _, p in members) > max_distinct_aggs:
                continue  # multi-distinct Expand blowup — run unmerged
            plans.append(_build_merge(members, grouping_sets=False))
        else:
            leftovers.setdefault((sess_key, sig[0]), []).extend(members)

    for (sess_key, _table), members in sorted(
        leftovers.items(), key=lambda kv: kv[1][0][0].job_id
    ):
        # GLOBAL aggregates (empty signature) never join a GROUPING
        # SETS merge: grouping-sets aggregation over EMPTY merged input
        # (all-predicate batch where nothing matches, or empty table)
        # yields zero groups, but a true global aggregate must return
        # exactly one row (count=0/NULLs) — ADVICE r4 medium. Regime 1
        # merges of >=2 global aggregates keep plain no-GROUP-BY SQL,
        # which preserves the mandatory row; global singletons here run
        # unmerged.
        members = [(j, p) for j, p in members if p.group_canon]
        sets = {p.group_canon for _, p in members}
        if len(members) < 2 or not (2 <= len(sets) <= max_grouping_sets):
            continue
        if sum(p.n_distinct_aggs for _, p in members) > max_distinct_aggs:
            continue
        plans.append(_build_merge(members, grouping_sets=True))
    return plans
