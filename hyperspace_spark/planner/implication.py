"""Conservative predicate implication: does a query filter GUARANTEE a
partial index's build predicate, so the (smaller) index can serve the
scan?  (Extension beyond the reference — Hyperspace indexes are always
whole-table; this is the classic PostgreSQL `CREATE INDEX ... WHERE`
check, `predtest.c`-style, restricted to the conjunct shapes our Expr
IR models exactly.)

Soundness contract: ``implies(q, p) == True`` only when every row
satisfying q also satisfies p.  Anything not provably implied returns
False — the planner then skips the partial index, never wrong results.

Also carries the Expr <-> JSON codec the partial-index entry uses to
persist its predicate (metadata/entry.py stores plain JSON only).
"""

from __future__ import annotations

from hyperspace_spark.planner.expr import (
    Attr,
    BoolOp,
    Cmp,
    Expr,
    InExpr,
    Lit,
    NotExpr,
    NullTest,
    TrueLit,
    Unknown,
    split_conjuncts,
    split_disjuncts,
)


# ---------------------------------------------------------------------------
# Expr <-> JSON (persisted on the index entry as `filterPredicateExpr`)
# ---------------------------------------------------------------------------
def expr_to_json(e: Expr) -> dict:
    if isinstance(e, Attr):
        return {"t": "attr", "sql": e.sql, "name": e.name, "dtype": e.dtype, "cast_to": e.cast_to}
    if isinstance(e, Lit):
        return {"t": "lit", "sql": e.sql, "dtype": e.dtype, "is_null": e.is_null}
    if isinstance(e, Cmp):
        return {
            "t": "cmp",
            "sql": e.sql,
            "op": e.op,
            "left": expr_to_json(e.left),
            "right": expr_to_json(e.right),
        }
    if isinstance(e, InExpr):
        return {
            "t": "in",
            "sql": e.sql,
            "child": expr_to_json(e.child),
            "values": [expr_to_json(v) for v in e.values],
        }
    if isinstance(e, NullTest):
        return {"t": "null", "sql": e.sql, "child": expr_to_json(e.child), "is_null": e.is_null}
    if isinstance(e, BoolOp):
        return {"t": "bool", "sql": e.sql, "op": e.op, "children": [expr_to_json(c) for c in e.children]}
    if isinstance(e, NotExpr):
        return {"t": "not", "sql": e.sql, "child": expr_to_json(e.child)}
    if isinstance(e, TrueLit):
        return {"t": "true", "sql": e.sql}
    # Unknown and anything else: keep the SQL (exact-match implication
    # still works), references are not needed for implication.
    return {"t": "unknown", "sql": e.sql}


def expr_from_json(d: dict) -> Expr:
    t = d["t"]
    if t == "attr":
        return Attr(sql=d["sql"], references=frozenset([d["name"]]), name=d["name"], dtype=d.get("dtype", ""), cast_to=d.get("cast_to", ""))
    if t == "lit":
        return Lit(sql=d["sql"], dtype=d.get("dtype", ""), is_null=d.get("is_null", False))
    if t == "cmp":
        left, right = expr_from_json(d["left"]), expr_from_json(d["right"])
        return Cmp(sql=d["sql"], references=left.references | right.references, op=d["op"], left=left, right=right)
    if t == "in":
        child = expr_from_json(d["child"])
        vals = tuple(expr_from_json(v) for v in d["values"])
        return InExpr(sql=d["sql"], references=child.references, child=child, values=vals)
    if t == "null":
        child = expr_from_json(d["child"])
        return NullTest(sql=d["sql"], references=child.references, child=child, is_null=d.get("is_null", True))
    if t == "bool":
        kids = tuple(expr_from_json(c) for c in d["children"])
        refs = frozenset().union(*[k.references for k in kids]) if kids else frozenset()
        return BoolOp(sql=d["sql"], references=refs, op=d["op"], children=kids)
    if t == "not":
        child = expr_from_json(d["child"])
        return NotExpr(sql=d["sql"], references=child.references, child=child)
    if t == "true":
        return TrueLit(sql=d["sql"])
    return Unknown(sql=d["sql"])


# ---------------------------------------------------------------------------
# NOT normalization (r11)
# ---------------------------------------------------------------------------
_NEG_OP = {"<": ">=", "<=": ">", ">": "<=", ">=": "<"}


def push_not(e: Expr) -> Expr:
    """TRUE-satisfaction-preserving Not elimination, sound under SQL's
    three-valued logic: a WHERE predicate keeps a row iff it evaluates
    to TRUE, and each rewrite below preserves exactly the TRUE set.

    - NOT(NOT e)      == e          (TRUE iff e TRUE)
    - NOT(a AND b)    == NOT a OR NOT b   (De Morgan holds in 3VL)
    - NOT(a OR b)     == NOT a AND NOT b
    - NOT(a < b)      == a >= b     (both TRUE exactly when both sides
      are non-null and the comparison holds — null operands make both
      forms non-TRUE), and likewise for <=, >, >=
    - NOT(x IS NULL)  == x IS NOT NULL (and vice versa)

    NOT over = / <=> / IN has no single positive form (x <> 5 is a
    range PAIR plus a null guard) — those stay residual NotExpr nodes
    for the residual rules in _conjunct_implies."""
    if isinstance(e, BoolOp):
        return BoolOp(
            sql=e.sql,
            references=e.references,
            op=e.op,
            children=tuple(push_not(c) for c in e.children),
        )
    if not isinstance(e, NotExpr) or e.child is None:
        return e
    c = push_not(e.child)
    if isinstance(c, NotExpr) and c.child is not None:
        return c.child  # already pushed by the recursive call
    if isinstance(c, BoolOp) and c.op in ("and", "or"):
        kids = tuple(
            push_not(NotExpr(sql=f"(NOT {k.sql})", references=k.references, child=k))
            for k in c.children
        )
        return BoolOp(
            sql=e.sql,
            references=e.references,
            op="or" if c.op == "and" else "and",
            children=kids,
        )
    if isinstance(c, Cmp) and c.op in _NEG_OP:
        op = _NEG_OP[c.op]
        return Cmp(
            sql=f"({c.left.sql} {op} {c.right.sql})",
            references=c.references,
            op=op,
            left=c.left,
            right=c.right,
        )
    if isinstance(c, NullTest):
        return NullTest(
            sql=e.sql, references=c.references, child=c.child, is_null=not c.is_null
        )
    return NotExpr(sql=e.sql, references=e.references, child=c)


def _not_in_values(e: Expr):
    """(col, excluded_values) of a residual NOT over =/IN on a plain
    attribute — TRUE iff col is NON-NULL and not among the values.
    NOT(x <=> v) is excluded: it is also TRUE when x is null."""
    if not isinstance(e, NotExpr) or e.child is None:
        return None
    inner = e.child
    if isinstance(inner, Cmp):
        n = _norm_cmp(inner)
        if n is not None and n[1] == "=":
            return n[0], [n[2]]
        return None
    if isinstance(inner, InExpr):
        return _in_values(inner)
    return None


def _range_excludes(op_q: str, vq, v) -> bool:
    """Does `x op_q vq` (TRUE) guarantee x != v?  Exactly when v itself
    fails the comparison; incomparable literals conservatively False."""
    c = _cmp_values(v, vq)
    if c is None:
        return False
    return not {"<": c < 0, "<=": c <= 0, ">": c > 0, ">=": c >= 0}[op_q]


def _excludes_all(q: Expr, col: str, values) -> bool:
    """Does q (TRUE) guarantee col is NON-NULL and outside ``values``?"""
    qi = _in_values(q)
    if qi is not None and qi[0] == col:
        try:
            return not set(qi[1]) & set(values)
        except TypeError:
            return False
    if isinstance(q, Cmp):
        nq = _norm_cmp(q)
        if nq is not None and nq[0] == col and nq[1] in _NEG_OP:
            return all(_range_excludes(nq[1], nq[2], v) for v in values)
    nq2 = _not_in_values(q)
    if nq2 is not None and nq2[0] == col:
        try:
            return set(values).issubset(set(nq2[1]))
        except TypeError:
            return False
    return False


# ---------------------------------------------------------------------------
# implication
# ---------------------------------------------------------------------------
def implies(query: Expr, index_pred: Expr) -> bool:
    """query ⇒ index_pred, conservatively.

    Both sides are NOT-normalized first (push_not), so `x <> 5` style
    filters can ride range/null reasoning.  Every conjunct of the index
    predicate must be implied by the query.  The query side distributes
    over its own top-level OR: (q1 OR q2) ⇒ p iff q1 ⇒ p and q2 ⇒ p."""
    query = push_not(query)
    index_pred = push_not(index_pred)
    branches = split_disjuncts(query)
    if len(branches) > 1:
        return all(implies(b, index_pred) for b in branches)
    q_conj = split_conjuncts(query)
    for p in split_conjuncts(index_pred):
        if not any(_conjunct_implies(qc, p) for qc in q_conj):
            return False
    return True


def _attr_of(e: Expr):
    return e if isinstance(e, Attr) and not e.cast_to else None


def _norm_cmp(e: Cmp):
    """(attr, op, python_literal) with the attribute on the LEFT, or None."""
    from hyperspace_spark.indexes.sketches import _lit_python

    flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "<=>": "<=>"}
    if _attr_of(e.left) is not None and isinstance(e.right, Lit) and not e.right.is_null:
        a, op, lit = e.left, e.op, e.right
    elif _attr_of(e.right) is not None and isinstance(e.left, Lit) and not e.left.is_null:
        a, op, lit = e.right, flip[e.op], e.left
    else:
        return None
    try:
        v = _lit_python(lit)
    except Exception:
        return None
    if v is None:
        return None
    return a.name, op, v


def _cmp_values(v1, v2) -> int | None:
    """-1/0/1 when v1 and v2 are comparable same-kind values, else None."""
    num = (int, float)
    if isinstance(v1, bool) or isinstance(v2, bool):
        return None
    if isinstance(v1, num) and isinstance(v2, num):
        pass
    elif type(v1) is not type(v2):
        return None
    try:
        if v1 < v2:
            return -1
        if v1 > v2:
            return 1
        return 0
    except TypeError:
        return None


def _range_implies(op_q: str, vq, op_p: str, vp) -> bool:
    """Does `x op_q vq` imply `x op_p vp` for comparable literals?"""
    c = _cmp_values(vq, vp)
    if c is None:
        return False
    if op_q in ("=", "<=>"):
        # x = vq ⇒ x op_p vp iff vq satisfies op_p vp
        return {
            "=": c == 0,
            "<=>": c == 0,
            "<": c < 0,
            "<=": c <= 0,
            ">": c > 0,
            ">=": c >= 0,
        }[op_p]
    if op_p in ("=", "<=>"):
        return False  # a range never pins a single value
    q_upper, q_lower = op_q in ("<", "<="), op_q in (">", ">=")
    p_upper, p_lower = op_p in ("<", "<="), op_p in (">", ">=")
    if q_upper and p_upper:
        # x < vq (or <=) ⇒ x < vp (or <=): query bound must sit at/below
        if c < 0:
            return True
        return c == 0 and (op_p == "<=" or op_q == "<")
    if q_lower and p_lower:
        if c > 0:
            return True
        return c == 0 and (op_p == ">=" or op_q == ">")
    return False


def _in_values(e: Expr):
    """Python literal values of an IN/equality conjunct on a plain attr."""
    from hyperspace_spark.indexes.sketches import _lit_python

    if isinstance(e, InExpr) and _attr_of(e.child) is not None and e.values:
        try:
            vals = [_lit_python(v) for v in e.values]
        except Exception:
            return None
        if any(v is None for v in vals):
            return None
        return e.child.name, vals
    if isinstance(e, Cmp):
        n = _norm_cmp(e)
        if n is not None and n[1] in ("=", "<=>"):
            return n[0], [n[2]]
    return None


def _conjunct_implies(q: Expr, p: Expr) -> bool:
    # exact textual match always works (same Catalyst rendering)
    if q.sql == p.sql:
        return True
    # boolean decomposition (each step preserves soundness):
    # (q1 OR q2) ⇒ p  iff every branch implies p
    if isinstance(q, BoolOp) and q.op == "or":
        return all(_conjunct_implies(qi, p) for qi in split_disjuncts(q))
    # q ⇒ (p1 AND p2)  iff q implies every conjunct
    if isinstance(p, BoolOp) and p.op == "and":
        return all(_conjunct_implies(q, pi) for pi in split_conjuncts(p))
    # q ⇒ (p1 OR p2)  if q implies SOME disjunct
    if isinstance(p, BoolOp) and p.op == "or":
        return any(_conjunct_implies(q, pi) for pi in split_disjuncts(p))
    # IN/= subset: q pins x to values ⊆ p's allowed set
    qi, pi = _in_values(q), _in_values(p)
    if qi is not None and pi is not None and qi[0] == pi[0]:
        try:
            return set(qi[1]).issubset(set(pi[1]))
        except TypeError:
            return False
    # range implication on the same attribute
    if isinstance(q, Cmp) and isinstance(p, Cmp):
        nq, np_ = _norm_cmp(q), _norm_cmp(p)
        if nq is not None and np_ is not None and nq[0] == np_[0]:
            return _range_implies(nq[1], nq[2], np_[1], np_[2])
    # equality/IN implies a range bound
    if qi is not None and isinstance(p, Cmp):
        np_ = _norm_cmp(p)
        if np_ is not None and qi[0] == np_[0]:
            return all(_range_implies("=", v, np_[1], np_[2]) for v in qi[1])
    # residual NOT on the index side: q must guarantee the excluded
    # values can't occur AND the column is non-null
    npn = _not_in_values(p)
    if npn is not None:
        return _excludes_all(q, npn[0], npn[1])
    # any non-null-preserving conjunct on x implies x IS NOT NULL
    if isinstance(p, NullTest) and not p.is_null and _attr_of(p.child) is not None:
        col = p.child.name
        if isinstance(q, Cmp):
            nq = _norm_cmp(q)
            if nq is not None and nq[0] == col and nq[1] != "<=>":
                return True
        if qi is not None and qi[0] == col:
            return True
        # NOT(x = v) / NOT(x IN ...) is TRUE only on non-null x
        nqn = _not_in_values(q)
        if nqn is not None and nqn[0] == col:
            return True
        if isinstance(q, NullTest) and not q.is_null and _attr_of(q.child) is not None and q.child.name == col:
            return True
    return False
