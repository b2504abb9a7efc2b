"""Score-based index plan selection.

Recursive max-score search over the IR, the same algorithm as the
reference's ScoreBasedIndexPlanOptimizer.recApply
(rules/ScoreBasedIndexPlanOptimizer.scala:31-81): at every node, the best
of (a) some rule applied to the subtree rooted here, (b) the node with
each child subtree optimized independently.  Rule scores are designed so
covering rewrites always beat data skipping, and join rewrites beat
single-side filters.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from hyperspace_spark.planner import ir
from hyperspace_spark.planner.rules import Applied, RuleContext


@dataclass
class Optimized:
    node: ir.Node
    score: float
    index_names: list[str] = field(default_factory=list)
    # Rule classes that produced the winning rewrites — lets the caller
    # retry planning WITHOUT a rule whose replacement declines late
    # (raises during replay), instead of discarding every rewrite.
    rule_names: list[str] = field(default_factory=list)


def optimize(node: ir.Node, rules: list, ctx: RuleContext) -> Optimized:
    # (b) children optimized independently.
    kids = ir.children(node)
    if kids:
        opt_kids = [optimize(k, rules, ctx) for k in kids]
        best = Optimized(
            ir.with_children(node, [o.node for o in opt_kids]),
            sum(o.score for o in opt_kids),
            [n for o in opt_kids for n in o.index_names],
            [n for o in opt_kids for n in o.rule_names],
        )
    else:
        best = Optimized(node, 0.0)

    # (a) rules applied to this whole subtree.
    for rule in rules:
        applied: Applied | None = rule.apply(node, ctx)
        if applied is not None and applied.score > best.score:
            best = Optimized(
                applied.node,
                applied.score,
                applied.index_names,
                [type(rule).__name__],
            )
    return best
