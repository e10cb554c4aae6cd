"""Column-level lineage extraction from the analyzed logical plan.

Production pipelines need to answer "which source columns feed this
output column" — for impact analysis (which reports break if a column
changes), GDPR-style data mapping, and debugging. Spark already knows:
the analyzed plan's expression graph carries globally unique expression
ids (``exprId``) from every output attribute down to the scan
attributes. This module walks the plan's own JSON serialization
(``queryExecution().analyzed().toJSON()`` — stable public TreeNode
machinery) and resolves each output column to the set of
``(source, column)`` leaf attributes it transitively references.

Scope (documented, tested): projections, filters, equi/theta joins,
aggregates, windows, sorts, limits, explode-free expression trees —
i.e. the alias/attribute graph — and ``Union``. A union's output
reuses the FIRST child's attribute ids, so the alias graph alone only
traces branch one; ``_union_edges`` walks the analyzed JVM plan and
adds one positional edge per (union output attr -> each child's attr
at that position), so ``unionByName``-heavy shapes (the S3/S6
multi-status scans) resolve every branch's base columns.
``Intersect``/``Except`` need no such edges: their output VALUES come
only from the left child, which is exactly the id the alias graph
already follows. Generators (explode) propagate through their
generator expression like any other alias. Literals and rand()
contribute no lineage (empty set), which is itself the correct
answer.

Cost: pure driver-side metadata walk — the plan JSON is KBs; nothing
executes on the cluster.
"""

from __future__ import annotations

import json
from collections import defaultdict

from pyspark.sql import DataFrame

_ATTR = "org.apache.spark.sql.catalyst.expressions.AttributeReference"
_ALIAS = "org.apache.spark.sql.catalyst.expressions.Alias"


def _trees(value):
    """Yield expression-tree arrays found in a node field value.

    TreeNode.toJSON encodes an expression field either as ONE pre-order
    array of expression nodes, or as a list of such arrays."""
    if not isinstance(value, list) or not value:
        return
    if all(isinstance(e, dict) and "class" in e for e in value):
        yield value
    elif all(isinstance(e, list) for e in value):
        for sub in value:
            yield from _trees(sub)


def _subtree_sizes(tree):
    """Pre-order num-children walk → size of the subtree at each index."""
    sizes = [0] * len(tree)

    def walk(i):
        n = tree[i].get("num-children", 0)
        j = i + 1
        for _ in range(n):
            j = walk(j)
        sizes[i] = j - i
        return j

    i = 0
    while i < len(tree):
        i = walk(i)
    return sizes


def _collect_edges(tree, edges):
    """For every Alias in the expression tree, record
    alias exprId -> {AttributeReference exprIds inside its subtree}."""
    sizes = _subtree_sizes(tree)
    for i, node in enumerate(tree):
        if node.get("class") == _ALIAS:
            dst = node["exprId"]["id"]
            for j in range(i + 1, i + sizes[i]):
                sub = tree[j]
                if sub.get("class") == _ATTR:
                    edges[dst].add(sub["exprId"]["id"])


def _leaf_label(jleaf, idx):
    """Human identity for a leaf plan: file paths when it is a file
    relation, else the class short name + position."""
    try:
        loc = jleaf.relation().location()
        paths = loc.rootPaths()
        parts = [str(paths.apply(i)) for i in range(paths.length())]
        if parts:
            return ",".join(parts)
    except Exception:
        pass
    cls = jleaf.getClass().getSimpleName()
    return f"{cls}#{idx}"


def _union_edges(jplan, edges) -> None:
    """Add positional lineage edges for every Union node in the JVM
    plan: Union.output reuses the head child's exprIds, so for each
    output position i record output[i] -> child_k.output[i] for ALL
    children (the head edge is a harmless self-loop the resolver's
    seen-set absorbs). Driver-side metadata walk, nothing executes."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        children = node.children()
        for k in range(children.length()):
            stack.append(children.apply(k))
        if node.getClass().getSimpleName() != "Union":
            continue
        out = node.output()
        for i in range(out.length()):
            dst = out.apply(i).exprId().id()
            for k in range(children.length()):
                cout = children.apply(k).output()
                if i < cout.length():
                    src = cout.apply(i).exprId().id()
                    if src != dst:
                        edges[dst].add(src)


def column_lineage(df: DataFrame) -> dict[str, set[tuple[str, str]]]:
    """Map each output column of ``df`` to the set of ``(source,
    column)`` base-relation attributes it transitively depends on."""
    qe = df._jdf.queryExecution()
    jplan = qe.analyzed()
    nodes = json.loads(jplan.toJSON())

    # 1) alias graph + leaf attribute registry, from the JSON walk
    edges: dict[int, set[int]] = defaultdict(set)
    json_leaves = []
    for node in nodes:
        for key, value in node.items():
            if key in ("class", "num-children"):
                continue
            for tree in _trees(value):
                _collect_edges(tree, edges)
        if node.get("num-children", 0) == 0 and "output" in node:
            json_leaves.append(node)
    _union_edges(jplan, edges)

    # 2) leaf identity: JSON leaves pair positionally with the JVM
    #    plan's collectLeaves() (both are pre-order)
    jleaves = jplan.collectLeaves()
    leaf_attr: dict[int, tuple[str, str]] = {}
    for idx, node in enumerate(json_leaves):
        jleaf = jleaves.apply(idx) if idx < jleaves.length() else None
        label = _leaf_label(jleaf, idx) if jleaf is not None else f"leaf#{idx}"
        for tree in _trees(node["output"]):
            for attr in tree:
                if attr.get("class") == _ATTR:
                    leaf_attr[attr["exprId"]["id"]] = (label, attr["name"])

    # 3) resolve each root output attribute through the alias graph
    out = {}
    joutput = jplan.output()
    for i in range(joutput.length()):
        attr = joutput.apply(i)
        name, root = attr.name(), attr.exprId().id()
        seen, stack, sources = set(), [root], set()
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            if x in leaf_attr:
                sources.add(leaf_attr[x])
            else:
                stack.extend(edges.get(x, ()))
        out[name] = sources
    return out
