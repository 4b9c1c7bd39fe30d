"""Span forest — J5 hierarchical structure for the tree transformers.

Python analog of the reference's MutableSpanForest/SpanTree
(reader/.../readers/utils/SpanTree.scala:24-160): node per spanId, edge
parent_span_id → span_id, roots = spans whose parent is absent or empty.
Traces are small (≤ thousands of spans) so this is deliberate in-memory,
per-group work inside a pandas UDF — not a distributed graph.
"""

from __future__ import annotations

from haystack_traces_spark.transform.model import Span, copy_span


class SpanNode:
    __slots__ = ("span", "children")

    def __init__(self, span: Span):
        self.span = span
        self.children: list[SpanNode] = []


class Forest:
    def __init__(self, spans: list[Span]):
        self._spans = list(spans)
        self._trees: list[SpanNode] | None = None

    # -- accessors ---------------------------------------------------------
    @property
    def spans(self) -> list[Span]:
        return self._spans

    def trees(self) -> list[SpanNode]:
        if self._trees is None:
            self._rebuild()
        return self._trees

    def count_trees(self) -> int:
        return len(self.trees())

    def loopback_trees(self) -> list[SpanNode]:
        return [t for t in self.trees() if t.span["span_id"] == t.span["parent_span_id"]]

    def orphaned_trees(self) -> list[SpanNode]:
        """Trees whose root still has a (dangling) parent id (SpanTree.scala:47)."""
        return [t for t in self.trees() if t.span["parent_span_id"]]

    # -- mutation ----------------------------------------------------------
    def update_spans(self, spans: list[Span], rebuild: bool = True) -> "Forest":
        self._spans = list(spans)
        if rebuild:
            self._trees = None
        return self

    def update_tree_roots(self, fn) -> "Forest":
        """Apply fn to each tree-root span; sync the flat list (SpanTree.scala:56-72)."""
        replaced: dict[int, Span] = {}
        for t in self.trees():
            new = fn(t.span)
            if new is not t.span:
                replaced[id(t.span)] = new
                t.span = new
        if replaced:
            self._spans = [replaced.get(id(s), s) for s in self._spans]
        return self

    def add_new_root(self, root_span: Span) -> "Forest":
        """Re-parent every tree under a new root (SpanTree.scala:48-55)."""
        root = SpanNode(root_span)
        self._merge_under(root, self.trees())
        self._spans = self._spans + [root_span]
        self._trees = [root]
        return self

    def merge_trees_under(self, root: SpanNode) -> "Forest":
        others = [t for t in self.trees() if t is not root]
        self._merge_under(root, others)
        self._trees = [root]
        return self

    def _merge_under(self, root: SpanNode, trees: list[SpanNode]) -> None:
        replaced: dict[int, Span] = {}
        for t in trees:
            new = copy_span(t.span)
            new["parent_span_id"] = root.span["span_id"]
            replaced[id(t.span)] = new
            t.span = new
            root.children.append(t)
        if replaced:
            self._spans = [replaced.get(id(s), s) for s in self._spans]

    def collapse(self, condition) -> "Forest":
        """BFS collapse (SpanTree.scala:132-157): when `condition(node)` returns
        a merged span, replace the node's span, splice grandchildren up, and
        continue BFS — the merged node itself is not re-examined."""
        out: list[Span] = []
        for tree in self.trees():
            queue = [tree]
            while queue:
                node = queue.pop(0)
                merged = condition(node)
                if merged is not None:
                    node.span = merged
                    grandchildren: list[SpanNode] = []
                    for c in node.children:
                        grandchildren.extend(c.children)
                    node.children = grandchildren
                out.append(node.span)
                queue.extend(node.children)
        self._spans = out
        return self

    def _rebuild(self) -> None:
        self._trees = []
        if not self._spans:
            return
        nodes: dict[str, SpanNode] = {}
        possible_roots: dict[str, None] = {}
        for s in self._spans:
            nodes[s["span_id"]] = SpanNode(s)
            possible_roots[s["span_id"]] = None
        for s in self._spans:
            parent = nodes.get(s["parent_span_id"])
            self_node = nodes[s["span_id"]]
            if parent is not None and parent is not self_node:
                parent.children.append(self_node)
                possible_roots.pop(s["span_id"], None)
        # preserve span order for root enumeration (LinkedHashMap-ish)
        self._trees = [nodes[sid] for sid in possible_roots]
